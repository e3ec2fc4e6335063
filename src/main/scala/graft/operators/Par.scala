package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for compute-heavy narrow stages
  * (r17, guide §2.4/§2.5 territory: partitioning must come from the
  * session, not from the input's file count).
  *
  * The contract-scale test tables are single one-row-group parquet
  * files, so a scan — and every narrow stage chained on it: tokenize,
  * signature UDFs, variant explodes, and crucially the PROBE side of a
  * broadcast join — runs as ONE task while the rest of the box idles
  * (measured r17: q_dedup_minhash_lsh 9.7 → 1.3 s median once its
  * signature+probe stages ran at the session's width). A one-row-group
  * file is not byte-splittable (the r7 maxPartitionBytes negative), so
  * the fix is one round-robin redistribution of the decoded rows.
  *
  * Deliberately NOT applied at the table readers: a blanket floor taxes
  * every small-frame query with exchanges and 32-way task scheduling it
  * cannot amortize (measured r17: the reader-level form cost the CC
  * loop +7.5 s, the Lloyd-fit ANN family +1-2 s each, and a +0.5 s tail
  * across dozens of light queries — net +47 s on the 118-query bench).
  * Call it only where the per-row work in the following narrow stages
  * dominates one extra small exchange: the MinHash signature pass, the
  * SimHash chunk join, the deletion-variant fuzzy joins.
  *
  * Scale-adaptive by construction: the floor is
  * `sparkContext.defaultParallelism` (cores locally, executor slots on
  * a cluster) and the repartition fires only when the scan yields fewer
  * partitions — at sf10+ the inputs already split past it and the frame
  * passes through untouched. Round-robin keeps the row multiset
  * unchanged; every caller's output is partition-order-independent
  * (registry contract: total ORDER BY, decimal sums, tie-broken
  * argmins).
  */
object Par {
  def floor(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
