package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus pipelines.
  *
  * `DataFrameStatFunctions.sampleBy` filters on `rand(seed)`, whose
  * per-row values depend on the physical partition layout — a change to
  * `maxPartitionBytes`, a file split, or an upstream repartition silently
  * yields a different sample for the same seed. At 100 TB, where layout
  * is never stable across runs, that makes experiments unreproducible.
  *
  * [[stratifiedByHash]] instead keeps a row iff
  * `pmod(hash(idCol, seed), granularity) < fraction(stratum) ·
  * granularity` — membership is a pure function of the row's id, so the
  * sample is identical under any partitioning, file layout, or engine
  * version that preserves the hash. Per-stratum rates converge to the
  * target like any Bernoulli design (hash bits ≈ uniform).
  */
object Sampling {

  /** Layout-independent stratified Bernoulli sample. `fraction` is a
    * per-row sampling-rate expression in [0, 1] (typically a `when`
    * chain over the stratum column); rows whose fraction is 0 or null
    * never pass. Shuffle-free: one codegen'd filter. */
  def stratifiedByHash(df: DataFrame, fraction: Column,
                       idCol: String = "doc_id", seed: Int = 42,
                       granularity: Int = 10000): DataFrame =
    df.where(pmod(hash(col(idCol), lit(seed)), lit(granularity)) <
      coalesce(fraction, lit(0.0)) * granularity)

  /** Map-of-strata convenience overload (sampleBy's signature shape):
    * strata absent from the map sample at rate 0. */
  def stratifiedByHash(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], idCol: String,
                       seed: Int): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    stratifiedByHash(df, frac, idCol, seed)
  }
}
