package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable edit-distance similarity join — the linear-scale path for
  * fuzzy matching when BOTH sides grow with the corpus (the blocked
  * form, `q_x2_fuzzy_scoped`, is quadratic: fixed block count × both
  * sides 10× = 100× pairs; measured superlinear at sf1.0, BASELINE.md).
  *
  * Technique: symmetric-deletion signatures (the SymSpell / "k-deletion
  * neighborhood" family). If ED(a, b) ≤ k, then deleting from `a` the
  * ≤ k positions the optimal alignment substitutes-or-deletes, and from
  * `b` the ≤ k positions it substitutes-or-inserts, yields the SAME
  * string — so `a` and `b` share at least one exact member of their
  * ≤ k-deletion variant sets. Candidates therefore come from an
  * equi-join on (block, variant hash), and the exact bounded
  * `levenshtein` runs only on the survivors.
  *
  * Scale shape: variant keys are near-unique — each carries all the
  * discriminating characters of its source minus ≤ k — so per-key
  * fan-out is the true near-duplicate group size, NOT a function of
  * corpus-wide templates. This is what q-gram prefix filtering cannot
  * deliver on template corpora ("Customer#%09d"): a digit trigram
  * vocabulary SATURATES at ~10³ grams, so prefix-join key cardinality
  * stops growing with the corpus and candidates go quadratic (measured:
  * 6M → 600M candidates for 10× rows at sf10, then
  * UNABLE_TO_ACQUIRE_MEMORY). Deletion variants have no vocabulary to
  * saturate; candidate count scales with true matches.
  *
  * Cost model: each string emits Σ_{j≤k} C(len, j) variants — for the
  * name-matching envelope (len ≈ 20, k ≤ 3) that is ≤ ~1.4k rows per
  * string, shuffled once as 64-bit hashes. Emission is the price of
  * linear candidates; it grows with C(len, k), so the operator guards
  * k ≤ 3 (longer-string / larger-k similarity belongs to the q-gram
  * Jaccard path in [[Dedup]]).
  *
  * Everything is deterministic string/hash arithmetic; hash collisions
  * can only ADD candidates (the bounded levenshtein verify removes
  * them), never lose a pair, so the DuckDB oracle is plain brute force
  * — the strongest completeness check.
  */
object FuzzyPairs {

  /** One deletion level: every string obtained by deleting exactly one
    * character from any member of `vs` (itself an array of strings).
    * Guarded for empty strings (nothing to delete). */
  private def delOne(vs: Column): Column =
    array_distinct(flatten(transform(vs, s =>
      when(length(s) > lit(0),
        transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - lit(1)),
            s.substr(i + lit(1), length(s)))))
        .otherwise(array().cast("array<string>")))))

  /** All (id_a, id_b, dist) pairs within the same `blockCol` whose
    * `nameCol` values are within `maxEdits` Levenshtein edits,
    * id_a < id_b. Complete by the shared-deletion-variant theorem
    * above; false candidates (hash collisions, variant coincidences
    * beyond the edit bound) are removed by the bounded levenshtein
    * verify, which runs only on candidates. */
  def editPairs(df: DataFrame, idCol: String, nameCol: String,
                blockCol: String, maxEdits: Int): DataFrame = {
    require(maxEdits >= 0 && maxEdits <= 3,
      s"maxEdits must be in [0, 3] (variant emission is C(len, k)); got $maxEdits")
    // Par.floor: the variant explode (≤ ~1.4k rows per string) and the
    // variant join's probe side otherwise run at the input scan's
    // partition count (see Par)
    val rows = Par.floor(df)
      .select(col(idCol).as("_id"), col(nameCol).as("_name"),
        col(blockCol).as("_blk"))
      .withColumn("_len", length(col("_name")))
    // ≤ maxEdits-deletion neighborhood, deduplicated across levels
    val levels = Iterator.iterate(array(col("_name")))(delOne)
      .take(maxEdits + 1).toSeq
    val variants = array_distinct(concat(levels: _*))
    val sigs = rows
      .select(col("_id"), col("_blk"), col("_len"),
        explode(variants).as("_v"))
      .select(col("_id"), col("_blk"), col("_len"),
        xxhash64(col("_v")).as("_vh"))
    val cand = sigs.as("x").join(sigs.as("y"), Seq("_blk", "_vh"))
      .where(col("x._id") < col("y._id") &&
        abs(col("x._len") - col("y._len")) <= maxEdits)
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"))
      .distinct()
    val names = rows.select(col("_id"), col("_name"))
    cand
      .join(names.select(col("_id").as("id_a"), col("_name").as("_na")), "id_a")
      .join(names.select(col("_id").as("id_b"), col("_name").as("_nb")), "id_b")
      // bounded levenshtein (banded O(k·n), early exit; -1 above bound)
      .withColumn("dist", levenshtein(col("_na"), col("_nb"), maxEdits + 1))
      .where(col("dist") >= 0 && col("dist") <= maxEdits)
      .select("id_a", "id_b", "dist")
  }
}
