package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable edit-distance similarity join — the linear-scale path for
  * fuzzy matching when BOTH sides grow with the corpus (the sf1.0 bench
  * measured the exact blocked form, `q_x2_fuzzy_scoped`, quadratic:
  * fixed block count × both sides 10× = 100× pairs).
  *
  * Technique: prefix-filtered q-gram join (the ssjoin/ppjoin family).
  * An edit touches at most `q` character q-grams, so two strings within
  * `k` edits share all but ≤ k·q of their gram TYPES. Order the gram
  * vocabulary by ascending document frequency (rarest first, ties by
  * gram); if two strings are within k edits, their first `k·q + 1`
  * grams in that order — their PREFIXES — must intersect. Candidates
  * therefore come from an equi-join on (block, prefix gram), and the
  * exact `levenshtein` runs only on the survivors.
  *
  * Scale shape: the join key cardinality is the PREFIX-gram vocabulary
  * (grows with corpus diversity — never a fixed handful of blocks), and
  * prefix grams are by construction the RAREST grams of each string, so
  * per-key fan-out stays small even on template-shaped names whose
  * common grams ("Customer#…") are shared corpus-wide — exactly the
  * names that defeat shared-gram blocking. Everything is deterministic
  * integer/string arithmetic; the DuckDB oracle replays the pipeline
  * including the frequency-ordered prefixes bit-for-bit.
  */
object FuzzyPairs {

  /** Distinct character q-grams of `s`, padded with q−1 sentinel chars
    * (U+0001 — outside any name alphabet) on both ends: padding keeps
    * the ≤ q-grams-per-edit bound tight at the string boundaries and
    * gives strings shorter than q a gram to index under. */
  private def charGrams(s: Column, q: Int): Column = {
    val p = if (q == 1) s else
      concat(lit("\u0001" * (q - 1)), s, lit("\u0001" * (q - 1)))
    when(length(p) >= q,
      array_distinct(transform(
        sequence(lit(1), length(p) - (q - 1)),
        i => p.substr(i, lit(q)))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** All (id_a, id_b, dist) pairs within the same `blockCol` whose
    * `nameCol` values are within `maxEdits` Levenshtein edits,
    * id_a < id_b. Complete: the prefix filter is a necessary condition
    * whenever at least one side carries more than k·q distinct grams
    * (the small side's prefix is then its whole set, so mixed pairs are
    * caught); the residual SMALL×SMALL pairs — both sides ≤ k·q grams,
    * i.e. very short or ultra-repetitive strings, where the overlap
    * bound is vacuous — go through a supplemental per-block channel
    * under the |len_a − len_b| ≤ k necessary condition. That channel is
    * quadratic only in the per-block count of tiny-gram-set strings, a
    * vanishing population of real name/title corpora. */
  def editPairs(df: DataFrame, idCol: String, nameCol: String,
                blockCol: String, maxEdits: Int, q: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxEdits >= 0 && q >= 1, s"need maxEdits >= 0, q >= 1")
    val prefixLen = maxEdits * q + 1
    val rows = df.select(col(idCol).as("_id"), col(nameCol).as("_name"),
        col(blockCol).as("_blk"))
      .withColumn("_g", charGrams(col("_name"), q))
      .withColumn("_ng", size(col("_g")))
    val grams = rows.select(col("_id"), col("_blk"),
      explode(col("_g")).as("gram"))
    // canonical gram order: ascending document frequency, ties by gram
    // text — a global rank over the VOCABULARY (gram-cardinality rows,
    // not corpus-sized; the single-partition window runs on the vocab)
    val vocab = grams.groupBy("gram").agg(count(lit(1)).as("_df"))
      .withColumn("_rank", row_number().over(
        Window.orderBy(col("_df"), col("gram"))))
      .select("gram", "_rank")
    // per string: keep its prefixLen rarest grams in canonical order
    val prefix = grams.join(vocab, Seq("gram"))
      .withColumn("_pos", row_number().over(
        Window.partitionBy(col("_id")).orderBy(col("_rank"))))
      .where(col("_pos") <= prefixLen)
      .select(col("_id"), col("_blk"), col("gram"))
    val prefCand = prefix.as("x").join(prefix.as("y"), Seq("_blk", "gram"))
      .where(col("x._id") < col("y._id"))
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"))
    // small×small residual channel (overlap bound vacuous for both)
    val small = rows.where(col("_ng") <= maxEdits * q)
      .select(col("_id"), col("_blk"), length(col("_name")).as("_len"))
    val smallCand = small.as("x").join(small.as("y"), Seq("_blk"))
      .where(col("x._id") < col("y._id") &&
        abs(col("x._len") - col("y._len")) <= maxEdits)
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"))
    val names = rows.select(col("_id"), col("_name"))
    prefCand.unionByName(smallCand).distinct()
      .join(names.select(col("_id").as("id_a"), col("_name").as("_na")), "id_a")
      .join(names.select(col("_id").as("id_b"), col("_name").as("_nb")), "id_b")
      // bounded levenshtein (banded O(k·n), early exit; -1 above bound)
      .withColumn("dist", levenshtein(col("_na"), col("_nb"), maxEdits + 1))
      .where(col("dist") >= 0 && col("dist") <= maxEdits)
      .select("id_a", "id_b", "dist")
  }
}
