package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension installing graft's native expressions.
  *
  * Usage:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)         // or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * Sessions created without the extension can call
  * [[DotProduct.register]] for the same effect at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      DotProduct.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "graft_sorted_intersect_size"),
      SortedIntersectSize.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_count_equal"),
      new ExpressionInfo(classOf[CountEqual].getName, "graft_count_equal"),
      CountEqual.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_first_equal_index"),
      new ExpressionInfo(classOf[FirstEqualIndex].getName,
        "graft_first_equal_index"),
      FirstEqualIndex.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_cp31u"),
      new ExpressionInfo(classOf[Cp31Hash].getName, "graft_cp31u"),
      Cp31Hash.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_tok64"),
      new ExpressionInfo(classOf[Tok64Hash].getName, "graft_tok64"),
      Tok64Hash.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      LshBuckets.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_ngram_max_multiplicity"),
      new ExpressionInfo(classOf[NgramMaxMultiplicity].getName,
        "graft_ngram_max_multiplicity"),
      NgramMaxMultiplicity.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_centroid_scores"),
      new ExpressionInfo(classOf[CentroidScores].getName,
        "graft_centroid_scores"),
      CentroidScores.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_id"),
      new ExpressionInfo(classOf[DotIntDouble].getName, "graft_dot_id"),
      DotIntDouble.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_qscore"),
      new ExpressionInfo(classOf[QualityScore].getName, "graft_qscore"),
      QualityScore.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_bounded"),
      new ExpressionInfo(classOf[SortedIntersectBounded].getName,
        "graft_sorted_intersect_bounded"),
      SortedIntersectBounded.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_pii_redact"),
      new ExpressionInfo(classOf[PiiRedact].getName, "graft_pii_redact"),
      PiiRedact.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_bucket_search"),
      new ExpressionInfo(classOf[BucketSearch].getName, "graft_bucket_search"),
      BucketSearch.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_sign_pack"),
      new ExpressionInfo(classOf[SignPack].getName, "graft_sign_pack"),
      SignPack.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[Hamming].getName, "graft_hamming"),
      Hamming.builder))
  }
}
