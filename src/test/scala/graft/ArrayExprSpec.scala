package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.plans.{CountEqual, SortedIntersectSize}

/** Native codegen'd graft_sorted_intersect_size / graft_count_equal:
  * registration, exact parity with the built-in/HOF formulations they
  * replace (on the real corpus, not toy rows), and edge cases. */
class ArrayExprSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("sorted intersect size == size(array_intersect) on every corpus pair sample") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), TextAnalysis.sortedTokenSet(col("text")).as("toks"))
    // a real pair workload: same-lang candidate pairs from a self-join
    // sample (cap keeps the spec fast)
    val a = toks.select(col("doc_id").as("ia"), col("toks").as("ta"))
    val b = toks.select(col("doc_id").as("ib"), col("toks").as("tb"))
    val pairs = a.crossJoin(b).where(col("ia") < col("ib")).limit(20000)
    val both = pairs.select(
        SortedIntersectSize.intersectSizeCol(spark, col("ta"), col("tb")).as("native"),
        size(array_intersect(col("ta"), col("tb"))).as("builtin"))
      .as[(Int, Int)].collect()
    assert(both.length === 20000)
    both.foreach { case (n, b) => assert(n === b) }
  }

  test("sorted intersect size: empty/disjoint/null edge cases") {
    SortedIntersectSize.register(spark)
    val r = spark.sql(
      """SELECT graft_sorted_intersect_size(array('a','b'), CAST(array() AS ARRAY<STRING>)) AS e1,
        |  graft_sorted_intersect_size(CAST(array() AS ARRAY<STRING>), CAST(array() AS ARRAY<STRING>)) AS e2,
        |  graft_sorted_intersect_size(array('a','c'), array('b','d')) AS disj,
        |  graft_sorted_intersect_size(array('a','b','c'), array('a','b','c')) AS all3,
        |  graft_sorted_intersect_size(CAST(NULL AS ARRAY<STRING>), array('a')) AS n1
        |""".stripMargin).collect().head
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) === 0)
    assert(r.getInt(2) === 0)
    assert(r.getInt(3) === 3)
    assert(r.isNullAt(4))
  }

  test("count_equal == aggregate/zip_with composition on signature-shaped arrays") {
    CountEqual.register(spark)
    val sigs = spark.range(500).select(col("id"),
      transform(sequence(lit(0), lit(63)),
        i => pmod(hash(col("id") * lit(64) + i), lit(7)).cast("long")).as("sig"))
    val a = sigs.select(col("id").as("ia"), col("sig").as("sa"))
    val b = sigs.select(col("id").as("ib"), col("sig").as("sb"))
    val pairs = a.crossJoin(b).where(col("ia") < col("ib")).limit(20000)
    val hof = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => (x === y).cast("int")),
      lit(0), (acc, x) => acc + x)
    val both = pairs.select(
        CountEqual.countEqualCol(spark, col("sa"), col("sb")).as("native"),
        hof.as("hof"))
      .as[(Int, Int)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) => assert(n === h) }
    // some pairs must actually agree somewhere for the test to mean much
    assert(both.exists(_._1 > 0))
  }

  test("count_equal: null array yields null; null elements never match") {
    CountEqual.register(spark)
    val r = spark.sql(
      """SELECT graft_count_equal(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n1,
        |  graft_count_equal(array(1L, CAST(NULL AS BIGINT), 3L),
        |                    array(1L, CAST(NULL AS BIGINT), 3L)) AS withnull
        |""".stripMargin).collect().head
    assert(r.isNullAt(0))
    assert(r.getInt(1) === 2)
  }

  test("sorted_first_common == min(array_intersect); null on disjoint/empty/null") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(300) {
      val a = Seq.fill(rnd.nextInt(8))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(8))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(5L), Seq(6L)))
    val df = rows.toDF("a", "b")
    val got = df.withColumn("fc",
        graft.plans.SortedFirstCommon.firstCommonCol(spark, col("a"), col("b")))
      .select("a", "b", "fc")
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    got.foreach { case (a, b, fc) =>
      val want = a.toSet.intersect(b.toSet).minOption
      assert(fc == want, s"a=$a b=$b")
    }
    // null array → null
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .withColumn("fc",
        graft.plans.SortedFirstCommon.firstCommonCol(spark, col("a"), col("b")))
    assert(n.select("fc").collect().head.isNullAt(0))
  }

  test("both expressions stay inside whole-stage codegen") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), TextAnalysis.sortedTokenSet(col("text")).as("toks"))
    val plan = toks.select(
        SortedIntersectSize.intersectSizeCol(spark, col("toks"), col("toks")).as("x"))
      .queryExecution.executedPlan.toString
    // the `*(N)` prefix marks a WholeStageCodegen stage — the projection
    // evaluating the expression must carry it (a CodegenFallback
    // expression would force a plain Project)
    assert("""\*\(\d+\) Project \[graft_sorted_intersect_size""".r
      .findFirstIn(plan).isDefined, plan.take(600))
  }
}
