package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.Dedup

/** The cluster-routed Jaccard verify (r11): output-identical to the
  * direct attach-join shape, and plan-verified to move the candidate
  * pairs through the two attach joins WITHOUT an intermediate shuffle —
  * the property that caps the verify's network/scratch volume at
  * one-copy-per-doc instead of one-copy-per-pair.
  */
class JaccardRouteSpec extends SparkSpec {
  import spark.implicits._

  // three dup families with token drift + unrelated noise docs, two langs
  private def corpus: org.apache.spark.sql.DataFrame = {
    val fams = for {
      f <- 0 until 3
      i <- 0 until 8
    } yield {
      val base = (0 until 30).map(t => s"fam${f}tok$t")
      // drift: replace i tokens per member — J declines with i
      val txt = base.zipWithIndex
        .map { case (t, j) => if (j < i) s"drift${f}_${i}_$j" else t }
      (f * 100L + i, if (f == 2) "fr" else "en", txt.mkString(" "))
    }
    val noise = (0 until 10).map { i =>
      (900L + i, "en", (0 until 25).map(t => s"noise${i}uniq$t").mkString(" "))
    }
    (fams ++ noise).toDF("doc_id", "lang", "text")
  }

  test("routed verify == direct verify, exactly") {
    val direct = Dedup.jaccardPairs(corpus, 0.5,
        routeThresholdDocs = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val routedRows = Dedup.jaccardPairs(corpus, 0.5, routeThresholdDocs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val routed = routedRows.toSet
    assert(direct.nonEmpty, "corpus must produce pairs for the spec to bite")
    // the in-join canonical-occurrence dedup must emit each pair ONCE
    // (there is no distinct() downstream to hide a double-count)
    assert(routedRows.size == routed.size,
      s"duplicate pairs emitted: ${routedRows.size} rows, ${routed.size} unique")
    assert(routed == direct)
  }

  test("no shuffle between the two routed attach joins; array side hash-built") {
    // disable broadcast so the toy corpus exercises the AT-SCALE plan
    // shape (at sf100 the token-set sides are GBs and never broadcast;
    // broadcasting them at toy scale hides the partitioning-reuse
    // property this spec exists to pin)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val routed = Dedup.jaccardPairs(corpus, 0.5, routeThresholdDocs = 0L)
    routed.collect() // finalize AQE
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    // AQE QueryStageExec nodes are leaves whose `plan` holds the real
    // subtree — collect() won't descend, so walk them explicitly
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: kids(p).flatMap(allNodes)
    val plan = unwrap(routed.queryExecution.executedPlan)
    val nodes = allNodes(plan)
    // the verify is a cogroup on the component key
    assert(nodes.exists(_.nodeName.contains("CoGroup")),
      s"expected a CoGroup verify, got:\n$plan")
    // THE property that caps verify volume at one-copy-per-doc: no
    // exchange anywhere in the routed plan ships rows carrying both a
    // pair id and a token-set array (the direct shape's second attach
    // join does exactly that, once per candidate pair)
    val offenders = nodes.filter { n =>
      n.nodeName.contains("Exchange") && {
        val fields = n.schema.fields
        val names = fields.map(_.name).toSet
        fields.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) &&
          (names.contains("toks_a") || names.contains("toks_b") ||
            (names.contains("doc_a") && names.contains("doc_b")))
      }
    }
    assert(offenders.isEmpty,
      s"pair+array rows crossed an exchange: ${offenders.map(_.schema.simpleString)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
