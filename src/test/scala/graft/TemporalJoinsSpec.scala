package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: inclusive at equal time, null before first right row") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L),
      (2L, 50L, 103L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0)).toDF("k", "t", "v")
    val out = TemporalJoins.asofBackward(left, right, Seq("k"), "t", "t",
        Map("v" -> "last_v"))
      .select("lid", "last_v").as[(Long, Option[Double])].collect().toMap
    assert(out(100L) === Some(1.0)) // equal time ⇒ inclusive
    assert(out(101L) === Some(2.0)) // most recent, not first
    assert(out(102L) === None)      // before any right row
    assert(out(103L) === None)      // key with no right rows at all
  }

  test("within-range: each qualifying pair exactly once, boundary inclusive") {
    val ev = Seq((1L, 0L, 1L), (1L, 60L, 2L), (1L, 61L, 3L), (1L, 200L, 4L),
      (2L, 0L, 5L)).toDF("k", "t", "id")
    val pairs = TemporalJoins.withinRange(ev, Seq("k"), "t", "id", 60L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // |0-60| = 60 inclusive; |0-61| = 61 excluded; |60-61| = 1 included;
    // id 4 is 139+ from everything; key 2 has no partner
    assert(pairs === Set((1L, 2L), (2L, 3L)))
  }
}
