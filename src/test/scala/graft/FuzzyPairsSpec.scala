package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyPairs

/** Prefix-filtered q-gram edit-similarity join vs brute force: the
  * filter is a necessary condition, so the operator must return
  * EXACTLY the brute-force pair set — on template-shaped names (whose
  * common grams defeat naive shared-gram blocking), on short strings,
  * and on randomized perturbations.
  */
class FuzzyPairsSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String, String)],
                    k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, na, ba) <- rows; (ib, nb, bb) <- rows
      if ia < ib && ba == bb
      d = lev(na, nb) if d <= k
    } yield (ia, ib, d)).toSet
  }

  private def run(rows: Seq[(Long, String, String)],
                  k: Int): Set[(Long, Long, Int)] =
    FuzzyPairs.editPairs(rows.toDF("id", "name", "blk"),
        "id", "name", "blk", maxEdits = k)
      .as[(Long, Long, Int)].collect().toSet

  test("template names: exact parity with brute force, k = 2") {
    // the "Customer#%09d" shape: shared prefix grams are corpus-wide,
    // only the digit grams discriminate — the prefix filter must pick
    // the rare digit grams, and still find every <=2-edit pair
    val rows = (1 to 300).map(i =>
      (i.toLong, f"Customer#${i * 37 % 1000}%09d", s"n${i % 3}"))
    val got = run(rows, 2)
    val want = brute(rows, 2)
    assert(got == want && want.nonEmpty, s"got ${got.size}, want ${want.size}")
  }

  test("short, empty and sub-q strings still pair correctly") {
    val rows = Seq((1L, "ab", "x"), (2L, "ac", "x"), (3L, "b", "x"),
      (4L, "", "x"), (5L, "ab", "x"), (6L, "zzz", "x"), (7L, "ab", "y"))
    val got = run(rows, 1)
    val want = brute(rows, 1)
    assert(got == want, s"got $got, want $want")
    // sanity: the 1-edit and 0-edit pairs exist and blocks separate
    assert(want.contains((1L, 2L, 1)) && want.contains((1L, 5L, 0)))
    assert(!want.exists(p => p._1 == 7L || p._2 == 7L && p._1 != 7L ||
      (p._1 == 1L && p._2 == 7L)))
  }

  test("layout-independent: same pairs under repartition") {
    val rows = (1 to 150).map(i =>
      (i.toLong, f"Customer#${i * 13 % 500}%09d", s"n${i % 2}"))
    val a = run(rows, 2)
    val b = FuzzyPairs.editPairs(
        rows.toDF("id", "name", "blk").repartition(13),
        "id", "name", "blk", maxEdits = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("randomized perturbations: parity with brute force, k = 3") {
    val rnd = new scala.util.Random(7)
    val base = Seq("alpha beta gamma", "delta epsilon", "Customer#12345",
      "the quick brown fox", "zx")
    val rows = (1 to 200).map { i =>
      val b = base(rnd.nextInt(base.size)).toCharArray
      (0 until rnd.nextInt(4)).foreach { _ =>
        val p = rnd.nextInt(b.length)
        b(p) = ('a' + rnd.nextInt(26)).toChar
      }
      (i.toLong, new String(b), "blk")
    }
    assert(run(rows, 3) == brute(rows, 3))
  }
}
