package graft

/** Driver-contract integrity: every oracle belongs to a query, names are
  * unique, and every registered query planr builds and returns rows on
  * the smallest scale factor (catches schema drift against testdata
  * without waiting for the driver's sf0.01 run). */
class RegistrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registry names are unique and oracles reference real queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 76)
    assert(SparkEntry.oracleSql.size >= 65)
  }

  test("every query executes and returns rows at sf0.001") {
    val failures = SparkEntry.registry.flatMap { q =>
      try {
        if (q.fn(spark, sf).count() > 0) None else Some(s"${q.name}: 0 rows")
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns standings rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
