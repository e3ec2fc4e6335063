package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{LlmQueries, Q, RelationalQueries, SqlQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full medallion pipeline (raw ball events → bronze
    * event-decode + innings sessionization → silver enrichment → gold
    * standings) over the deterministic synthetic season. Exercises scan,
    * when-chain decode, window sessionization, broadcast meta join,
    * keyed dedup, groupBy, outer join, window rank and sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val (raw, meta) = Fixtures.rawSeason(spark)
    Pipeline.toGold(
      Pipeline.toSilver(spark, Pipeline.toBronze(raw), meta))(
      "gold_tournament_standings")
  }

  /** Full registry: relational operator coverage (SURVEY §2 over the
    * TPC-H-ish testdata) + the LLM-training-data families. */
  val registry: Seq[Q] = RelationalQueries.all ++ SqlQueries.all ++ LlmQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-seeded approximate
    * operators (MinHash/SimHash/LSH-ANN/rolling fingerprint) → the driver
    * records a weaker rows-only check; their quality is asserted against
    * exact counterparts in ScalaTest.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
