package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** One driver-contract query: a Spark plan over `/root/testdata/sf*` plus
  * (where SQL-expressible) the equivalent ANSI SQL the driver runs in
  * DuckDB on the same parquet tables. `oracle = None` ⇒ the driver records
  * a weaker rows-only check (used for approximate/hash-seeded operators
  * whose exact output no independent engine reproduces).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Test-table readers + hash-stable numeric helpers for the DuckDB-oracle
  * contract.
  *
  * Numeric parity rules (the Spark result must hash-equal DuckDB's):
  *  - A SUM over doubles is accumulation-order-dependent, so every
  *    money/quantity sum runs through an exact DECIMAL(18,4) accumulator
  *    in BOTH engines and only the final value is cast back to double.
  *    Deterministic at any parallelism, and scale-safe: decimal sums use
  *    the same partial-aggregation (map-side combine) path as any sum.
  *  - `events.ts` has shipped in two physical forms across driver data
  *    snapshots: nanosecond int64 (Spark reads a BIGINT under legacy
  *    nanosAsLong; DuckDB truncates to micros) and `timestamp[us]`
  *    (Spark reads TIMESTAMP_NTZ). All event-time logic therefore runs
  *    on the normalized `us` epoch-microseconds BIGINT ([[usFromTs]]),
  *    which is bit-equal to DuckDB's `epoch_us(ts)` in both forms.
  *  - Integer sums: Spark promotes int→long, DuckDB int→HUGEINT; oracles
  *    CAST to BIGINT explicitly.
  *  - Every query ends in a deterministic total ORDER BY (ties broken by
  *    a key) so row order never depends on partitioning.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with `us` (epoch microseconds, BIGINT) replacing the raw
    * ts — see parity rules above. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.withColumn("us", usFromTs(raw)).drop("ts")
  }

  /** Epoch-microseconds BIGINT from a raw `ts` column, independent of
    * its physical type: nanosecond BIGINT truncates by integer
    * division; TIMESTAMP/TIMESTAMP_NTZ converts via unix_micros. The
    * NTZ branch interprets the naive datetime in the session time zone,
    * which every entry point pins to UTC — matching DuckDB's
    * `epoch_us(ts)` on the same file. */
  def usFromTs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType                          => expr("ts div 1000")
    case TimestampType | TimestampNTZType  => unix_micros(col("ts").cast("timestamp"))
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported physical type $other; expected " +
        "nanosecond BIGINT, TIMESTAMP, or TIMESTAMP_NTZ")
  }

  /** The exact-sum accumulator type. 18 digits / 4 decimals covers every
    * test column (prices < 1e6, quantities < 100) with room for 1e12 rows
    * of headroom after Spark's +10 sum-precision widening. */
  val dec: DecimalType = DecimalType(18, 4)

  def d(c: Column): Column = c.cast(dec)

  /** Exact (order-independent) sum of a double column, as double. */
  def dsum(c: Column): Column = sum(d(c)).cast("double")

  /** Oracle-side spelling of [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  /** Oracle-side int-sum → BIGINT (DuckDB sums ints to HUGEINT). */
  def sqlIsum(expr: String): String = s"CAST(SUM($expr) AS BIGINT)"
}
