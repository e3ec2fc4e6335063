package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key admission cap — the ingest-time form of
  * [[graft.operators.Sampling.cappedPerKey]]: admit at most `k`
  * documents per key over the LIFE of the stream (per-domain crawl
  * budgets, per-source ingest quotas). Once a key's quota is spent,
  * everything else from that key drops at the ingest edge — before it
  * is stored, deduped, or shuffled anywhere downstream.
  *
  * Semantics differ from the batch operator deliberately: a stream has
  * no global priority order, so admission is first-arrival-wins within
  * each micro-batch task (ties inside one batch resolve by (seq,
  * doc_id) for determinism under test replay); the batch operator
  * re-ranks by portable-hash priority when a fixed sample is needed
  * later.
  *
  * Scale shape: keyed state is ONE long (the admitted count) per key —
  * bounded by key cardinality, independent of stream length; documents
  * shuffle once on the key.
  */
object StreamCap {

  case class Arrival(key: String, doc_id: Long, seq: Long)
  case class Admitted(key: String, doc_id: Long)

  def admit(k: Int)(
      key: String, rows: Iterator[Arrival],
      state: GroupState[Long]): Iterator[Admitted] = {
    val sofar = state.getOption.getOrElse(0L)
    val room = math.max(k - sofar, 0L).toInt
    val admitted = rows.toSeq.sortBy(a => (a.seq, a.doc_id)).take(room)
    state.update(sofar + admitted.size)
    admitted.iterator.map(a => Admitted(a.key, a.doc_id))
  }

  /** `docs` needs (key, doc_id, seq); runs in streaming or batch mode. */
  def admitUpTo(docs: Dataset[Arrival], k: Int): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    docs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        admit(k))
  }

  /** DataFrame convenience: selects/casts the three columns. */
  def admitUpTo(docs: DataFrame, keyCol: String, k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    admitUpTo(
      docs.select(col(keyCol).cast("string").as("key"),
        col("doc_id").cast("long").as("doc_id"),
        col("seq").cast("long").as("seq")).as[Arrival], k)
      .toDF()
  }
}
