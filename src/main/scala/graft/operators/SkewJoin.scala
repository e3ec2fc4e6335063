package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys — the manual remedy when one
  * join key holds a disproportionate share of the fact rows, the dim
  * side is too large to broadcast, and a plain shuffle join would send
  * the whole hot key to one reducer. (AQE's skew-join split handles
  * sort-merge stragglers at runtime; salting is the declarative form
  * that also pre-spreads the SHUFFLE WRITE, and the shape a pipeline
  * pins when it cannot rely on runtime re-planning.)
  *
  * Fact rows get a deterministic salt in [0, salts) hashed from the full
  * row; dim rows are replicated once per salt value (`explode` of a
  * `sequence` — dim×salts rows, the standard cost of salting). The join
  * then runs on (key, salt), spreading each hot key over `salts`
  * reducers. The result is exactly `fact ⋈ dim` on `key`: salt values
  * partition the fact side, and every fact salt finds its dim copy.
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `key` (the column must exist
    * on both sides) with `salts`-way salting. Result is identical to
    * `fact.join(dim, Seq(key))` up to row order. */
  def saltedInner(fact: DataFrame, dim: DataFrame, key: String,
                  salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // A pre-existing _salt would be silently replaced on the fact side
    // and collide with the dim explode, yielding wrong join results.
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "saltedInner reserves the column name _salt; rename it on the input")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
