package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** PII-safe identifier handling for training-data exports:
  * deterministic pseudonymization (same input → same token, so joins and
  * aggregations still line up after anonymization) and tail-preserving
  * masking. Both are pure codegen'd column expressions — per-row,
  * shuffle-free, embarrassingly parallel.
  *
  * The pseudonym is two independent passes of the portable Lehmer/xor
  * hash ([[Sampling.portableBucket]]) combined into one ~62-bit token —
  * deliberately PORTABLE arithmetic so an independent engine reproduces
  * every token (the DuckDB oracle contract). Production note: at 10^12
  * ids a 62-bit token's birthday collision odds are ~2.5%; a real
  * deployment would swap in a keyed 128-bit MAC — the operator shape
  * (deterministic token, referential integrity, masked display column)
  * is what this pins.
  */
object Anonymize {

  private val P = 2147483647L // 2^31 − 1, the portable-hash modulus

  /** ~62-bit deterministic pseudonym of a non-negative integer id. */
  def pseudonymizeId(id: Column, seed: Int): Column =
    Sampling.portableBucket(id, seed, Int.MaxValue) * P +
      Sampling.portableBucket(id, seed + 1, Int.MaxValue)

  /** Oracle-side spelling of [[pseudonymizeId]] (BIGINT SQL), kept
    * adjacent so the formulas cannot drift. */
  def pseudonymizeIdSql(idExpr: String, seed: Int): String =
    s"(${Sampling.portableBucketSql(idExpr, seed, Int.MaxValue)} * $P + " +
      s"${Sampling.portableBucketSql(idExpr, seed + 1, Int.MaxValue)})"

  /** Mask every character except the last `keep`: `Customer#000000042`
    * → `**************0042`. Pure string arithmetic (no regex lookarounds
    * — RE2 engines lack them, and the oracle must reproduce this). */
  def maskAllButLast(c: Column, keep: Int): Column =
    concat(repeat(lit("*"), greatest(length(c) - keep, lit(0))),
      substring(c, -keep, keep))
}
