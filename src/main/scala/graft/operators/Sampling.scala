package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus pipelines.
  *
  * `DataFrameStatFunctions.sampleBy` filters on `rand(seed)`, whose
  * per-row values depend on the physical partition layout — a change to
  * `maxPartitionBytes`, a file split, or an upstream repartition silently
  * yields a different sample for the same seed. At 100 TB, where layout
  * is never stable across runs, that makes experiments unreproducible.
  *
  * [[stratifiedByHash]] instead keeps a row iff
  * `portableBucket(idCol, seed) < fraction(stratum) · granularity` —
  * membership is a pure function of the row's id, so the sample is
  * identical under any partitioning, file layout, or engine. The hash is
  * deliberately PORTABLE arithmetic (Lehmer multiplicative step mod the
  * Mersenne prime 2^31−1, then an xor-shift fold — plain `*`, `%`, `^`,
  * `>>` on 64-bit ints, never overflowing), not Spark's murmur3: any
  * engine can reproduce it in SQL, which is what lets the driver's
  * DuckDB oracle verify the sample row-for-row.
  */
object Sampling {

  private val P = 2147483647L // 2^31 − 1 (Mersenne prime)

  /** Fail fast if the input frame already carries one of an operator's
    * internal working columns — a silent collision would corrupt the
    * join/filter arithmetic (ADVICE r10). */
  private def requireNoReserved(df: DataFrame, reserved: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns collide with internal working columns: " +
        s"${clash.mkString(", ")} (rename them before calling)")
  }

  /** Portable per-id bucket in [0, granularity): Lehmer step + xor fold.
    * Expressible verbatim in any SQL engine (64-bit intermediate values
    * only; all non-negative for non-negative ids — callers with signed
    * ids should pre-fold them to non-negative). */
  def portableBucket(idCol: Column, seed: Int,
                     granularity: Int = 10000): Column = {
    val x = pmod(idCol + lit(seed.toLong * 1103515245L), lit(P))
    val h = pmod(x * lit(48271L), lit(P))
    pmod(h.bitwiseXOR(shiftright(h, 16)), lit(granularity.toLong))
  }

  /** The oracle-side spelling of [[portableBucket]] (DuckDB/ANSI-ish SQL
    * over BIGINT; `idExpr` must be non-negative). Kept adjacent to the
    * Spark form so the two formulas can never drift apart silently. */
  def portableBucketSql(idExpr: String, seed: Int,
                        granularity: Int = 10000): String = {
    val p = P
    val shifted = s"(($idExpr + ${seed.toLong * 1103515245L}) % $p)"
    val h = s"(($shifted * 48271) % $p)"
    s"(xor($h, $h >> 16) % $granularity)"
  }

  /** Layout-independent stratified Bernoulli sample. `fraction` is a
    * per-row sampling-rate expression in [0, 1] (typically a `when`
    * chain over the stratum column); rows whose fraction is 0 or null
    * never pass. Shuffle-free: one codegen'd filter. */
  def stratifiedByHash(df: DataFrame, fraction: Column,
                       idCol: String = "doc_id", seed: Int = 42,
                       granularity: Int = 10000): DataFrame =
    df.where(portableBucket(col(idCol), seed, granularity) <
      coalesce(fraction, lit(0.0)) * granularity)

  /** Map-of-strata convenience overload (sampleBy's signature shape):
    * strata absent from the map sample at rate 0. */
  def stratifiedByHash(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], idCol: String,
                       seed: Int): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    stratifiedByHash(df, frac, idCol, seed)
  }

  /** Per-key capped downsampling — "keep at most `k` documents per
    * source/domain", the standard web-corpus guard against one domain
    * dominating the mixture. Rows are ranked inside each key by the
    * deterministic priority `(portableBucket(id, seed), id)` (a
    * layout-independent pseudo-random order any engine reproduces) and
    * rows ranked > k are dropped; the rank survives as `cap_rank`.
    *
    * Scale shape: a single `Window.partitionBy(key)` serializes each
    * key's full row set through one task — at 100 TB a hot domain is
    * exactly the key that breaks. So top-k runs in TWO stages: stage 1
    * ranks within (key, salt) — `salts` subsets of bounded size — and
    * keeps ≤ k rows per salt; stage 2 ranks the ≤ salts·k survivors per
    * key. The global top-k of a union is contained in the union of
    * per-subset top-k's, so the result is exactly the single-window
    * answer (asserted in SamplingSpec) while no task ever sees more
    * than max(n_key/salts, salts·k) rows for one key. */
  def cappedPerKey(df: DataFrame, keyCol: String, k: Int,
                   idCol: String = "doc_id", seed: Int = 42,
                   salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && salts >= 1, s"need k >= 1 and salts >= 1, got k=$k salts=$salts")
    require(!df.columns.exists(Set("_pri", "_salt", "_r1", "cap_rank")),
      "input already carries a _pri/_salt/_r1/cap_rank column")
    val w1 = Window.partitionBy(col(keyCol), col("_salt"))
      .orderBy(col("_pri"), col(idCol))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col("_pri"), col(idCol))
    df.withColumn("_pri", portableBucket(col(idCol), seed))
      // scrambled id (murmur3), not raw id mod salts: strided id
      // allocation must not skew the salt spread; the union of per-salt
      // top-k sets contains the global top-k for ANY salt assignment,
      // so stage 2 returns the identical result
      .withColumn("_salt", pmod(hash(col(idCol)), lit(salts)))
      .withColumn("_r1", row_number().over(w1))
      .where(col("_r1") <= k)
      .withColumn("cap_rank", row_number().over(w2).cast("long"))
      .where(col("cap_rank") <= k)
      .drop("_pri", "_salt", "_r1")
  }

  /** Top-fraction quality gate without a global sort: keep every row
    * whose integer `scoreCol` is ≥ the corpus-wide threshold `t`, where
    * `t` is the LARGEST score such that `count(score ≥ t) · keepDen ≥
    * total · keepNum` — i.e. keep (at least) the top keepNum/keepDen
    * fraction, extending through the boundary bucket (ties are never
    * split, so membership is a pure function of the row's score). When
    * even the top bucket alone exceeds the target the threshold is that
    * bucket; when the fraction is ≥ 1 every row passes (threshold falls
    * to the min score); keepNum = 0 keeps NOTHING (empty frame, schema
    * preserved) rather than letting the ≥-threshold rule degenerate to
    * the top bucket.
    *
    * Scale shape: percentiles via `ntile`/`row_number` would globally
    * sort 100 TB; here the data is only touched by (1) one map-side-
    * combining aggregate onto the score histogram — score-cardinality
    * rows, not data-sized — and (2) one broadcast-threshold filter. The
    * single-partition window runs over the HISTOGRAM only. Integer
    * cross-multiplication keeps the cut engine-reproducible (no FP
    * fraction). Appends the threshold as `gate_threshold`. */
  def topFractionGate(df: DataFrame, scoreCol: Column,
                      keepNum: Long, keepDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepNum >= 0 && keepDen > 0,
      s"need keepNum >= 0 and keepDen > 0, got $keepNum/$keepDen")
    require(!df.columns.exists(Set("_score", "gate_threshold")),
      "input already carries a _score/gate_threshold column")
    val scored = df.withColumn("_score", scoreCol)
    // keep-nothing is the empty frame, not "the whole top bucket": the
    // general threshold rule degenerates (cum·keepDen ≥ tot·0 always
    // holds), so short-circuit with the schema preserved
    if (keepNum == 0)
      return scored.where(lit(false))
        .withColumn("gate_threshold", col("_score")).drop("_score")
    val hist = scored.groupBy("_score").agg(count(lit(1)).as("_cnt"))
    val cum = hist
      .withColumn("_cum", sum("_cnt").over(
        Window.orderBy(desc("_score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(hist.agg(sum(col("_cnt")).as("_tot"))))
    val thr = cum.agg(
      coalesce(max(when(col("_cum") * keepDen >= col("_tot") * keepNum,
        col("_score"))), min(col("_score"))).as("gate_threshold"))
    scored.crossJoin(broadcast(thr))
      .where(col("_score") >= col("gate_threshold"))
      .drop("_score")
  }

  /** Token-budget selection — "take documents, in deterministic
    * pseudo-random priority order, until each language has `budget`
    * tokens" (the data-mixing step that subsamples a source to its token
    * quota). A document is kept iff the tokens BEFORE it in its
    * stratum's (portableBucket(id, seed), id) order total < budget, so
    * the kept set is a prefix of the priority order: the first document
    * crossing the budget line is included (quota reached, never
    * undershot), everything after it drops.
    *
    * Scale shape: the naive formulation is a running-sum window
    * partitioned by stratum alone — ~5 partitions, each sorting its
    * whole corpus in one task (the [[Packing.assignPacks]] scale-killer).
    * Here the window key is the COMPOSITE (stratum, shard) where shard =
    * priority·nShards div granularity — shards are contiguous priority
    * ranges, so cross-shard order is preserved — and each document's
    * global running total is its local window sum plus a broadcast
    * per-shard token-total prefix sum (one row per occupied (stratum,
    * shard): dimension-sized, same contract as
    * [[Packing.assignPacksSharded]]'s offsets). Results are identical to
    * the single-window form (asserted in CurationSpec) on any layout.
    *
    * Returns (idCol, stratumCol, n_tokens, cum_before) for kept rows. */
  def selectToTokenBudget(docs: DataFrame, budget: Long,
                          stratumCol: String = "lang",
                          idCol: String = "doc_id", seed: Int = 42,
                          nShards: Int = 32,
                          granularity: Int = 10000,
                          tokens: Column = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // same contract as Sharding.assignShards: the shard key is a monotone
    // step function of pb, so parallelism caps at nShards ≤ granularity
    require(nShards >= 1 && nShards <= granularity,
      s"need 1 <= nShards <= granularity, got nShards=$nShards granularity=$granularity")
    // default token source: count the text column; pipelines that already
    // carry a token count pass it instead and the text never re-tokenizes
    val tok = Option(tokens)
      .getOrElse(graft.functions.TextAnalysis.tokenCount(col("text")))
    val local = docs.select(col(idCol), col(stratumCol),
        tok.as("n_tokens"))
      .withColumn("_pb", portableBucket(col(idCol), seed, granularity))
      .withColumn("_shard", expr(s"(_pb * $nShards) div $granularity"))
    val w = Window.partitionBy(col(stratumCol), col("_shard"))
      .orderBy("_pb", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wo = Window.partitionBy(col(stratumCol)).orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(stratumCol), col("_shard"))
      .agg(sum("n_tokens").as("_tot"))
      .withColumn("_off", coalesce(sum("_tot").over(wo), lit(0L)))
      .select(col(stratumCol), col("_shard"), col("_off"))
    local
      .withColumn("_cum_local", coalesce(sum("n_tokens").over(w), lit(0L)))
      .join(broadcast(offsets), Seq(stratumCol, "_shard"))
      .withColumn("cum_before", col("_off") + col("_cum_local"))
      .where(col("cum_before") < budget)
      .select(col(idCol), col(stratumCol), col("n_tokens"), col("cum_before"))
  }

  /** Multi-epoch upsampling — the other half of data mixing: a small
    * high-quality stratum is REPEATED (trained for several epochs)
    * while [[mixtureResample]] downsamples the large ones. Fractional
    * epochs are exact integers `epochsNum(stratum) / epochsDen`
    * (e.g. 5/2 = 2.5 epochs): every document emits `num div den` full
    * copies, and the partial epoch keeps the deterministic
    * `portableBucket(id) · den < (num mod den) · granularity` subset —
    * layout- and engine-independent membership, same contract as
    * [[stratifiedByHash]]. Strata absent from the map emit nothing
    * (mirroring [[mixtureResample]]). Returns one row per kept copy:
    * `(idCol, stratumCol, epoch)`, epoch 1-based with the partial
    * epoch last.
    *
    * Scale shape: pure per-row expressions — a `sequence` explode of at
    * most `num div den + 1` copies and one integer predicate. No
    * shuffle, no aggregate, no window; the blow-up factor is the
    * epoch count itself, which is the point. */
  def epochUpsample(df: DataFrame, epochsNum: Map[String, Int],
                    epochsDen: Int, stratumCol: String = "lang",
                    idCol: String = "doc_id", seed: Int = 42,
                    granularity: Int = 10000): DataFrame = {
    require(epochsDen > 0, s"epochsDen must be positive, got $epochsDen")
    require(epochsNum.values.forall(_ >= 0),
      "epoch numerators must be non-negative")
    require(!Set(idCol, stratumCol).exists(Set("_num", "_pb", "epoch")),
      "idCol/stratumCol collide with a reserved _num/_pb/epoch column")
    val num = epochsNum.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v.toLong)).otherwise(acc)
    }
    val den = lit(epochsDen.toLong)
    df.select(col(idCol), col(stratumCol))
      .withColumn("_num", num)
      .withColumn("_pb", portableBucket(col(idCol), seed, granularity))
      .withColumn("epoch",
        explode(sequence(lit(1L), expr(s"_num div $epochsDen") + 1)))
      .where(col("epoch") <= expr(s"_num div $epochsDen") ||
        (pmod(col("_num"), den) > 0 &&
          col("_pb") * den < pmod(col("_num"), den) * granularity))
      .select(col(idCol), col(stratumCol), col("epoch"))
  }

  /** Corpus mixture resampling: deterministically downsample each stratum
    * toward target mixture `weights` (integer numerators over
    * `weightDen`; e.g. en→4, fr→2 … over 10 = "40% en, 20% fr …" of the
    * ORIGINAL corpus size). A stratum below its target keeps every row
    * (no upsampling); strata absent from `weights` are dropped.
    *
    * Membership is the exact integer predicate
    * `bucket · weightDen · n_stratum < w · n_total · granularity`
    * — a cross-multiplied form of `bucket/granularity <
    * (w/weightDen · n_total)/n_stratum` with no floating point anywhere,
    * so the kept set is bit-reproducible on any engine and any layout
    * (same [[portableBucket]] contract as [[stratifiedByHash]]).
    *
    * Scale shape: the per-stratum counts are a stratum-cardinality-sized
    * aggregate joined back by explicit `broadcast`; the filter itself is
    * one codegen'd predicate, so the whole operator costs one scan plus
    * one tiny aggregate — no data-sized shuffle. Long arithmetic holds to
    * corpus sizes of ~10^13 rows (bucket < 10^4, weightDen ~10:
    * 10^4·10·10^13 < 2^63). */
  def mixtureResample(df: DataFrame, weights: Map[String, Int],
                      weightDen: Int, stratumCol: String = "lang",
                      idCol: String = "doc_id", seed: Int = 42,
                      granularity: Int = 10000): DataFrame = {
    require(weights.values.forall(_ >= 0) && weightDen > 0,
      "weights must be non-negative integer numerators over a positive denominator")
    requireNoReserved(df, Seq("_stratum", "_n_stratum", "_n_total"))
    val counts = df.groupBy(col(stratumCol).as("_stratum"))
      .agg(count(lit(1)).as("_n_stratum"))
    val total = df.agg(count(lit(1)).as("_n_total"))
    val w = weights.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v.toLong)).otherwise(acc)
    }
    df.join(broadcast(counts), col(stratumCol) === col("_stratum"))
      .crossJoin(broadcast(total))
      .where(portableBucket(col(idCol), seed, granularity) *
        weightDen * col("_n_stratum") <
        w * col("_n_total") * granularity)
      .drop("_stratum", "_n_stratum", "_n_total")
  }

  /** Temperature-scaled mixture resampling (T = 2): each stratum's
    * share of a `totalTarget`-row corpus is proportional to
    * `√n_stratum` — the standard multilingual rebalancing that
    * upweights small languages relative to proportional sampling
    * (general `n^(1/T)` needs `pow`, a libm call whose last ulp is
    * engine-dependent; `sqrt` is IEEE-754 CORRECTLY ROUNDED on every
    * engine, so T = 2 — much the commonest setting — is reproducible
    * bit-for-bit and is the one offered).
    *
    * The weight is integerized as `w_s = floor(1000·√n_s)` (identical
    * doubles in, identical longs out, on any engine) and membership is
    * the exact cross-multiplied integer predicate
    * `pb · n_s · Σw < granularity · totalTarget · w_s`, evaluated in
    * DECIMAL(38,0) on the Spark side and HUGEINT in the oracle — the
    * products reach ~10²⁸ at 10¹³-row strata, past BIGINT. A stratum
    * whose target exceeds its size keeps every row (no upsampling —
    * [[epochUpsample]] is the upsampling half); the realized total
    * tracks `totalTarget` to bucket granularity, exactly like
    * [[mixtureResample]].
    *
    * Scale shape: one stratum-cardinality aggregate (+ its one-row
    * total), broadcast back; the filter is one codegen'd predicate —
    * one scan, no data-sized shuffle. */
  def temperatureResample(df: DataFrame, totalTarget: Long,
                          stratumCol: String = "lang",
                          idCol: String = "doc_id", seed: Int = 42,
                          granularity: Int = 10000): DataFrame = {
    require(totalTarget >= 0, s"totalTarget must be >= 0, got $totalTarget")
    requireNoReserved(df, Seq("_stratum", "_n_stratum", "_w", "_w_tot"))
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = df.groupBy(col(stratumCol).as("_stratum"))
      .agg(count(lit(1)).as("_n_stratum"))
      .withColumn("_w",
        floor(lit(1000.0) * sqrt(col("_n_stratum").cast("double")))
          .cast("long"))
    val wTot = counts.agg(sum("_w").as("_w_tot"))
    df.join(broadcast(counts), col(stratumCol) === col("_stratum"))
      .crossJoin(broadcast(wTot))
      .where(portableBucket(col(idCol), seed, granularity).cast(dec38) *
        col("_n_stratum").cast(dec38) * col("_w_tot").cast(dec38) <
        lit(granularity.toLong).cast(dec38) *
          lit(totalTarget).cast(dec38) * col("_w").cast(dec38))
      .drop("_stratum", "_n_stratum", "_w", "_w_tot")
  }
}
