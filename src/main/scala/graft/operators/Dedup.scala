package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextAnalysis

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard (blocked), MinHash-LSH (banded), and SimHash.
  *
  * Scale design: nothing here is all-pairs over the corpus.
  *  - exact dedup = one hash aggregation on the fingerprint;
  *  - Jaccard pairs are blocked on (lang, compatible size) — the size
  *    predicate `2·min ≥ max` is a *necessary* condition for J ≥ 0.5, so
  *    no true pair is lost while the candidate space collapses;
  *  - MinHash-LSH generates candidates only within band buckets (the
  *    classic b×r banding scheme), then verifies with exact Jaccard —
  *    the shuffle key is the band bucket, never the cross product;
  *  - SimHash is a per-row signature; near-dup candidates come from
  *    signature-prefix buckets.
  */
object Dedup {

  /** Exact duplicate groups: canonical (min) doc_id + group size per
    * normalized-content fingerprint. One shuffle on the fingerprint. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(TextAnalysis.md5Fingerprint(col("text")).as("fingerprint"))
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("dup_count"))

  /** ln-scale size bucket with width ln(1/threshold): two token sets
    * that can reach J ≥ threshold (size ratio ≤ 1/threshold, see
    * [[jaccardPairs]]) land in the same or adjacent buckets. Exposed
    * package-private so specs can assert the blocking-key cardinality
    * scales with the corpus instead of capping at #langs. */
  private[graft] def sizeBucket(nToks: org.apache.spark.sql.Column,
                                threshold: Double): org.apache.spark.sql.Column = {
    // clamp keeps threshold = 1 meaningful (bucket ≈ exact size match)
    val width = math.max(math.log(1.0 / threshold), 1e-9)
    floor(log(greatest(nToks, lit(1)).cast("double")) / width).cast("long")
  }

  /** Sorted 64-bit token-hash set of a text column (graft_tok64 over
    * the distinct tokens): the exact-verify representation — fixed
    * 8 bytes per token through the candidate-pair joins, primitive
    * compares in the two-pointer intersect. Hash identity ≡ string
    * identity up to 2⁻⁶⁴-scale collisions (the md5-fingerprint trade).
    */
  private def sortedTokenHashSet(docs: DataFrame,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_sort(transform(TextAnalysis.tokenSet(text),
      t => graft.plans.Tok64Hash.tok64Col(docs.sparkSession, t)))

  /** One-pass token-set projection: (doc_id, lang, toks, n_toks) with
    * `toks` the sorted 64-bit token-hash set. Package-private so specs
    * can feed [[prefixTokens]] directly. */
  private[graft] def tokenSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      sortedTokenHashSet(docs, col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")))

  /** Prefix-filter token stream (AllPairs/ppjoin family; Bayardo et al.
    * WWW'07, Xiao et al. WWW'08): each document's `n − ⌈t·n⌉ + 1`
    * globally RAREST tokens under the total order (document frequency
    * asc, token hash asc). For any pair with J ≥ t, the smallest
    * common token in that order provably lies in BOTH prefixes — if it
    * didn't lie in A's, at least |A| − ⌈t·|A|⌉ + 1 tokens of A would
    * precede every common token, forcing |A∩B| ≤ ⌈t·|A|⌉ − 1 < t·|A| ≤
    * t·|A∪B|, contradicting J ≥ t — so an equi-join on a shared prefix
    * token is a LOSSLESS candidate generator whose key cardinality is
    * the token vocabulary: it grows with the corpus, and documents with
    * no tokens in common (e.g. different crawl shards/languages) never
    * meet at all. The 1e-9 slack inside ceil only ever LENGTHENS a
    * prefix when t·n sits on an exact-integer boundary that floating
    * multiplication overshoots, so it cannot lose pairs.
    *
    * Returns (doc_id, lang, n_toks, tok, pos, ptoks) — one row per
    * prefix token. `pos` is the token's 1-based rank in the doc's FULL
    * (df asc, tok asc)-ordered token list — the ppjoin positional-
    * filter input (Xiao et al. WWW'08): every common token of a pair
    * sits at or after the first common token in each side's order, so
    * |A∩B| ≤ |A| − pos_A + 1 at that token. `ptoks` is the doc's
    * prefix flattened as (df, tok, pos) TRIPLES sorted by (df, tok) —
    * the walk order of [[graft.plans.PrefixPositional]], which fuses
    * the canonical-occurrence dedup (evaluate each pair only at its
    * first common prefix entry, no `distinct()` shuffle — see
    * [[jaccardPairs]]) with the positional lookup. At any threshold
    * the prefix is the short end of the document (`n − ⌈t·n⌉ + 1`
    * tokens — ~3 at t = 0.9), so the array is a few extra longs per
    * row. `pos` is capped at 2^21 − 1 to fit the packed return value;
    * capping DOWN only ever LOOSENS the positional bound (|A| − pos
    * grows), so a >2M-token monster document degrades pruning, never
    * correctness. Both shuffles scale linearly: the df aggregate
    * map-side combines on the token, the rank window partitions per
    * document (the prefix-array collect reuses the same per-document
    * partitioning — one exchange, two in-partition passes). */
  private[graft] def prefixTokens(toks: DataFrame,
                                  threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = toks.select(col("doc_id"), col("lang"), col("n_toks"),
      explode(col("toks")).as("tok"))
    // toks holds SETS, so the occurrence count is the document frequency
    val dfT = ex.groupBy("tok").agg(count(lit(1)).as("_df"))
    val p = col("n_toks") -
      ceil(col("n_toks") * lit(threshold) - lit(1e-9)) + lit(1)
    // no broadcast hint: the vocabulary is corpus-sized at scale (AQE
    // broadcasts the few-MB df table itself at test scale)
    ex.join(dfT, "tok")
      .withColumn("_rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("_df"), col("tok"))))
      .where(col("_rk") <= p)
      .withColumn("pos", least(col("_rk").cast("long"), lit((1L << 21) - 1)))
      .withColumn("ptoks", flatten(transform(
        array_sort(collect_list(struct(col("_df"), col("tok"), col("pos"))).over(
          Window.partitionBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))),
        e => array(e("_df"), e("tok"), e("pos")))))
      .select("doc_id", "lang", "n_toks", "tok", "pos", "ptoks")
  }

  /** Candidate pairs of the prefix-filtered Jaccard join: each
    * qualifying pair exactly once, every bound applied MAP-SIDE inside
    * the join stage, before the pair shuffle. Shared by [[jaccardPairs]]
    * and the at-scale probe ([[graft.tools.ProbeJaccard]]) so the two
    * can't drift.
    *
    * Four conjoined *necessary* conditions, each lossless (r12 — the
    * full ppjoin family, Xiao et al. WWW'08):
    *  - size compatibility: J ≥ t ⟹ min ≥ t·max (size filter + bucket
    *    replication on side b);
    *  - asymmetric INDEX prefix (in the body below): the smaller side
    *    offers only its first `n − ⌈(2t/(1+t))·n⌉ + 1` tokens, cutting
    *    join fan-in before any pair exists;
    *  - canonical occurrence: a pair sharing m candidate tokens meets m
    *    times; [[graft.plans.PrefixPositional]] returns non-NULL only
    *    where the join token is the FIRST common (df, tok) prefix
    *    entry — exact dedup with no occurrence shuffle (a `distinct()`
    *    here overflowed local scratch at the r11 sf100 probe), the
    *    minhash FirstEqualIndex shape. Buckets and salts cannot
    *    double-count: side a pins its own bucket and salt, so a pair
    *    meets a given shared token at most once;
    *  - ppjoin positional bound (the r11 finding: 946.6M candidates
    *    for a 245.97M-pair sf100 answer = 3.8× over-generation): at
    *    that first common token, |A∩B| ≤ min(|A| − posA + 1,
    *    |B| − posB + 1), and J ≥ t needs |A∩B| ≥ ⌈t·(|A|+|B|)/(1+t)⌉,
    *    so candidates whose shared token sits too deep in either
    *    prefix die HERE instead of riding the pair shuffle into the
    *    verify. The 1e-9 slack inside ceil can only round the required
    *    overlap DOWN to its exact integer value, never up past it, so
    *    no qualifying pair is lost (the prefix-length slack argument).
    *
    * `positional = false` selects [[jaccardCandidatesSymmetric]] — the
    * r11 shape (symmetric probe prefixes, no bound) kept as the
    * like-for-like A/B baseline behind ProbeJaccard's SPARK_GRAFT_AB
    * and the pruning spec's superset check; production callers never
    * pass it. */
  private[graft] def jaccardCandidates(pfx: DataFrame, threshold: Double,
                                       salts: Int = 1,
                                       positional: Boolean = true): DataFrame = {
    if (!positional) return jaccardCandidatesSymmetric(pfx, threshold, salts)
    // Orientation by SIZE (a = larger, ties by id): the side-b stream
    // offers only its INDEX prefix — the first
    // `n − ⌈(2t/(1+t))·n⌉ + 1` tokens in the (df, tok) order (~3 at
    // t = 0.9 vs the ~5-token probe prefix). Lossless for the smaller
    // record of a qualifying pair: overlap o ≥ t(na+nb)/(1+t) ≥
    // (2t/(1+t))·nb when nb ≤ na, so if the first common token sat
    // past b's index prefix, o ≤ nb − idxLen = ⌈(2t/(1+t))·nb⌉ − 1 <
    // o — contradiction. Join fan-in drops on both axes: fewer b rows
    // per doc AND only {bkt, bkt+1} bucket replicas (nb ≤ na pins
    // bucket(na) ≥ bucket(nb)), vs the symmetric shape's full probe
    // prefix × 3 replicas.
    val a = pfx.select(col("doc_id").as("ida"), col("lang"),
      col("tok"), col("n_toks").as("na"), col("ptoks").as("pa"))
      .withColumn("size_bucket", sizeBucket(col("na"), threshold))
      // scrambled id (murmur3), not raw id mod salts: strided id
      // allocation must not skew the salt spread (semDedup precedent)
      .withColumn("salt", pmod(hash(col("ida")), lit(salts)).cast("int"))
    val idxLen = (col("n_toks") -
      ceil(col("n_toks") * lit(2.0 * threshold / (1.0 + threshold)) -
        lit(1e-9)) + lit(1)).cast("int")
    val bkt = sizeBucket(col("nb"), threshold)
    // the triple array is (df, tok)-sorted == pos-sorted, so the index
    // prefix is its first 3·idxLen elements (pos is capped at 2^21−1
    // for monster docs; a capped row passing the filter spuriously is
    // harmless — its token is absent from the sliced array, so the
    // first-common check below returns NULL and the row drops)
    val b = pfx
      .withColumn("_il", idxLen)
      .where(col("pos") <= col("_il"))
      .select(col("doc_id").as("idb"), col("lang"), col("tok"),
        col("n_toks").as("nb"),
        slice(col("ptoks"), lit(1), col("_il") * lit(3)).as("pb"))
      .withColumn("size_bucket", explode(array(bkt, bkt + 1)))
      .withColumn("salt", explode(lit((0 until salts).toArray)))
    val pp = graft.plans.PrefixPositional
      .posCol(pfx.sparkSession, col("pa"), col("pb"), col("tok"))
    // required overlap for J ≥ t: o/(na+nb−o) ≥ t ⟺ o ≥ t(na+nb)/(1+t)
    val alpha = ceil((col("na") + col("nb")) *
      lit(threshold / (1.0 + threshold)) - lit(1e-9))
    a.join(b, Seq("lang", "size_bucket", "tok", "salt"))
      .where((col("na") > col("nb") ||
          (col("na") === col("nb") && col("ida") < col("idb"))) &&
        col("nb") >= col("na") * threshold)
      .withColumn("_pp", pp)
      // non-NULL certifies the join token is the pair's FIRST common
      // prefix entry (exact dedup, one occurrence per pair) AND carries
      // its positions for the ppjoin bound
      .where(col("_pp").isNotNull &&
        least(col("na") - shiftright(col("_pp"), 21),
          col("nb") - col("_pp").bitwiseAND(lit((1L << 21) - 1))) +
          lit(1) >= alpha)
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"))
  }

  /** The r11 symmetric probe×probe shape without the positional bound —
    * kept ONLY as the like-for-like A/B baseline behind
    * `jaccardCandidates(positional = false)` (ProbeJaccard's
    * SPARK_GRAFT_AB run and the pruning spec's superset check). */
  private def jaccardCandidatesSymmetric(pfx: DataFrame, threshold: Double,
                                         salts: Int): DataFrame = {
    val a = pfx.select(col("doc_id").as("doc_a"), col("lang"),
      col("tok"), col("n_toks").as("na"), col("ptoks").as("pa"))
      .withColumn("size_bucket", sizeBucket(col("na"), threshold))
      .withColumn("salt", pmod(hash(col("doc_a")), lit(salts)).cast("int"))
    val bkt = sizeBucket(col("nb"), threshold)
    val b = pfx.select(col("doc_id").as("doc_b"), col("lang"),
      col("tok"), col("n_toks").as("nb"), col("ptoks").as("pb"))
      .withColumn("size_bucket", explode(array(bkt - 1, bkt, bkt + 1)))
      .withColumn("salt", explode(lit((0 until salts).toArray)))
    val pp = graft.plans.PrefixPositional
      .posCol(pfx.sparkSession, col("pa"), col("pb"), col("tok"))
    a.join(b, Seq("lang", "size_bucket", "tok", "salt"))
      .where(col("doc_a") < col("doc_b") &&
        col("na") >= col("nb") * threshold &&
        col("nb") >= col("na") * threshold)
      .where(pp.isNotNull)
      .select("doc_a", "doc_b")
  }

  /** Word-set Jaccard similarity pairs with J ≥ threshold. Returns
    * (doc_a, doc_b, jaccard), doc_a < doc_b.
    *
    * Candidate key = (lang, ln-scale size bucket, shared prefix token) —
    * the conjunction of *necessary* conditions, each lossless
    * (see [[jaccardCandidates]] for the full derivation):
    *  - size compatibility: J ≥ t requires min(|A|,|B|) ≥ t·max(|A|,|B|),
    *    so with bucket width ln(1/t) a qualifying pair's buckets differ
    *    by ≤ 1 — side a pins its own bucket, side b replicates to
    *    {b−1, b, b+1} (the [[TemporalJoins.withinRange]] pattern);
    *  - prefix filter: the pair must share one of each side's rarest
    *    `n − ⌈t·n⌉ + 1` tokens ([[prefixTokens]]);
    *  - ppjoin positional bound: at the pair's FIRST common prefix
    *    token, the achievable overlap min(|A| − posA + 1, |B| − posB + 1)
    *    must reach ⌈t·(|A|+|B|)/(1+t)⌉ (r12; cut sf100 candidates
    *    before the pair shuffle).
    * A pair sharing m prefix tokens matches m times; the fused
    * [[graft.plans.PrefixPositional]] keeps only the first-common-token
    * occurrence IN the join stage (no pair-key `distinct` shuffle), so
    * the two-pointer intersect runs once per candidate pair.
    *
    * Scale: the r9 sf10 (100×) run exposed the previous
    * (lang, size_bucket)-only key as quadratic — bucket COUNT is fixed
    * by the size distribution, so 10× corpus ⇒ 100× pairs per bucket,
    * and the hottest bucket ran in ONE task for 46+ minutes. The prefix
    * token component makes the key cardinality grow with the
    * VOCABULARY: disjoint-vocabulary documents (other crawl shards,
    * other languages) generate zero candidates, and residual hot-token
    * skew is AQE-splittable because the quadratic work is spread over
    * (bucket × token) cells. `salts` multiplies parallelism further for
    * residual skew (side a pins a scrambled-doc-id salt, side b
    * replicates across all N — output identical); default 1 because the
    * 3× bucket replication already dominates.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   salts: Int = 1, routeThresholdDocs: Long = 200000L): DataFrame = {
    // ONE tokenize pass (localCheckpoint, the minhashLshPairs
    // precedent): four consumers — the df aggregate and the prefix
    // stream inside prefixTokens, and both verify-side attach joins —
    // re-read ~|set| longs per doc instead of re-scanning the corpus.
    // Token identity via the 64-bit graft_tok64 ≡ string identity up
    // to 2⁻⁶⁴-scale collisions (the md5-fingerprint trade; equality
    // with the string formulation is property-tested).
    // NOT Par.floor'd (measured r17): jaccard's heavy stages all sit
    // past an exchange (df aggregate, rank window, bucket join), so the
    // floor only adds an exchange + 32-way scheduling to the tokenize
    // pass — q_dedup_ngram_jaccard read 3.2 -> 4.15 s median with it,
    // and the CC loop downstream of these pairs inherits the width.
    val toks = tokenSets(docs).localCheckpoint()
    // the prefix stream is doc×prefix-sized (≪ corpus tokens);
    // checkpoint once so the self-join's two sides don't each re-run
    // the df aggregate + rank window
    val pfx = prefixTokens(toks, threshold).localCheckpoint()
    val cand = jaccardCandidates(pfx, threshold, salts)
    // Two verify shapes, same output. DIRECT attaches the token arrays
    // with two plain joins — but the second one re-shuffles every
    // candidate pair WITH doc_a's array attached (~|set|·8 B per PAIR:
    // ~300 GB at sf100, where the r10 probe died on scratch). Above
    // routeThresholdDocs the CLUSTER-ROUTED shape ships each doc's
    // array once instead (see [[clusterRoutedVerify]]). The switch is a
    // deterministic function of the corpus size, and both shapes are
    // output-identical (spec-pinned), so the oracle is unaffected.
    val direct = {
      val ta = toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
        col("n_toks").as("na"))
      val tb = toks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
        col("n_toks").as("nb"))
      val inter = graft.plans.SortedIntersectSize
        .intersectSizeCol(docs.sparkSession, col("toks_a"), col("toks_b"))
      cand.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn("inter", inter)
        // raw int/int division — bit-identical in any engine, so no ROUND
        // (which Spark and DuckDB perform differently on binary doubles)
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .where(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    }
    if (toks.count() < routeThresholdDocs) direct
    else {
      // PAIR-scale block store entries go straight to disk: at sf100
      // the 842M-row candidate list cached MEMORY_AND_DISK squeezed the
      // unified pool until concurrent aggregates got ZERO execution
      // memory (UNABLE_TO_ACQUIRE_MEMORY, in-bench r12) — and on a real
      // executor the same competition exists per node. Re-reads are
      // sequential scans (verify + CC rounds), which local disk + page
      // cache serve at memory speed; only pair-scale frames pay the
      // serialization toll (node- and corpus-scale checkpoints stay
      // MEMORY_AND_DISK).
      val c = cand.localCheckpoint(true, StorageLevel.DISK_ONLY) // eager: candidate generation runs here
      // the prefix stream's blocks are dead once candidates exist
      pfx.unpersist()
      // reclaim the generation stages' shuffle files (tokenize/df/rank/
      // join) before CC + verify allocate their own — the checkpoint
      // truncated the lineage, so a GC frees them
      System.gc()
      clusterRoutedVerify(c, toks, threshold)
    }
  }

  /** Sorted-set intersection size — the driver/executor-side twin of
    * [[graft.plans.SortedIntersectSize]]'s two-pointer walk (same
    * contract: both arrays ascending + distinct). */
  private[graft] def intersectSorted(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  /** One-exchange-per-input candidate-pair verification, routed by
    * connected component (the r10 sf100 finding: the direct verify's
    * second attach join ships doc_a's token array once per PAIR —
    * ~300 GB of shuffle for a 246M-pair answer vs 55 GB of local
    * scratch; the DATA only needs each doc's array once, because a
    * candidate pair graph is clustered — every pair lies INSIDE a
    * connected component by definition).
    *
    * Shape: label every candidate endpoint with its component id
    * ([[duplicateClusters]] — id-only pointer-jumping shuffles), then
    * `cogroup` the pairs and the token sets on the component key. Each
    * input crosses the network exactly once — pair ids (~16 B/pair) and
    * per-doc arrays (once per doc, not per pair) — and the per-component
    * verify streams the pairs against an in-memory id→set map of that
    * component only. A join-based spelling was tried first and rejected:
    * with `spark.sql.requireAllClusterKeysForCoPartition` (default true
    * since Spark 3.3) the subset-key partitioning reuse between the two
    * attach joins is conf-dependent, and a sort-merge second join would
    * external-sort the array-carrying intermediate (~the same 300 GB as
    * spill). `cogroup` guarantees the shape structurally: the plan
    * contains NO exchange whose rows carry both a pair id and a token
    * array (spec-asserted in JaccardRouteSpec).
    *
    * Memory/skew: the per-group map holds one component's sets
    * (|component| × |set| longs). Near-dup components are dup families —
    * small and bounded — and a pathological giant component degrades
    * parallelism/memory gracefully toward the direct shape's cost.
    * Output-identical to the direct verify (spec-pinned): same
    * two-pointer intersection, same int-then-double division.
    */
  private[graft] def clusterRoutedVerify(cand: DataFrame, toks: DataFrame,
                                         threshold: Double): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val endpoints = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
    val cm = duplicateClusters(cand, endpoints,
      maxRounds = 50, pairsMaterialized = true)
      .select(col("doc_id"), col("cluster_id").as("_cl"))
    val pairsByCl = cand
      .join(cm.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .select(col("_cl"), col("doc_a"), col("doc_b"))
      .as[(Long, Long, Long)].groupByKey(_._1)
    // docs outside any candidate pair drop here (inner join): nothing
    // to verify
    val toksByCl = toks.join(cm, "doc_id")
      .select(col("_cl"), col("doc_id"), col("toks"))
      .as[(Long, Long, Array[Long])].groupByKey(_._1)
    pairsByCl.cogroup(toksByCl) { (_, ps, ts) =>
      val sets = new java.util.HashMap[Long, Array[Long]]()
      ts.foreach { case (_, id, tk) => sets.put(id, tk) }
      ps.flatMap { case (_, a, b) =>
        val ta = sets.get(a); val tb = sets.get(b)
        if (ta == null || tb == null) Iterator.empty // unreachable: both endpoints are labeled
        else {
          val inter = intersectSorted(ta, tb)
          // int arithmetic then one double division — bit-identical to
          // the direct shape's cast(inter)/(na + nb − inter)
          val j = inter.toDouble / (ta.length + tb.length - inter).toDouble
          if (j >= threshold) Iterator.single((a, b, j)) else Iterator.empty
        }
      }
    }.toDF("doc_a", "doc_b", "jaccard")
  }

  /** Connected components of a near-duplicate pair graph: every document
    * labeled with the SMALLEST doc_id reachable through pairs — the
    * canonical-cluster assignment that turns pairwise near-dup output
    * (from [[jaccardPairs]] / [[minhashLshPairs]] /
    * [[simhashNearDupPairs]]) into dedup groups.
    *
    * Algorithm: iterative smallest-label propagation with pointer
    * jumping — each round every node takes the min of its own and its
    * neighbors' labels (one hash-join + min-aggregate, both map-side
    * combining), then shortcuts label := label(label) (one more hash
    * join; labels are node ids, so the lookup is total). The jump halves
    * the distance to each component's minimum every round, so the round
    * bound is O(log diameter) — a 10k-link chain converges in ~15
    * rounds, not 10k — at the price of a second corpus-sized join per
    * round (irrelevant for the tight clusters near-dup graphs produce,
    * decisive for adversarial chains; pinned in LlmOperatorsSpec's
    * path-graph test). The loop stops when no label changes. Labels are
    * `localCheckpoint`ed per round so the plan doesn't grow with the
    * iteration count; the driver holds only a change COUNT, never the
    * graph. Returns (doc_id, cluster_id), deterministic for any input
    * partitioning.
    *
    * Edge CONTRACTION (the r11 sf100 finding — CC was 817 s of the
    * ~1190 s jaccard run because every round re-streamed the full
    * 1.9B-row edge list): above `contractAboveEdges`, each round ends
    * by relabeling the edge list through the freshly propagated labels
    * and keeping only edges whose endpoints still differ. A label is
    * always the id of a node in the SAME component (propagation only
    * moves ids along edges), so edge (label(u), label(v)) connects
    * exactly the components (u, v) did — the quotient graph has the
    * same component structure — and every node stays linked to its
    * representative through the label pointer the jump keeps
    * resolving. Near-dup pair graphs are dup FAMILIES (the sf100
    * component histogram: median 2, p99 ≈ 2k, near-cliques from
    * prefix blocking), so one propagation round collapses almost every
    * edge to equal labels and the `la != lb` filter drops them
    * MAP-SIDE before the distinct's exchange: the full edge list is
    * streamed ~twice (round 1 + the first contraction) instead of
    * once per round, and rounds 2+ run over a vanishing remainder.
    * Output-identical for any threshold (spec-pinned: contraction
    * every round vs never on path/family graphs).
    */
  def duplicateClusters(pairs: DataFrame, docs: DataFrame,
                        maxRounds: Int = 50,
                        pairsMaterialized: Boolean = false,
                        contractAboveEdges: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val edges0 = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // When the caller's pairs frame is ALREADY materialized (the routed
    // jaccard verify hands in a localCheckpoint), re-checkpointing its
    // ×2 projection only doubles the block-store footprint (30 GB at
    // the sf100 probe, which tipped the box over) — the per-round scans
    // are narrow maps over the existing blocks. A lazy caller (a whole
    // operator pipeline) still gets the checkpoint so rounds don't
    // re-execute it.
    // lazy checkpoint: the edgeCount action right below materializes the
    // blocks in the SAME job (r17 — the eager form spent one extra
    // pair-scale pass; every per-round checkpoint below gets the same
    // treatment, halving the loop's driver actions)
    var edges = if (pairsMaterialized) edges0
      else edges0.localCheckpoint(false, StorageLevel.DISK_ONLY) // pair-scale (see jaccardPairs)
    // the checkpoint whose blocks back `edges`, when THIS call made it
    // (safe to unpersist after a contraction replaces it) — the
    // pairsMaterialized frame belongs to the caller
    var edgesCkpt: Option[DataFrame] = if (pairsMaterialized) None else Some(edges)
    // Each round leaves its join/aggregate shuffle files on local disk
    // until the ContextCleaner sees the dependency objects COLLECTED —
    // and a driver that never GCs mid-loop accumulates every round's
    // files (the r11 sf100 jaccard probe filled 58 GB of scratch inside
    // the CC loop this way). On corpus-sized graphs, nudge a full GC per
    // round so round N−1's shuffles are reclaimed while round N runs;
    // skipped on small graphs where a full GC would cost more than the
    // round.
    var edgeCount = edges.count()
    // Propagate over docs ∪ pair endpoints: a caller may pass pairs whose
    // nodes were filtered out of `docs`, and paths THROUGH such nodes
    // must still connect (only the output is restricted to docs).
    val nodes = docs.select(col("doc_id"))
      .unionByName(edges.select(col("src").as("doc_id"))).distinct()
    var labels = nodes.withColumn("label", col("doc_id"))
      .localCheckpoint(false) // materialized by the nNodes count below
    // The label table is NODE-sized while the edge list is PAIR-sized —
    // near-dup graphs run ~100+ edges per node, so joining them
    // sort-merge re-shuffles the edge list every round (the r11 sf100
    // probe: 1.9B edge rows × ~45 GB/round against 5M labels).
    // Broadcasting the labels streams the edges straight from their
    // checkpoint blocks: per-round shuffle drops to the map-side-combined
    // aggregate (≤ nodes rows per mapper). Nodes-bounded, so safe to
    // ~20M nodes (~300 MB broadcast); past that — a 10⁹-doc corpus on a
    // real cluster — the hint is dropped and the planner's shuffle join
    // spreads the edge exchange across executors instead.
    val nNodes = labels.count()
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (nNodes <= 20000000L) broadcast(df) else df
    // Labels only ever DECREASE (min of self + neighbors), so the exact
    // per-round label sum is equal iff no label changed — one aggregate
    // per round instead of a join + count. DECIMAL(38,0): exact at any
    // id magnitude × corpus size.
    // coalesce keeps the empty-graph case total (sum over zero rows is
    // null, and null.compareTo would NPE the convergence probe)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast(DecimalType(38, 0))),
        lit(0).cast(DecimalType(38, 0)))).first().getDecimal(0)
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    val ccTrace = sys.env.contains("GRAFT_CC_TRACE")
    while (!converged) {
      round += 1
      val t0 = if (ccTrace) System.nanoTime() else 0L
      require(round <= maxRounds, s"CC did not converge in $maxRounds rounds")
      // Round 1 is join-free (r12, the hash-to-min initialization): the
      // labels are still the identity (label(src) == src for every
      // node), so the broadcast-join lookup below would be an identity
      // map evaluated once per edge — on the 1.9B-row sf100 edge list
      // that probe-per-row plus the broadcast build was pure overhead.
      // Emitting the edge directly computes the same round-1
      // propagation min(self, neighbors); rounds 2+ need the real
      // label lookup.
      val fromNeighbors =
        if (round == 1)
          edges.select(col("dst").as("doc_id"), col("src").as("label"))
        else edges
          .join(maybeBroadcast(labels.withColumnRenamed("doc_id", "src")), "src")
          .select(col("dst").as("doc_id"), col("label"))
      val propagated = labels.unionByName(fromNeighbors)
        .groupBy("doc_id").agg(min("label").as("label"))
      // pointer jumping: label := label(label). Every label IS a node id
      // (initial labels are ids; min only selects among them), so the
      // left join always matches — coalesce only guards the in-flight
      // case where the mapping row lands in a later partition batch.
      // Labels stay monotone non-decreasing downward: label(label) ≤
      // label because every node's label ≤ its own id.
      val mapping = propagated
        .select(col("doc_id").as("map_src"), col("label").as("map_dst"))
      val next = propagated
        .join(maybeBroadcast(mapping), col("label") === col("map_src"), "left")
        .select(col("doc_id"),
          coalesce(col("map_dst"), col("label")).as("label"))
        .localCheckpoint(false) // materialized by the labelSum probe
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      labels.unpersist() // drop the previous round's checkpoint blocks
      labels = next
      prevSum = nextSum
      // Edge contraction (scaladoc above): relabel the edge list through
      // the new labels, keep only still-crossing edges. The la != lb
      // filter drops intra-family edges before the distinct's exchange,
      // so the contracted list materializes at quotient-graph size.
      val wasBig = edgeCount > 10000000L
      if (!converged && edgeCount > contractAboveEdges) {
        val la = next.select(col("doc_id").as("src"), col("label").as("la"))
        val lb = next.select(col("doc_id").as("dst"), col("label").as("lb"))
        val ck = edges
          .join(maybeBroadcast(la), "src")
          .join(maybeBroadcast(lb), "dst")
          .where(col("la") =!= col("lb"))
          .select(col("la").as("src"), col("lb").as("dst"))
          .distinct()
          // quotient-graph-sized but unbounded above — pair-scale on
          // the first contraction of a sparse graph, so disk-staged;
          // lazy: the edgeCount below materializes it
          .localCheckpoint(false, StorageLevel.DISK_ONLY)
        edgesCkpt.foreach(_.unpersist())
        // fresh attribute lineage over the checkpointed blocks: the
        // contracted list derives from `next`, and NEXT round joins it
        // back against the same label table — shared expression ids
        // across the propagation union's children trip Catalyst's
        // constraint rewrite (NoSuchElementException in
        // UnionBase.rewriteConstraints). Quotient-graph-sized, so the
        // Row round-trip is noise.
        edges = ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
        edgesCkpt = Some(ck)
        edgeCount = edges.count()
      }
      if (wasBig) System.gc() // release the round's shuffle files (see above)
      if (ccTrace) System.err.println(
        f"[cc] round $round: ${(System.nanoTime() - t0) / 1e9}%.2f s, edges=$edgeCount converged=$converged")
    }
    labels.join(docs.select("doc_id").distinct(), "doc_id")
      .select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** Deterministic 64-bit token hash for permutation `i` (seeded affine
    * scramble over a murmur-ish base — stable across JVMs/executors). */
  private def tokenHash(i: Int, token: String): Long = {
    // sign-extended code-point ×31 fold (PortableHash.cp31), NOT
    // String.hashCode: the DuckDB oracles fold unicode(c), and the two
    // only agree beyond the BMP if the JVM side folds code points too
    var h = graft.functions.PortableHash.cp31(token).toLong ^
      (0x9e3779b97f4a7c15L * (i + 1))
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** MinHash signature of a token set: `numPerm` minima. */
  def minhashSignature(toks: Seq[String], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    toks.foreach { t =>
      var i = 0
      while (i < numPerm) {
        val h = tokenHash(i, t)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * b bands × r rows (numPerm = b·r) — a pair lands in the same bucket of
    * some band with probability 1-(1-J^r)^b (≈0.99+ for J ≥ 0.5 at
    * b=16, r=4). Candidates are generated ONLY within band buckets
    * (groupBy band+bucket), then verified with exact word-set Jaccard, so
    * the expensive comparison runs on a vanishing fraction of pairs.
    *
    * Shuffle discipline (the r9 sf10 lesson): dedup, the signature-
    * agreement gate, and the exact verify ALL run inside the bucket-join
    * stage, on rows that already carry the signature, the band-hash
    * array, and the sorted token-hash set. The per-doc payload is
    * ~(numPerm + bands + |tokens|) longs through ONE bucket exchange
    * (reused for both join sides); nothing else shuffles. The previous
    * formulation materialized the candidate ids (457M rows at sf10),
    * `distinct()`ed them, then re-attached signatures and token sets
    * with four corpus-wide joins — the second of which shipped a
    * signature array per CANDIDATE (~240 GB at sf10) and measured 38×
    * for 10× data. Pair dedup is now the canonical-occurrence filter:
    * a pair is evaluated only in its FIRST shared band
    * ([[graft.plans.FirstEqualIndex]]), which is exact dedup without a
    * shuffle.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double,
                      bands: Int = 16, rows: Int = 4): DataFrame =
    minhashStages(docs, threshold, bands, rows).verified

  /** The [[minhashLshPairs]] pipeline with its stage frames exposed —
    * the production query is `verified`; the earlier frames exist so a
    * probe (tools/ProbeMinhash) can time/count each stage with the
    * exact production payload and predicates instead of a drifting
    * re-derivation. Constructing this EAGERLY computes the signature
    * stage (the localCheckpoint), same as the fused operator. */
  private[graft] case class MinhashStages(
      sigs: DataFrame,        // checkpointed (doc_id, sig, htoks, bhs)
      candidates: DataFrame,  // canonical-occurrence pairs + payload
      gated: DataFrame,       // + signature-agreement estimate gate
      verified: DataFrame)    // + exact Jaccard ≥ threshold (production)

  private[graft] def minhashStages(docs: DataFrame, threshold: Double,
      bands: Int, rows: Int, boundedVerify: Boolean = true): MinhashStages = {
    val numPerm = bands * rows
    val sigUdf = udf { (toks: Seq[String]) => minhashSignature(toks, numPerm) }
    val bandHashUdf = udf { (sig: Seq[Long]) =>
      (0 until bands).map { bd =>
        var h = 1125899906842597L
        var j = bd * rows
        while (j < (bd + 1) * rows) { h = h * 31 + sig(j); j += 1 }
        bd.toLong << 56 | (h & 0xffffffffffffL)
      }
    }
    // ONE tokenize pass over the corpus: a single projection computes
    // every derived representation — the numPerm-long minhash signature
    // (the estimate gate), the bands-long band-hash array (bucketing +
    // canonical-occurrence dedup), and the sorted 64-bit token-hash set
    // (exact verify; intersection on graft_tok64 hashes ≡ on strings up
    // to 2⁻⁶⁴-scale collisions, property-tested vs the string answer) —
    // from one tokenSet evaluation, then localCheckpoints (the
    // duplicateClusters/semDedup precedent). The signature UDF (numPerm
    // hashes per token, the heaviest per-row step) runs exactly once.
    // Minhash minima are order-independent, so the unsorted distinct
    // set feeds the UDF directly.
    // Par.floor: the signature pass AND the band join's probe side run
    // at the checkpoint's partition count — a single-file corpus scan
    // would serialize both on one core (r17: 9.7 → 1.3 s at sf0.1).
    val sigs = Par.floor(docs)
      .select(col("doc_id"), TextAnalysis.tokenSet(col("text")).as("_ts"))
      .select(col("doc_id"),
        sigUdf(col("_ts")).as("sig"),
        array_sort(transform(col("_ts"),
          t => graft.plans.Tok64Hash.tok64Col(docs.sparkSession, t)))
          .as("htoks"))
      .withColumn("bhs", bandHashUdf(col("sig")))
      .localCheckpoint()

    val brows = sigs.select(col("doc_id"), col("sig"), col("htoks"),
      col("bhs"), explode(col("bhs")).as("bucket"))
    // native codegen'd in-stage predicates (the zip_with/aggregate HOF
    // forms are CodegenFallback: interpreted lambdas + an intermediate
    // array per pair, and these run on every in-bucket occurrence)
    val firstShared = graft.plans.FirstEqualIndex
      .firstEqualIndexCol(docs.sparkSession, col("x.bhs"), col("y.bhs"))
    val estMatches = graft.plans.CountEqual
      .countEqualCol(docs.sparkSession, col("x.sig"), col("y.sig"))
    // verify kernel: the threshold-bounded merge aborts a pair the
    // moment `matched + min(remaining)` can no longer reach the minimal
    // passing intersection (which also kills size-mismatched pairs at
    // step 0, before a single comparison). It returns -1 for provably-
    // failing pairs, whose jaccard then computes negative and fails the
    // SAME `>= threshold` filter — the emitted row set is identical to
    // the plain kernel's (property-pinned in LlmOperatorsSpec; r13
    // sf100 A/B in BASELINE.md). `boundedVerify = false` keeps the
    // plain kernel reachable for that A/B (ProbeMinhash `verify`).
    val inter =
      if (boundedVerify) graft.plans.SortedIntersectBounded
        .boundedCol(docs.sparkSession, col("x.htoks"), col("y.htoks"),
          lit(threshold))
      else graft.plans.SortedIntersectSize
        .intersectSizeCol(docs.sparkSession, col("x.htoks"), col("y.htoks"))
    val candidates = brows.as("x").join(brows.as("y"), Seq("bucket"))
      .where(col("x.doc_id") < col("y.doc_id"))
      // canonical occurrence: a pair is in every shared band's bucket;
      // keep only its FIRST shared band, so each unique pair is
      // evaluated exactly once — dedup with ~bands compares, no shuffle
      .where(shiftright(col("bucket"), 56).cast("int") === firstShared)
    // signature-agreement estimate (matching components / numPerm, an
    // unbiased J estimator) prunes pairs well below the threshold
    // before the exact token-set intersection runs. The slack (0.15)
    // keeps estimator variance from dropping true pairs
    // (property-tested in LlmOperatorsSpec); the final filter is
    // EXACT Jaccard, so precision is unaffected.
    val gated = candidates
      .where(estMatches >= lit(math.max(0.0, threshold - 0.15) * numPerm))
    val verified = gated
      .withColumn("inter", inter)
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("x.htoks")) + size(col("y.htoks")) - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("jaccard"))
    MinhashStages(sigs, candidates, gated, verified)
  }

  /** 64-bit SimHash over the word set (unweighted votes). */
  def simhash64(toks: Seq[String]): Long = {
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h = tokenHash(0, t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val simhashUdf = udf { (toks: Seq[String]) => simhash64(toks) }

  /** Per-document SimHash signatures + a 16-bit prefix bucket (the
    * blocking key a near-dup pass would shuffle on). */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        simhashUdf(TextAnalysis.tokenSet(col("text"))).as("simhash"))
      .withColumn("bucket", shiftrightunsigned(col("simhash"), 48).cast("int"))

  /** SimHash near-duplicate pairs with Hamming distance ≤ maxHamming.
    *
    * Blocking is pigeonhole-exact for maxHamming ≤ 3: the 64-bit
    * signature splits into 4 disjoint 16-bit chunks, and any pair
    * within ≤ 3 differing bits must agree EXACTLY on at least one
    * chunk — so the candidate join on (chunk index, chunk value) loses
    * no true pair, and the verify step is a codegen'd
    * bit_count(a XOR b). Same shuffle shape as MinHash banding: equi-
    * join on the chunk key, never a cross product.
    */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking is only exact for maxHamming <= 3")
    // Par.floor: the simhash UDF and the chunk join's probe side
    // otherwise run at the corpus scan's partition count (see Par)
    val sigs = Par.floor(docs).select(col("doc_id"),
      simhashUdf(TextAnalysis.tokenSet(col("text"))).as("simhash"))
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { i =>
        struct(lit(i).as("chunk_idx"),
          shiftrightunsigned(col("simhash"), i * 16)
            .bitwiseAND(lit(0xffffL)).as("chunk_val"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk_val").as("chunk_val"))
    val x = chunks.select(col("doc_id").as("doc_a"),
      col("simhash").as("sim_a"), col("chunk_idx"), col("chunk_val"))
    val y = chunks.select(col("doc_id").as("doc_b"),
      col("simhash").as("sim_b"), col("chunk_idx"), col("chunk_val"))
    // The hamming verify runs INSIDE the bucket-join stage, before the
    // pair-dedup distinct (the minhash-LSH precedent): bit_count(xor) is
    // one codegen'd instruction pair, so evaluating it on every candidate
    // costs nothing, while distinct is a full shuffle of its input — and
    // candidates outnumber true pairs ~9x (sf10 measured 274.7M
    // candidates vs 29.1M true pairs), so filtering first cuts the
    // operator's one big exchange by that factor. A pair near on ≥ 2
    // chunks duplicates into ≥ 2 buckets, but both copies pass the same
    // verdict, so distinct-after-verify loses nothing.
    x.join(y, Seq("chunk_idx", "chunk_val"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming").distinct()
  }
}
