package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the usual ANN playbook:
  *  - [[exactTopK]] — brute-force cosine against a SMALL broadcast query
  *    set. O(queries × corpus) but one scan, no shuffle of the corpus,
  *    ranking via a per-query window. The correctness baseline.
  *  - [[annTopK]] — random-hyperplane LSH: each vector hashes into one
  *    bucket per table (nt tables × nb bits); queries join candidates on
  *    (table, bucket), so the corpus is only compared inside matching
  *    buckets. The 100 TB path: bucket join is an equi-join Catalyst
  *    shuffles on the bucket key; per-bucket candidate lists stay small.
  *
  * All arithmetic in double (cast from float once) — deterministic and
  * identical to the DuckDB oracle's double evaluation.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays, composed from
    * built-in higher-order functions. Session-free but interpreted
    * (HOFs are CodegenFallback) — the hot paths below use the native
    * codegen'd [[graft.plans.DotProduct]] instead, which accumulates in
    * the identical left-to-right order (bit-equal results). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k: for every vector with `vec_id < nQueries`, the k
    * nearest among the rest. Returns (query_id, rank, neighbor_id).
    *
    * Norms are materialized once per side BEFORE the join — recomputing
    * sqrt(dot(v,v)) per candidate pair would multiply the dominant cost
    * by (k+2)/3. Numerically identical (same doubles, computed once).
    */
  def exactTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val ndot = graft.plans.DotProduct.dotCol(emb.sparkSession, _: Column, _: Column)
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("nrm", sqrt(ndot(col("vec"), col("vec"))))
    val q = v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("nrm").as("qnrm"))
    val c = v.where(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("vec").as("cvec"),
        col("nrm").as("cnrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    c.crossJoin(broadcast(q))
      .withColumn("cos",
        ndot(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** Deterministic pseudo-random hyperplanes: nt tables × nb bits, dim
    * components each, from a fixed-seed LCG (no RNG state — stable across
    * runs/executors). */
  def hyperplanes(nt: Int, nb: Int, dim: Int): Array[Array[Array[Double]]] = {
    var state = 0x5deece66dL
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(nt, nb, dim)(next())
  }

  /** LSH bucket ids (one per table) for a double vector. */
  def bucketIds(planes: Array[Array[Array[Double]]])(vec: Seq[Double]): Seq[Long] =
    planes.indices.map { t =>
      var bucket = 0L
      var b = 0
      while (b < planes(t).length) {
        val p = planes(t)(b)
        var s = 0.0
        var i = 0
        while (i < p.length && i < vec.length) { s += p(i) * vec(i); i += 1 }
        if (s > 0) bucket |= (1L << b)
        b += 1
      }
      (t.toLong << 32) | bucket
    }

  /** Approximate cosine top-k via random-hyperplane LSH. Same output shape
    * as [[exactTopK]]; recall < 1 by construction (verified ≥ threshold in
    * tests against the exact baseline).
    */
  def annTopK(emb: DataFrame, nQueries: Int, k: Int,
              tables: Int = 8, bits: Int = 8): DataFrame = {
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val planes = hyperplanes(tables, bits, dim)
    val bucketUdf = udf { (vec: Seq[Double]) => bucketIds(planes)(vec) }

    val ndot = graft.plans.DotProduct.dotCol(emb.sparkSession, _: Column, _: Column)
    val v0 = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("nrm", sqrt(ndot(col("vec"), col("vec"))))
    val v = v0.withColumn("bucket", explode(bucketUdf(col("vec"))))
    val q = v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("bucket"))
    val c = v.where(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    // candidate DEDUP runs on the id pair only — distinct over the full
    // vectors would shuffle every embedding once per colliding bucket;
    // vectors re-attach afterwards by id from the PRE-explosion frame
    // (one copy per vector, no distinct needed; q side is small ⇒
    // broadcast).
    val candidateIds = q.join(c, Seq("bucket"))
      .select("query_id", "neighbor_id").distinct()
    candidateIds
      .join(v0.select(col("vec_id").as("neighbor_id"),
        col("vec").as("cvec"), col("nrm").as("cnrm")), Seq("neighbor_id"))
      .join(broadcast(v0.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"),
          col("vec").as("qvec"), col("nrm").as("qnrm"))), Seq("query_id"))
      .withColumn("cos",
        ndot(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** IVF (inverted-file) approximate top-k: k-means coarse quantizer,
    * each vector assigned to its nearest centroid's list; a query probes
    * only the `nProbe` closest lists. The classic ANN scale path when an
    * LSH bucket key is too coarse: list sizes are balanced by clustering,
    * and the probe set is an equi-join on the list id. Deterministic via
    * fixed KMeans seed.
    */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    val ndot = graft.plans.DotProduct.dotCol(spark, _: Column, _: Column)

    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("nrm", sqrt(ndot(col("vec"), col("vec"))))
    val feats = v.withColumn("features", array_to_vector(col("vec")))
    // The quantizer fit is the only full-data iteration here: maxIter
    // KMeans passes over everything to train nLists centroids. A coarse
    // quantizer is statistically saturated by a few thousand points, so
    // fit on a deterministic seeded sample capped near `maxFitRows` —
    // one cheap count pass replaces maxIter full-corpus passes (the
    // difference between a metadata-scale and a 100 TB-scale job).
    val maxFitRows = 4096L
    val n = feats.count()
    val fitData =
      if (n <= maxFitRows) feats
      else feats.sample(withReplacement = false,
        maxFitRows.toDouble / n, seed = 7L)
    val model = new KMeans().setK(nLists).setSeed(7L).setMaxIter(10)
      .fit(fitData)
    val assigned = model.transform(feats)
      .select(col("vec_id"), col("vec"), col("nrm"),
        col("prediction").as("list_id"))

    // nProbe nearest centroid lists per query (centroids are tiny —
    // ranked driver-side-free via a literal array crossJoin).
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray.toSeq)
    }.toSeq
    val centDf = spark.createDataFrame(centroids).toDF("list_id", "cvec_center")
      .withColumn("cvec_center", col("cvec_center").cast("array<double>"))
    val q = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("nrm").as("qnrm"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(desc("center_dot"), asc("list_id"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("center_dot", ndot(col("qvec"), col("cvec_center")))
      .withColumn("probe_rank", row_number().over(probeW))
      .where(col("probe_rank") <= nProbe)
      .select("query_id", "qvec", "qnrm", "list_id")

    val cand = assigned.where(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("vec").as("cvec"),
        col("nrm").as("cnrm"), col("list_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(probes).join(cand, Seq("list_id"))
      .withColumn("cos",
        ndot(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max |component|, q_i = floor(v_i / scale · 127 + 0.5) ∈
    * [-127, 127] — the 4× storage/bandwidth reduction step for an
    * embedding table at corpus scale. Pure column expressions (no UDF,
    * codegen'd); `floor(x + 0.5)` instead of ROUND because both engines
    * evaluate it identically on doubles (ROUND half-even/half-up
    * differences are the repo's known parity hazard). Dequantized error
    * is bounded by scale/254 per component (QuantizeSpec). */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val vec = asDouble(col("embedding"))
    val scale = greatest(array_max(transform(vec, x => abs(x))), lit(1e-30))
    emb.select(col("vec_id"),
      scale.as("scale"),
      transform(vec, x => floor(x / scale * 127 + lit(0.5)).cast("int"))
        .as("qvec"))
  }

  /** Per-label centroids — the distributed mean-vector step of k-means /
    * IVF training and of class-prototype computation, shaped for corpus
    * scale: posexplode to (label, pos, v) and aggregate per (label, pos)
    * with map-side partial aggregation — one shuffle whose key
    * cardinality is labels × dims, never a per-group collect.
    *
    * Exact cross-engine determinism: a double SUM is accumulation-order-
    * dependent, so each component is integerized FIRST with
    * `floor(v·1e8 + 0.5)` (both engines evaluate this identically on
    * doubles — the quantizeInt8 parity trick), summed exactly as
    * DECIMAL(38,0), and the mean is reconstructed with a fixed
    * division order. Returns (label, pos, centroid, n_vecs) — scalar
    * rows, not an array column, so any engine can sort/hash the output.
    */
  def centroidsByLabel(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    emb.select(col("label"),
        posexplode(asDouble(col("embedding"))).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(floor(col("v") * lit(1e8) + lit(0.5))
          .cast(DecimalType(38, 0))).as("s"),
        count(lit(1)).as("n_vecs"))
      .select(col("label"), col("pos"),
        (col("s").cast("double") / col("n_vecs") / lit(1e8)).as("centroid"),
        col("n_vecs"))
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold), blocked on
    * equal `label` — the deterministic blocking key that keeps this off
    * the full cross product (the LSH buckets of [[annTopK]] serve the
    * same role when no label exists). Returns (vec_a, vec_b, cos6).
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val ndot = graft.plans.DotProduct.dotCol(emb.sparkSession, _: Column, _: Column)
    val v = emb.select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("vec"))
      .withColumn("nrm", sqrt(ndot(col("vec"), col("vec"))))
    val a = v.select(col("vec_id").as("vec_a"), col("label"),
      col("vec").as("va"), col("nrm").as("nrm_a"))
    val b = v.select(col("vec_id").as("vec_b"), col("label"),
      col("vec").as("vb"), col("nrm").as("nrm_b"))
    a.join(b, Seq("label"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos6",
        round(ndot(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")), 6))
      .where(col("cos6") >= threshold)
      .select("vec_a", "vec_b", "cos6")
  }
}
