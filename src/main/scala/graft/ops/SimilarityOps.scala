package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against a full scan of the corpus; one narrow stage, no corpus shuffle.
  *
  * Scale path: LSH via signed random projections (deterministic hyperplanes
  * derived from xxhash64, no RNG) — candidates only where bucket signatures
  * collide, turning 100 TB × q into per-bucket joins.
  */
object SimilarityOps {

  /** dot(a,b) via zip_with + aggregate (codegen'd higher-order fns). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Integer-quantized cosine: embeddings scaled by 1000 and truncated to
    * longs before the dot product. Exact integer arithmetic ⇒ bit-identical
    * ranking across engines (used by the DuckDB oracle checks).
    */
  def quantize(a: Column, scale: Int = 1000): Column =
    transform(a, x => floor(x.cast("double") * scale).cast("long"))

  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Brute-force top-k cosine neighbors for each query row.
    * `queries` and `corpus` both carry (idCol, vecCol); queries must be small
    * (it is broadcast). Self-matches excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Quantized vectors and their norms are computed per ROW on each join
    // side (N + Q evaluations), never per PAIR (N×Q) — only the cross dot
    // product runs inside the join.
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qv"))
      .select(col("query_id"), col("qv"), dotQ(col("qv"), col("qv")).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("cv"))
      .select(col("neighbor_id"), col("cv"), dotQ(col("cv"), col("cv")).as("cn"))
    val sim = dotQ(col("qv"), col("cv")).cast("double") /
      (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(sim, 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Deterministic random-hyperplane LSH signature: bit i = sign of
    * dot(v, h_i) where h_i[d] = signed hash of (i, d) — reproducible
    * without materializing hyperplanes.
    */
  def withLshBucket(df: DataFrame, bits: Int = 16,
                    vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val sig = (0 until bits).map { i =>
      // h_i[d] in {-1,+1} from xxhash64(i, d): cheap simhash-style projection.
      // transform's (element, index) lambda — the earlier zip_with(v,
      // sequence(0, size-1)) form allocated an index array per row PER BIT.
      val proj = aggregate(
        transform(v, (x, d) =>
          when(shiftright(xxhash64(lit(i), d), 1).bitwiseAND(lit(1L)) === 1L, x)
            .otherwise(-x)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    df.withColumn("lsh_bucket", sig)
  }

  /** IVF (inverted-file) ANN — the other classic scale path: a coarse
    * quantizer of `nlist` centroids partitions the corpus into lists; a
    * query searches only its `nprobe` nearest lists.
    *
    * Spark-first + deterministic: seed centroids are a hash-ordered sample
    * (no RNG), refined by ONE Lloyd iteration (assign = broadcast-join
    * argmin, recompute = groupBy mean via element-wise array aggregation).
    * Index build is the n×nlist assignment join — the planned, amortized
    * cost; queries pay nprobe/nlist of a full scan.
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   lloydIters: Int = 1): DataFrame = {
    val seeds = corpus
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("c"))
      .withColumn("__r", xxhash64(col(idCol)))
      .orderBy("__r").limit(nlist)
      .select(row_number().over(Window.orderBy("__r")).as("list_id"), col("c"))
    // Lloyd refinement(s): assign every vector to its nearest centroid, then
    // the new centroid is the element-wise mean of its members. Means are
    // computed per (list, dimension-position) via posexplode — the agg
    // buffer is bounded by the DIMENSION, never by list membership (a
    // collect_list of member vectors would buffer a whole list in one
    // aggregation buffer at scale). Each iteration is one assignment join +
    // one mean pass; within-cluster SSE is non-increasing per Lloyd's
    // guarantee (property-tested), so iters trade index-build passes for
    // tighter lists. Intermediate centroid frames are tiny (nlist rows) —
    // persisted per round so the next assignment doesn't recompute the chain.
    (1 to lloydIters).foldLeft(seeds) { (cents, _) =>
      val c = cents.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val next = assignToNearest(corpus, c, idCol, vecCol)
        .select(col("list_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("list_id", "pos").agg(avg(col("x")).as("m"))
        .groupBy("list_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          t => t.getField("m")).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count()
      c.unpersist(blocking = false)
      next
    }
  }

  /** (id, v, list_id): nearest centroid per vector.
    *
    * The centroid set is nlist rows by construction — driver-bounded like
    * every KMeans implementation — so it is collected and inlined as
    * LITERAL arrays (r7): the assignment becomes a pure projection
    * (distance-to-each-literal + `least` over (d, list_id) structs) with no
    * crossJoin, no per-vector window, no shuffle, no sort. The struct
    * `least` is lexicographic, so ties on distance break to the lowest
    * list_id — exactly the old window's ORDER BY (__d, list_id) row 1.
    */
  def assignToNearest(vectors: DataFrame, centroids: DataFrame,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids.select(col("list_id"), col("c")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val v = vectors.select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
    val candidates = cents.map { case (lid, cvec) =>
      struct(
        aggregate(zip_with(col("v"), array(cvec.map(lit): _*),
          (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x).as("d"),
        lit(lid).as("list_id"))
    }
    val best =
      if (candidates.length == 1) candidates.head
      else least(candidates.toIndexedSeq: _*)
    v.select(col(idCol), col("v"), best.getField("list_id").as("list_id"))
  }

  /** IVF search: probe the `nprobe` nearest lists per query, exact cosine
    * inside them, top-k. Returns (query_id, neighbor_id, rank, sim).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
              nprobe: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding", lloydIters: Int = 1): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol, lloydIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // similarity uses the same integer-quantized dot as bruteForceTopK, so
    // near-tie rankings agree bit-for-bit across the two search paths
    val lists = assignToNearest(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"),
        transform(col("v"), x => floor(x * 1000).cast("long")).as("cv"),
        col("list_id"))
      .withColumn("cn", dotQ(col("cv"), col("cv")))
    val qv = queries.select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
    val qProbes = qv.crossJoin(broadcast(cents))
      .withColumn("__d",
        aggregate(zip_with(col("v"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0.0d), (acc, x) => acc + x))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col("__d"), col("list_id"))))
      .where(col("__rn") <= nprobe)
      .select(col(idCol).as("query_id"),
        transform(col("v"), x => floor(x * 1000).cast("long")).as("qv"),
        col("list_id"))
      .withColumn("qn", dotQ(col("qv"), col("qv")))
    val sim = dotQ(col("qv"), col("cv")).cast("double") /
      (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), col("neighbor_id"))
    val out = broadcast(qProbes).join(lists, Seq("list_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(sim, 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // eager: the top-k result is (queries×k)-bounded —
    cents.unpersist(blocking = false) // free the centroid cache now
    out
  }

  /** Embedding-cosine near-duplicate PAIRS (the fifth dedup modality next to
    * exact / MinHash-LSH / SimHash / n-gram Jaccard): all (a, b) with
    * quantized cosine ≥ threshold, found via random-hyperplane LSH buckets —
    * exact cosine runs only inside colliding buckets, so the corpus is never
    * self-joined. For true near-duplicates (cosine → 1) the two signatures
    * agree on every hyperplane with probability (1 − θ/π)^bits → 1, and a
    * positively-scaled copy lands in the SAME bucket deterministically (every
    * projection keeps its sign), which is what makes the planted-pair oracle
    * a hard recall gate. `multiProbe` widens each row's buckets by Hamming-1
    * flips for boundary vectors; the hot-bucket cap bounds degenerate
    * clusters exactly as in [[lshTopK]].
    */
  def cosineNearDuplicates(corpus: DataFrame, threshold: Double,
                           bits: Int = 12, idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           multiProbe: Int = 0,
                           maxBucket: Int = 100000): DataFrame = {
    val probes = array((lit(0L) +:
      (0 until math.min(multiProbe, bits)).map(i => lit(1L << i))): _*)
    // Spread the per-row bucket computation (bits x dim hash evaluations)
    // before it runs: the corpus scan's split count (often 1-2 row groups)
    // would otherwise confine it to as many tasks.
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val sigs = withLshBucket(corpus.repartition(par, col(idCol)), bits, vecCol)
      .select(col(idCol), quantize(col(vecCol)).as("qv"), col("lsh_bucket"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("lsh_bucket").orderBy(xxhash64(col(idCol)))))
      .where(col("__rn") <= maxBucket).drop("__rn")
      .withColumn("qn", dotQ(col("qv"), col("qv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = sigs.select(col(idCol).as("a_id"), col("qv").as("va"),
      col("qn").as("na"),
      explode(transform(probes, m => col("lsh_bucket").bitwiseXOR(m))).as("lsh_bucket"))
    val r = sigs.select(col(idCol).as("b_id"), col("qv").as("vb"),
      col("qn").as("nb"), col("lsh_bucket"))
    val sim = dotQ(col("va"), col("vb")).cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
    val out = l.join(r, Seq("lsh_bucket"))
      .where(col("a_id") < col("b_id"))
      .withColumn("sim", round(sim, 6))
      .where(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
      .distinct() // a pair can collide on several probe buckets
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // eager: free the corpus-sized signature cache now
    sigs.unpersist(blocking = false)
    out
  }

  /** Bucketed ANN: exact cosine only within colliding LSH buckets, then
    * top-k — the 100 TB plan (per-bucket joins instead of a cross product).
    *
    * Recall + skew armor over the naive single-probe form:
    *  - **Multi-probe**: each query also probes the `multiProbe` buckets at
    *    Hamming distance 1 from its own (flip one projection bit) — the
    *    standard trick that recovers most of the recall a near-boundary
    *    vector loses, for probes× more lookups instead of 2^bits× more
    *    tables.
    *  - **Hot-bucket cap**: a degenerate bucket (all-zeros vectors, spam
    *    clusters) is truncated to `maxBucket` corpus rows chosen by a
    *    deterministic hash order — bounding any single bucket join.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding",
              multiProbe: Int = 4, maxBucket: Int = 100000): DataFrame = {
    val probes = array((lit(0L) +:
      (0 until math.min(multiProbe, bits)).map(i => lit(1L << i))): _*)
    val qb = withLshBucket(queries, bits, vecCol)
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"), col("lsh_bucket"))
      .select(col("query_id"), col("qv"),
        explode(transform(probes, m => col("lsh_bucket").bitwiseXOR(m))).as("lsh_bucket"))
      .select(col("query_id"), col("qv"), col("lsh_bucket"),
        dotQ(col("qv"), col("qv")).as("qn"))
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val cb = withLshBucket(corpus.repartition(par, col(idCol)), bits, vecCol)
      .select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"), col("lsh_bucket"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("lsh_bucket").orderBy(xxhash64(col("neighbor_id")))))
      .where(col("__rn") <= maxBucket).drop("__rn")
      .select(col("neighbor_id"), col("cv"), col("lsh_bucket"),
        dotQ(col("cv"), col("cv")).as("cn"))
    val sim = dotQ(col("qv"), col("cv")).cast("double") /
      (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), col("neighbor_id"))
    broadcast(qb).join(cb, Seq("lsh_bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      // a neighbor can collide on several probes — one candidate row each
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(sim, 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
