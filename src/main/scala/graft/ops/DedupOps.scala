package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for training-data curation, scale-first:
  *
  *  - exact: one hash-aggregate (map-side combine, one shuffle on the
  *    fingerprint — never on the raw text).
  *  - MinHash + LSH: shingle → k minhashes → b bands; candidate pairs come
  *    from a self-equi-join on (band, bandHash), which Spark executes as a
  *    shuffle hash join on a SMALL projected table (doc_id + band hash), not
  *    on documents. This is the O(n²)→O(candidates) cut that survives 100 TB.
  *  - SimHash: 64-bit majority-vote signature; near-dups = identical
  *    signature (or banded Hamming buckets).
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  *
  * All signatures are deterministic functions of the text (xxhash64 seeded by
  * constant tags) — replay-stable, no RNG state.
  */
object DedupOps {

  /** Exact dedup: keep the min-id row per identical text. Partitioned by a
    * 128-bit (xxhash64, md5) fingerprint pair, not xxhash64 alone: at 10^10
    * docs a 64-bit collision is expected (birthday ~4×10^9) and would delete
    * a DISTINCT document; the pair pushes the bound past 2^95. The shuffle
    * still carries hashes, never the text as a key.
    */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Null-text rows are NOT duplicates of one another: xxhash64(null)
    // collapses to the seed and md5(null) to null, which would funnel every
    // null-text row into ONE window partition and delete all but the min-id
    // row (the same hazard flagBoilerplate guards against). Adding the id to
    // the partition key when text is null makes each such row its own
    // singleton group — passed through unchanged, and no skewed partition
    // holding all nulls either.
    val nullKey = when(col(textCol).isNull, col(idCol))
    val w = Window.partitionBy(xxhash64(col(textCol)), md5(col(textCol)), nullKey)
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: k independent permutations simulated by
    * xxhash64(shingle, seed_i); signature[i] = min over shingles.
    * ONE aggregate pass over the shingle array (k mins folded together) —
    * never k separate scans: Catalyst inlines repeated expressions, so the
    * naive `array((0 until k).map(i => array_min(...)))` form recomputes the
    * shingling k times (measured 30×+ slowdown).
    */
  def minHashSignatures(df: DataFrame, idCol: String = "doc_id", k: Int = 32,
                        shingleWidth: Int = 3, textCol: String = "text"): DataFrame = {
    // explode → hash-aggregate with k small `min` expressions. The earlier
    // single-pass `aggregate(shingles, zip_with(...))` fold computed the same
    // values but generated one enormous Janino method — ~15 s of compile time
    // before the first row moved. k scalar mins keep every codegen unit tiny
    // AND give map-side partial aggregation: the shuffle carries one
    // (id, k longs) row per doc per partition, never the shingles.
    // Repartition by id BEFORE the heavy projection: the per-doc cost here
    // (shingling + k hashes per shingle) dwarfs one shuffle of the text, and
    // without it the compute inherits the scan's split count — a small input
    // file would confine 32 cores' worth of hashing to 2 tasks. The count is
    // explicit because AQE coalesces column-only repartitions of small
    // inputs right back to one task.
    minHashFromShingles(shingleFrame(df, idCol, textCol, shingleWidth), idCol, k)
  }

  /** (id, sh): per-doc distinct shingle-hash array, spread over
    * `defaultParallelism` tasks. Repartition by id BEFORE the heavy
    * projection: the per-doc cost (tokenize + shingle + hash) dwarfs one
    * shuffle of the text, and without it the compute inherits the scan's
    * split count — a small input file would confine 32 cores' worth of
    * hashing to 2 tasks. Tokens are materialized in their OWN projection
    * (TextOps.shinglesFromTokens perf contract): inlined, the lambda
    * re-runs the regex split once per shingle window.
    */
  private[ops] def shingleFrame(df: DataFrame, idCol: String, textCol: String,
                                shingleWidth: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol), col(textCol)).repartition(par, col(idCol))
      .select(col(idCol), TextOps.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol),
        TextOps.shinglesFromTokens(col("__toks"), shingleWidth).as("sh"))
  }

  /** MinHash signatures from a (id, sh) shingle frame. The frame is
    * id-partitioned already, so the explode → k-min hash-aggregate runs
    * WITHOUT an exchange (grouping key == partitioning key).
    */
  private[ops] def minHashFromShingles(shing: DataFrame, idCol: String,
                                       k: Int): DataFrame = {
    // explode_outer + an explicit not-null filter ≡ explode row-for-row, but
    // WITHOUT the optimizer's InferFiltersFromGenerate: that rule synthesizes
    // `size(sh)>0 AND isnotnull(sh)` whose full shingle expression (tokens
    // re-inlined — the quadratic CodegenFallback form) gets pushed below the
    // repartition onto the scan's 1-2 tasks (measured: a 2-task stage burning
    // more CPU than the whole aggregation). The filter on the GENERATED
    // attribute cannot be pushed below the generator.
    val ex = shing.select(col(idCol), explode_outer(col("sh")).as("__s"))
      .where(col("__s").isNotNull)
    val mins = (0 until k).map(i => min(xxhash64(col("__s"), lit(i))).as(s"__m$i"))
    ex.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"__m$i")): _*).as("minhash"))
  }

  /** Full frame + minhash (one extra join — prefer [[minHashSignatures]]). */
  def withMinHash(df: DataFrame, k: Int = 32, shingleWidth: Int = 3,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.join(minHashSignatures(df, idCol, k, shingleWidth, textCol), Seq(idCol))

  /** LSH candidate pairs: b bands of r rows (k = b*r); docs sharing any
    * band-hash are candidates. Returns (a_id, b_id) with a_id < b_id,
    * deduplicated across bands.
    *
    * Scale armor (dup-dense corpora make naive banding go ~n²):
    *  1. **Identical-signature pre-grouping** — docs with byte-equal
    *     signatures collapse to one representative through the band join;
    *     member pairs are re-expanded afterwards (candidacy is exactly
    *     preserved: a member shares every band with its representative).
    *  2. **Band-bucket cap** — a bucket holding > `maxBandBucket` reps is
    *     dropped from THAT band (standard production LSH: hot buckets are
    *     uninformative; a truly-similar pair still meets in another band).
    *  3. **Signature-agreement prefilter** — the band join already carries
    *     both 32-long signatures, so pairs whose component agreement
    *     (an unbiased Jaccard estimate) falls below `prefilterAgree` are cut
    *     BEFORE the expensive shingle-array verify join. Deterministic
    *     (hashes, not RNG).
    */
  def lshCandidates(df: DataFrame, bands: Int = 8, idCol: String = "doc_id",
                    k: Int = 32, shingleWidth: Int = 3,
                    maxBandBucket: Int = 1000,
                    prefilterAgree: Double = 0.0): DataFrame =
    lshCandidatesFromSigs(minHashSignatures(df, idCol, k, shingleWidth),
      bands, idCol, k, maxBandBucket, prefilterAgree)

  /** [[lshCandidates]] from a precomputed (id, minhash) signature frame —
    * lets [[nearDuplicates]] share one shingle pass between candidate
    * generation and exact verification.
    */
  private[ops] def lshCandidatesFromSigs(sigs: DataFrame, bands: Int,
                                         idCol: String, k: Int,
                                         maxBandBucket: Int,
                                         prefilterAgree: Double): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    val r = k / bands
    // Persisted: one row per DISTINCT signature (32 longs + member ids) —
    // consumed by intra-pairs, banding and both expansion joins. Without it
    // each consumer re-runs the shingle+minhash aggregation over the corpus
    // (measured 3-4× the whole pipeline's cost); with it the corpus is
    // scanned once. MEMORY_AND_DISK: spills instead of recomputing at scale.
    val grp = sigs.groupBy(col("minhash"))
      .agg(min(col(idCol)).as("rep"), collect_list(col(idCol)).as("ids"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Eager fill: the banding window and BOTH self-join sides read grp
    // concurrently; filled lazily, their tasks serialize on the per-partition
    // cache locks while one task computes the expensive signature aggregation
    // (measured as run≫cpu across every consumer stage).
    grp.count()
    // SLIM bucketing: the band window and self-join carry only
    // (rep, band, bh) — 3 longs — never the k-long signature array (17×
    // less shuffle payload; signatures rejoin below for candidate pairs
    // only). Band hash = native xxhash64 over the band id + the band's r
    // signature components — longs hashed directly, no string concat.
    val banded = grp.select(col("rep"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(lit(b) +: (0 until r).map(i =>
            element_at(col("minhash"), b * r + i + 1)): _*).as("bh"))
      }: _*)).as("bb"))
      .select(col("rep"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // Hot-bucket cap as aggregate + anti-join, NOT a window: the window
    // shuffled and sorted EVERY banded row by (band, bh); the aggregate
    // shuffles map-side partial counts only, and its output is just the HOT
    // buckets (count > cap) — ≤ corpus/cap rows by definition — so the
    // anti-join's build side stays small at any scale. Row set identical.
    val hot = banded.groupBy("band", "bh")
      .agg(count(lit(1)).as("__bn")).where(col("__bn") > maxBandBucket)
      .select("band", "bh")
    val kept = banded.join(hot, Seq("band", "bh"), "left_anti")
    val l = kept.select(col("rep").as("ra"), col("band"), col("bh"))
    val rt = kept.select(col("rep").as("rb"), col("band"), col("bh"))
    val minAgree = math.ceil(prefilterAgree * k).toInt
    // ra <= rb keeps each group's SELF-pair, which expands below into the
    // intra-group member pairs (identical signatures agree on every band) —
    // no separate intra branch, one less plan arm to compile and union.
    // distinct() BEFORE the prefilter: a pair colliding in several bands is
    // deduped first, so the signature-agreement check runs once per pair.
    // ONE grp join per side attaches signature AND member ids together
    // (was 2 joins per side: sigs for the prefilter, ids after it — r7).
    // The ids arrays ride through the prefilter only; member lists are
    // near-singleton by construction (identical-signature groups).
    val sigOf = grp.select(col("rep"), col("minhash"), col("ids"))
    val repPairs = l.join(rt, Seq("band", "bh"))
      .where(col("ra") <= col("rb"))
      .select("ra", "rb").distinct()
      .join(sigOf.select(col("rep").as("ra"), col("minhash").as("sa"),
        col("ids").as("ia")), "ra")
      .join(sigOf.select(col("rep").as("rb"), col("minhash").as("sb"),
        col("ids").as("ib")), "rb")
      .where(size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
        b => b)) >= minAgree)
    // expand representative pairs back to member pairs
    val out = repPairs
      .select(explode(col("ia")).as("a_id"), col("ib"))
      .select(col("a_id"), explode(col("ib")).as("b_id"))
      .where(col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the (candidate-bounded) result eagerly so the corpus-sized
    // signature frame can be freed NOW — repeated calls in one session no
    // longer accumulate cached corpus blocks for the app's lifetime. The
    // returned frame stays cached (it feeds multi-pass verify joins); callers
    // unpersist it when done, and unreferenced ones are weak-ref GC'd.
    out.count()
    grp.unpersist(blocking = false)
    out
  }

  /** Exact n-gram Jaccard for given pairs (verification stage after LSH).
    * Shingles are computed only for docs that appear in a candidate pair
    * (semi-join prune — at scale candidates ≪ corpus) and persisted so the
    * a-side and b-side joins share one computation.
    */
  def jaccardVerify(df: DataFrame, pairs: DataFrame, threshold: Double,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleWidth: Int = 3): DataFrame = {
    // pairs may itself be an expensive plan (LSH) and is consumed three
    // times below — persist it too.
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val needed = p.select(col("a_id").as(idCol))
      .unionAll(p.select(col("b_id").as(idCol))).distinct()
    // Tokens in their own projection (shinglesFromTokens perf contract).
    // No repartition / eager-count here: this standalone path serves SMALL
    // candidate-bounded verifies (the corpus-scale pipeline goes through
    // jaccardVerifyFromShingles, which reuses nearDuplicates' spread, cached
    // shingle frame) — on small inputs the extra shuffle + count barrier
    // cost more than the double-computed cache they avoided (measured r7).
    val sh = df.join(needed, Seq(idCol), "left_semi")
      .select(col(idCol), TextOps.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), TextOps.shinglesFromTokens(col("__toks"), shingleWidth).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withA = p.join(sh.withColumnRenamed(idCol, "a_id")
      .withColumnRenamed("sh", "sh_a"), "a_id")
    val withB = withA.join(sh.withColumnRenamed(idCol, "b_id")
      .withColumnRenamed("sh", "sh_b"), "b_id")
    val out = withB
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      // threshold on the raw ratio; round only for presentation (6 dp keeps
      // cross-engine bit-parity on identical integer inputs)
      .where(col("inter") / col("uni") >= threshold)
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .select("a_id", "b_id", "jaccard")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager: free the pair/shingle intermediates immediately (see
    // lshCandidates) — the verified-pairs result is candidate-bounded
    out.count()
    p.unpersist(blocking = false)
    sh.unpersist(blocking = false)
    out
  }

  /** Full near-dup pipeline: LSH candidates → exact Jaccard verify. The
    * signature-agreement prefilter defaults to half the verify threshold —
    * loose enough that a pair at the threshold survives with overwhelming
    * margin (agreement of a J≥t pair concentrates at t·k components), tight
    * enough to cut the ~n² sub-threshold candidates a dup-dense corpus
    * pushes through banding before any shingle array is shuffled.
    *
    * `bands` trades candidate volume for recall at the threshold: with r=k/b
    * minhash rows per band, a J-similar pair is missed with probability
    * (1−J^r)^b — k=32, b=8 (r=4) misses a J=0.8 pair ~1.5% of the time;
    * b=16 (r=2) drops that to ~1e-7 at ~J² more candidates per band. The
    * driver-contract query pins b=16 so recall is a hard correctness gate.
    */
  def nearDuplicates(df: DataFrame, threshold: Double = 0.7,
                     idCol: String = "doc_id", textCol: String = "text",
                     maxBandBucket: Int = 1000, bands: Int = 8): DataFrame = {
    // ONE shingle pass feeds both stages (r7): minhash signatures AND the
    // exact-Jaccard verify consume the same cached (id, sh) frame — the
    // corpus is tokenized/shingled exactly once. Eager count first: the
    // downstream consumers otherwise race to fill the cache concurrently
    // and the shingling runs 2-3× (measured).
    val shing = shingleFrame(df, idCol, textCol, shingleWidth = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shing.count()
    val cands = lshCandidatesFromSigs(minHashFromShingles(shing, idCol, 32),
      bands, idCol, 32, maxBandBucket, prefilterAgree = threshold / 2)
    val out = jaccardVerifyFromShingles(shing, cands, threshold, idCol)
    cands.unpersist(blocking = false) // verify already materialized its result
    shing.unpersist(blocking = false)
    out
  }

  /** [[jaccardVerify]] against a precomputed cached (id, sh) shingle frame:
    * the pair joins stream the cached shingles, no re-tokenization. The
    * pairs frame is expected persisted by the caller (LSH output is).
    */
  private[ops] def jaccardVerifyFromShingles(shing: DataFrame, pairs: DataFrame,
                                             threshold: Double,
                                             idCol: String): DataFrame = {
    // Prune the corpus-wide cached shingles to candidate docs FIRST (ids-only
    // broadcast semi-join): at scale candidates ≪ corpus, and the pair joins
    // below must never shuffle the full shingle frame.
    val needed = pairs.select(col("a_id").as(idCol))
      .unionAll(pairs.select(col("b_id").as(idCol))).distinct()
    val sh = shing.join(needed, Seq(idCol), "left_semi")
    val withA = pairs.join(sh.withColumnRenamed(idCol, "a_id")
      .withColumnRenamed("sh", "sh_a"), "a_id")
    val withB = withA.join(sh.withColumnRenamed(idCol, "b_id")
      .withColumnRenamed("sh", "sh_b"), "b_id")
    val out = withB
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("inter") / col("uni") >= threshold)
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .select("a_id", "b_id", "jaccard")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // candidate-bounded result; frees upstream caches for callers
    out
  }

  /** SimHash-64: per token-hash bit votes weighted +1/-1; signature bit b is
    * the sign of the vote sum. Implemented as one explode + bit-bucket agg —
    * shuffles (doc_id, 64 longs) per doc, not the text.
    */
  /** Signature-only SimHash path: (id, simhash) — what the dedup pipelines
    * consume. No join back onto the document frame; callers that need the
    * full row use [[withSimHash]] and pay for it explicitly.
    */
  def simHashSignatures(df: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    // explode → ONE hash-aggregate with 64 conditional sums (map-side
    // partials shuffle 64 longs per doc, never the text). The per-row
    // higher-order-function formulation re-evaluates the token array per bit
    // (Catalyst inlines it 64×) — measured order-of-magnitude slower.
    val tok = df.select(col(idCol), col(textCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol),
        explode_outer(array_distinct(TextOps.tokens(lower(col(textCol))))).as("__t"))
      .select(col(idCol), xxhash64(col("__t")).as("__h"), col("__t").isNotNull.as("__v"))
    val voteAggs = (0 until 64).map { b =>
      // literal shift amounts keep codegen; & 1 because shiftright is arithmetic
      sum(when(!col("__v"), 0L).otherwise(
        when(shiftright(col("__h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))).as(s"__b$b")
    }
    val sig = (0 until 64).map { b =>
      when(col(s"__b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    tok.groupBy(col(idCol)).agg(voteAggs.head, voteAggs.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }

  /** Full frame + signature (one extra join — prefer [[simHashSignatures]]). */
  def withSimHash(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    df.join(simHashSignatures(df, idCol, textCol), Seq(idCol))

  /** Banded SimHash near-dup pairs with Hamming distance <= maxHamming.
    * 64 bits band into 8×8; by pigeonhole any pair within Hamming 7 shares
    * at least one exact band (banding is COMPLETE for maxHamming <= 7), so
    * candidates come from 8 cheap equi-joins and the exact distance check
    * runs only on collisions — via the native codegen expression
    * [[graft.functions.Hamming64]].
    */
  def simHashNearDuplicates(df: DataFrame, maxHamming: Int = 7,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    import graft.functions.Hamming64.hamming64
    // both sides of the band self-join read this — persist or compute twice
    val sigs = simHashSignatures(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col(idCol), col("simhash"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 8).bitwiseAND(lit(0xffL)).as("bh"))
      }: _*)).as("bb"))
      .select(col(idCol), col("simhash"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
    val l = banded.select(col(idCol).as("a_id"), col("simhash").as("sa"),
      col("band"), col("bh"))
    val r = banded.select(col(idCol).as("b_id"), col("simhash").as("sb"),
      col("band"), col("bh"))
    val out = l.join(r, Seq("band", "bh"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), hamming64(col("sa"), col("sb")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // eager: free the corpus-sized signature cache now
    sigs.unpersist(blocking = false)
    out
  }

  /** Duplicate-CLUSTER resolution — the stage after pair finding that a real
    * dedup pipeline needs: near-duplication is transitive in practice (A≈B,
    * B≈C ⇒ keep one of {A,B,C}), so survivors must be chosen per CONNECTED
    * COMPONENT of the pair graph, not per pair. Pregel-style iterative
    * min-label propagation (label(v) ← min(label(v), min over neighbors)),
    * converging in O(diameter) passes — near-dup graphs are shallow, so this
    * is a handful of joins even at 10^10 docs; the A5 driver-bounded loop
    * checks convergence with one count per pass. Returns (id, cluster_id)
    * where cluster_id = the component's minimum id (the canonical survivor).
    *
    * Each pass shuffles only (id, label) longs; edges are persisted once.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // undirected: propagate both ways
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionAll(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct().persist(mem)
    edges.count()
    // localCheckpoint, not persist: each pass must TRUNCATE the logical plan,
    // or iteration k carries a k-deep nested join/agg plan and Catalyst
    // re-optimizes the whole tower every pass — measured minutes of pure
    // driver CPU by ~30 iterations. The iterative-graph rule: checkpoint per
    // superstep (what GraphX/Pregel do), keep only (id, label) longs.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      // The own-row tag rides through the union, so the PREVIOUS label falls
      // out of the same aggregation (labels holds exactly one row per id) —
      // convergence needs no second join+shuffle per pass (r7: halves the
      // per-superstep job count; the count below scans the checkpoint only).
      val next = labels.select(col("id"), col("label"), lit(true).as("own"))
        .unionAll(viaNeighbors.withColumn("own", lit(false)))
        .groupBy("id").agg(min(col("label")).as("label"),
          min(when(col("own"), col("label"))).as("prev"))
        .localCheckpoint(true)
      // convergence = no label changed this pass (exact, one small count)
      val changed = next.where(col("label") =!= col("prev")).count()
      labels = next.select("id", "label")
      converged = changed == 0
      iter += 1
    }
    require(converged, s"dupClusters did not converge in $maxIters passes " +
      "(component diameter exceeds the bound — raise maxIters)")
    edges.unpersist(blocking = false)
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** SimHash near-dup buckets: identical signatures (Hamming 0). For a
    * Hamming<=3 variant see [[simHashNearDuplicates]].
    */
  def simHashDuplicates(df: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val sigs = simHashSignatures(df, idCol, textCol)
    sigs.groupBy("simhash").agg(collect_list(col(idCol)).as("ids"),
        count(lit(1)).as("n"))
      .where(col("n") > 1)
  }
}
