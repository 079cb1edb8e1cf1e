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

  /** Exact dedup: keep the min-id row per identical text. */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(idCol))
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
  def withMinHash(df: DataFrame, k: Int = 32, shingleWidth: Int = 3,
                  textCol: String = "text"): DataFrame = {
    val sh = TextOps.shingles(col(textCol), shingleWidth)
    val sig = aggregate(sh,
      array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (m, i) => least(m, xxhash64(s, i))))
    df.withColumn("minhash", sig)
  }

  /** LSH candidate pairs: b bands of r rows (k = b*r); docs sharing any
    * band-hash are candidates. Returns (a_id, b_id) with a_id < b_id,
    * deduplicated across bands.
    */
  def lshCandidates(df: DataFrame, bands: Int = 8, idCol: String = "doc_id",
                    k: Int = 32, shingleWidth: Int = 3): DataFrame = {
    val r = k / bands
    val sigs = withMinHash(df, k, shingleWidth).select(col(idCol), col("minhash"))
    val banded = sigs.select(col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), xxhash64(
          concat_ws(",", slice(col("minhash"), b * r + 1, r))).as("bh"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val l = banded.withColumnRenamed(idCol, "a_id")
    val rgt = banded.withColumnRenamed(idCol, "b_id")
    l.join(rgt, Seq("band", "bh"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact n-gram Jaccard for given pairs (verification stage after LSH). */
  def jaccardVerify(df: DataFrame, pairs: DataFrame, threshold: Double,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleWidth: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), TextOps.shingles(col(textCol), shingleWidth).as("sh"))
    val withA = pairs.join(sh.withColumnRenamed(idCol, "a_id")
      .withColumnRenamed("sh", "sh_a"), "a_id")
    val withB = withA.join(sh.withColumnRenamed(idCol, "b_id")
      .withColumnRenamed("sh", "sh_b"), "b_id")
    withB
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      // threshold on the raw ratio; round only for presentation (6 dp keeps
      // cross-engine bit-parity on identical integer inputs)
      .where(col("inter") / col("uni") >= threshold)
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .select("a_id", "b_id", "jaccard")
  }

  /** Full near-dup pipeline: LSH candidates → exact Jaccard verify. */
  def nearDuplicates(df: DataFrame, threshold: Double = 0.7,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    jaccardVerify(df, lshCandidates(df, idCol = idCol), threshold, idCol, textCol)

  /** SimHash-64: per token-hash bit votes weighted +1/-1; signature bit b is
    * the sign of the vote sum. Implemented as one explode + bit-bucket agg —
    * shuffles (doc_id, 64 longs) per doc, not the text.
    */
  def withSimHash(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // explode → ONE hash-aggregate with 64 conditional sums (map-side
    // partials shuffle 64 longs per doc, never the text). The per-row
    // higher-order-function formulation re-evaluates the token array per bit
    // (Catalyst inlines it 64×) — measured order-of-magnitude slower.
    val tok = df.select(col(idCol),
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
    val sigs = tok.groupBy(col(idCol)).agg(voteAggs.head, voteAggs.tail: _*)
      .select(col(idCol), sig.as("simhash"))
    df.join(sigs, Seq(idCol))
  }

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
    val sigs = withSimHash(df, idCol, textCol).select(col(idCol), col("simhash"))
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
    l.join(r, Seq("band", "bh"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), hamming64(col("sa"), col("sb")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash near-dup buckets: identical signatures (Hamming 0). For a
    * Hamming<=3 variant see [[simHashNearDuplicates]].
    */
  def simHashDuplicates(df: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val sigs = withSimHash(df, idCol, textCol).select(col(idCol), col("simhash"))
    sigs.groupBy("simhash").agg(collect_list(col(idCol)).as("ids"),
        count(lit(1)).as("n"))
      .where(col("n") > 1)
  }
}
