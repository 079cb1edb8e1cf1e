package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CdcOps, GroupOps, IntervalJoin}

class NewOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("SeqPrefixLen counts the gap-free prefix regardless of input order") {
    val agg = udaf(new graft.ops.Aggregators.SeqPrefixLen(0))
    val rows = Seq(("a", 2), ("a", 0), ("a", 1), ("a", 5), // prefix 0,1,2 -> 3
      ("b", 1), ("b", 2), // no 0 -> prefix 0
      ("c", 0)) // -> 1
    val out = rows.toDF("k", "i").repartition(5)
      .groupBy("k").agg(agg(col("i")).as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 3, "b" -> 0, "c" -> 1))
  }

  test("linkSameRole links the nearest prior same-role turn within lookback") {
    val rows = Seq(
      ("c1", 0, "user"), ("c1", 1, "bot"), ("c1", 2, "user"), // 2 -> 0
      ("c1", 3, "bot"), // 3 -> 1
      ("c1", 10, "user"), // 10 -> 2 (within 5 rows back)
      ("c2", 0, "x"), ("c2", 1, "y"), ("c2", 2, "y"), ("c2", 3, "y"),
      ("c2", 4, "y"), ("c2", 5, "y"), ("c2", 6, "y"),
      ("c2", 7, "x")) // 7 rows after 0: "x" fell out of lookback 5 -> -1
    val out = GroupOps.linkSameRole(rows.toDF("conv_id", "turn_idx", "role"), 5)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(3)).toMap
    assert(out(("c1", 2)) == 0 && out(("c1", 3)) == 1 && out(("c1", 10)) == 2)
    assert(out(("c1", 0)) == -1 && out(("c2", 7)) == -1)
    assert(out(("c2", 6)) == 5)
  }

  test("greedyCluster anchors the boundary at the cluster START, not prev row") {
    // ts gaps of 400s each; span 1000s: rows at 0,400,800 cluster 0 (800<=1000),
    // 1200 starts cluster 1 (1200-0>1000) even though 1200-800=400 is small —
    // a gap-sessionizer would keep ONE session here.
    val base = 1704067200L
    val rows = (0 until 6).map(i =>
      ("c", i, new java.sql.Timestamp((base + i * 400L) * 1000)))
    val out = GroupOps.greedyCluster(rows.toDF("conv_id", "turn_idx", "ts"),
      spanMicros = 1000L * 1000000)
      .collect().map(r => r.getInt(1) -> r.getLong(3)).toMap
    assert(out == Map(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 1, 4 -> 1, 5 -> 1))
    val sessions = CdcOps.sessionizeByGap(rows.toDF("conv_id", "turn_idx", "ts"),
      "ts", 1000).agg(max("session_id")).collect()(0).getLong(0)
    assert(sessions == 1, "gap sessionizer sees one session — shapes differ")
  }

  test("interval grid join equals the naive range join, incl. overlap + residual") {
    val events = (0 until 200).map(i => ("k" + i % 3, i.toLong, (i * 137L) % 10000))
      .toDF("key", "eid", "tsu")
    val windows = Seq(
      ("k0", 0L, 1000L, 2500L), ("k0", 1L, 2000L, 3500L), // overlap 2000-2500
      ("k1", 2L, 0L, 500L), ("k2", 3L, 9000L, 10000L),
      ("k0", 4L, 9990L, 12000L))
      .toDF("key", "wid", "ws", "we")
    val grid = IntervalJoin.assign(events, windows, "key", "tsu", "ws", "we", 700L)
      .select("key", "eid", "wid")
    val naive = events.join(windows, Seq("key"))
      .where(col("tsu") >= col("ws") && col("tsu") < col("we"))
      .select("key", "eid", "wid")
    assert(grid.exceptAll(naive).count() == 0 && naive.exceptAll(grid).count() == 0)
    assert(grid.groupBy("eid").count().where(col("count") >= 2).count() > 0,
      "fixture exercises explode-on-overlap")
    val resid = IntervalJoin.residual(events, windows, "key", "eid", "tsu", "ws", "we", 700L)
    val naiveResid = events.join(naive.select("eid").distinct(), Seq("eid"), "left_anti")
    assert(resid.count() == naiveResid.count() && resid.count() > 0)
  }

  test("sessionizeCascade ORs boundary predicates over full-row structs") {
    val base = 1704067200L
    def ts(s: Long) = new java.sql.Timestamp((base + s) * 1000)
    val rows = Seq(
      ("c", 1L, 0, "user", ts(0)), ("c", 2L, 1, "user", ts(10)),
      ("c", 3L, 2, "system", ts(20)), // role escalation -> boundary
      ("c", 4L, 3, "user", ts(5000)), // big gap -> boundary
      ("c", 5L, 0, "user", ts(5010))) // turn reset -> boundary
      .toDF("conv_id", "lsn", "turn_idx", "role", "ts")
    val out = CdcOps.sessionizeCascade(rows, "lsn", Seq(
      (p, c) => unix_micros(c.getField("ts")) - unix_micros(p.getField("ts")) > 1800000000L,
      (p, c) => c.getField("role") === "system" && p.getField("role") =!= "system",
      (p, c) => c.getField("turn_idx") < p.getField("turn_idx")))
      .agg(max("session_id")).collect()(0).getLong(0)
    assert(out == 4)
  }

  test("sanitizer hits every default rule class exactly once on a planted string") {
    val planted = "m a@b.co +82-10-99 AB1234567 4242-4242-4242-0042 " +
      "351234500000042 91234567890 10.0.3.7 fe80:abc1:234:5678:9abc:def0:1234:5 " +
      "0a:1b:2c:3d:4e:5f 010-123-456-7890 https://x.io/p q"
    val out = CdcOps.sanitize(Seq(planted).toDF("text"))
      .collect()(0).getString(0)
    val expect = "m [EMAIL] [PHONE] [ID] [CARD] [IMEI] [NUM] [IP] [IPV6] " +
      "[MAC] [PHONE] [URL] q"
    assert(out == expect, s"got: $out")
  }

  test("Route.apply passes unrouted branches through and rejects unknown routes") {
    val wal = graft.wal.TranscriptWal.synthetic(spark, 400, 8, deleteFraction = 0.4)
    val out = graft.ops.Route.apply(wal,
      Map("quarantine" -> (df => df.withColumn("text", lit("[Q]")))))
    assert(out.count() == wal.count(), "no events vanish without a branch")
    assert(out.where(col("text") === "[Q]").count() > 0)
    intercept[IllegalArgumentException] {
      graft.ops.Route.apply(wal, Map("nonsense" -> identity[org.apache.spark.sql.DataFrame] _))
    }
  }

  test("lshCandidates bucket cap drops oversized band buckets only") {
    // 30 identical docs (one sig group) + 2 similar docs
    val docs = (0 until 30).map(i => (i.toLong, "the same exact text body here three")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta"),
        (101L, "alpha beta gamma delta epsilon eta"))
    val df = docs.toDF("doc_id", "text")
    val capped = graft.ops.DedupOps.lshCandidates(df, maxBandBucket = 1)
    // identical-sig groups expand regardless of the cap (they skip banding)
    assert(capped.where(col("a_id") < 30 && col("b_id") < 30).count() == 30L * 29 / 2)
  }

  test("chunked rendering ≡ unchunked for EVERY format (text, markdown, html)") {
    import graft.sink.TranscriptExport._
    val wal = graft.wal.TranscriptWal.synthetic(spark, 500, 4)
    val state = graft.wal.TranscriptWal.expectedState(wal)
    def reassembled(chunks: org.apache.spark.sql.DataFrame, sep: String) =
      chunks.groupBy("conv_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct($"chunk_idx", $"doc"))),
          t => t.getField("doc")), sep).as("doc"))
    val cases = Seq[(String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, String)](
      ("text", toText(state), toTextChunked(state, 7), "\n"),
      ("markdown", toMarkdown(state), toMarkdownChunked(state, 7), "\n\n"),
      ("html", toHtml(state), toHtmlChunked(state, 7), "\n"))
    cases.foreach { case (name, whole, chunked, sep) =>
      val a = whole.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val b = reassembled(chunked, sep).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(a == b, s"$name: chunk concatenation must equal the whole doc")
      assert(chunked.count() > state.select("conv_id").distinct().count(),
        s"$name: genuinely chunked (bounded per-chunk buffers)")
    }
  }

  test("multi-probe LSH ANN recall >= single-probe on the same corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" < 20)
    val brute = graft.ops.SimilarityOps.bruteForceTopK(e, q, k = 3)
      .select("query_id", "neighbor_id")
    val single = graft.ops.SimilarityOps.lshTopK(e, q, k = 3, bits = 8, multiProbe = 0)
      .select("query_id", "neighbor_id")
    val multi = graft.ops.SimilarityOps.lshTopK(e, q, k = 3, bits = 8, multiProbe = 8)
      .select("query_id", "neighbor_id")
    val rSingle = single.intersect(brute).count()
    val rMulti = multi.intersect(brute).count()
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single $rSingle")
    assert(rMulti > 0)
  }

  test("RealCodec round-trips generated WAV/BMP and rejects corrupt blobs") {
    import graft.ops.MultimodalOps.{MediaGen, RealCodec}
    val a = RealCodec.decode(4L, MediaGen.wav(4L)).get
    assert(a.media_type == "audio" && a.dim1 == 8000 + (4 % 3) * 4000)
    assert(a.dim2 == 1 && a.payload_units == 50 + 4 % 50)
    assert(a.duration_micros == (50 + 4 % 50) * 1000000L / a.dim1)
    val i7 = RealCodec.decode(7L, MediaGen.bmp(7L)).get
    assert(i7.media_type == "image" && i7.dim1 == 1 + 7 % 8 && i7.dim2 == 1 + 7 % 5)
    assert(RealCodec.decode(1L, "not a container".getBytes).isEmpty)
    assert(RealCodec.decode(1L, Array[Byte]('R', 'I', 'F', 'F')).isEmpty)
    // corrupt header field: zero sample rate
    val bad = MediaGen.wav(2L).clone()
    bad(24) = 0; bad(25) = 0; bad(26) = 0; bad(27) = 0
    assert(RealCodec.decode(2L, bad).isEmpty)
  }

  test("IVF ANN: nprobe=nlist equals brute force; fewer probes trade recall") {
    import graft.ops.SimilarityOps
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" < 15)
    val brute = SimilarityOps.bruteForceTopK(e, q, k = 3)
      .select("query_id", "neighbor_id").collect().toSet
    // probing EVERY list searches the whole corpus -> identical top-k sets
    val full = SimilarityOps.ivfTopK(e, q, k = 3, nlist = 8, nprobe = 8)
      .select("query_id", "neighbor_id").collect().toSet
    assert(full == brute, "nprobe=nlist must reduce to exact search")
    val narrow = SimilarityOps.ivfTopK(e, q, k = 3, nlist = 8, nprobe = 2)
      .select("query_id", "neighbor_id").collect().toSet
    val recall = (narrow intersect brute).size.toDouble / brute.size
    assert(recall > 0.3, s"narrow-probe recall $recall")
    assert(narrow.size <= brute.size + 1)
  }
}
