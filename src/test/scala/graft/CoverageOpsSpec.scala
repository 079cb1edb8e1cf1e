package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.model.IngestConfig
import graft.ops.Route
import graft.sink.TranscriptExport
import graft.stream.CdcIngestJob
import graft.wal.{TranscriptWal, WalSource}

class CoverageOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("text export renders turns in turn_idx order with header") {
    val state = Seq(
      ("c1", 2, "assistant", "world", null: String, ts(2)),
      ("c1", 1, "user", "hello", null: String, ts(1))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val doc = TranscriptExport.toText(state).where($"conv_id" === "c1")
      .select("doc").as[String].collect()(0)
    assert(doc == "c1\n  user: hello\n  assistant: world")
  }

  test("markdown export escapes control chars and shows tool") {
    val state = Seq(
      ("c1", 1, "tool", "a*b_c", "search", ts(1))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val doc = TranscriptExport.toMarkdown(state)
      .select("doc").as[String].collect()(0)
    assert(doc.contains("**tool** (search): a\\*b\\_c"))
  }

  test("export is deterministic under input permutation") {
    val state = TranscriptWal.expectedState(TranscriptWal.synthetic(spark, 300, 5))
    val a = TranscriptExport.toText(state).orderBy("conv_id").collect().toSeq
    val b = TranscriptExport.toText(state.orderBy(xxhash64($"text")))
      .orderBy("conv_id").collect().toSeq
    assert(a == b)
  }

  test("triage routes delete-heavy conversations to quarantine") {
    val events = Seq(
      ("D", 1L, "heavy", 0), ("D", 2L, "heavy", 1), ("U", 3L, "heavy", 2),
      ("U", 4L, "ok", 0), ("U", 5L, "ok", 1)
    ).toDF("op", "lsn", "conv_id", "turn_idx")
    val routes = Route.triage(events, deleteHeavy = 0.5)
      .select("conv_id", "route").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(routes("heavy") == "quarantine" && routes("ok") == "fast")
  }

  test("Route.apply unions branch transforms") {
    val events = Seq(
      ("D", 1L, "h", 0), ("D", 2L, "h", 1), ("U", 3L, "h", 2),
      ("U", 4L, "o", 0)
    ).toDF("op", "lsn", "conv_id", "turn_idx")
    val out = Route.apply(events, Map(
      "quarantine" -> (df => df.withColumn("tag", lit("q"))),
      "fast" -> (df => df.withColumn("tag", lit("f"))),
      "review" -> (df => df.withColumn("tag", lit("r")))))
    val tags = out.select("conv_id", "tag").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tags("h") == "q" && tags("o") == "f")
    assert(out.count() == events.count())
  }

  test("corrupt JSON WAL: clean rows pass, garbage counted, not silently dropped") {
    val work = Files.createTempDirectory("corrupt").toString
    val good = TranscriptWal.synthetic(spark, 50, 5)
    good.coalesce(1).write.mode("overwrite").json(s"$work/wal")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$work/wal/bad.json"),
      "{oops\n{\"op\":\"U\"}\n".getBytes)
    val (clean, corrupt) = WalSource.readJson(spark, s"$work/wal")
    assert(clean.count() == 50)
    assert(corrupt.count() == 2)
  }

  test("streaming listener captures per-batch rows and observed metrics") {
    val work = Files.createTempDirectory("listener").toString
    val conf = IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
      numBuckets = 4, enforceWatermark = false, maxFilesPerTrigger = 1)
    val wal = TranscriptWal.synthetic(spark, 200, 5)
    wal.coalesce(2).write.parquet(s"$work/wal")
    val listener = CdcIngestJob.attachListener(spark)
    try {
      val q = CdcIngestJob.start(spark, s"$work/wal", conf)
      q.awaitTermination()
      // listener is async; progress events flush on termination
      Thread.sleep(500)
      assert(listener.totalInputRows == 200)
      val walObs = listener.batches.flatMap(_.observed.get("wal"))
      assert(walObs.nonEmpty && walObs.map(_("events").asInstanceOf[Long]).sum == 200)
    } finally spark.streams.removeListener(listener)
  }

  test("readConvs multi-key pruned lookup equals full-read IN filter") {
    val t = new graft.lake.LakeTable(spark,
      java.nio.file.Files.createTempDirectory("multi").toString, 8)
    t.merge(graft.wal.TranscriptWal.synthetic(spark, 800, 20), "t", 1)
    val keys = Seq("c3", "c7", "c11", "nope")
    val pruned = t.readConvs(keys).select("conv_id", "turn_idx", "text")
    val full = t.read().where($"conv_id".isin(keys: _*))
      .select("conv_id", "turn_idx", "text")
    assert(pruned.exceptAll(full).count() == 0 && full.exceptAll(pruned).count() == 0)
    assert(pruned.select("conv_id").distinct().count() == 3)
  }

  test("readConv bucket-pruned lookup equals full-read filter") {
    val t = new LakeTable(spark, Files.createTempDirectory("prune").toString, 8)
    val wal = TranscriptWal.synthetic(spark, 400, 10, deleteFraction = 0.1)
    t.merge(wal, "t", 1)
    val full = t.read().where($"conv_id" === "c3")
      .select("conv_id", "turn_idx", "text")
    val pruned = t.readConv("c3").select("conv_id", "turn_idx", "text")
    assert(pruned.exceptAll(full).count() == 0 && full.exceptAll(pruned).count() == 0)
    assert(pruned.count() > 0)
  }

  test("hamming64 native expression: eval + codegen parity") {
    import graft.functions.Hamming64.hamming64
    val df = Seq((0L, 0L), (-1L, 0L), (0b1011L, 0b0001L)).toDF("a", "b")
    val got = df.select(hamming64($"a", $"b")).as[Int].collect().toSeq
    assert(got == Seq(0, 64, 2))
    // survives whole-stage codegen in a realistic plan
    val big = spark.range(1000).select(xxhash64($"id").as("a"), xxhash64($"id" + 1).as("b"))
    assert(big.select(hamming64($"a", $"b")).where(col("hamming64(a, b)") >= 0).count() == 1000)
  }

  test("simHashNearDuplicates banding is COMPLETE vs brute force at h<=7") {
    import graft.functions.Hamming64.hamming64
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(100)
    val copies = docs.select(($"doc_id" + 100000).as("doc_id"),
      concat($"text", lit(" flip")).as("text"))
    val corpus = docs.unionAll(copies)
    val banded = graft.ops.DedupOps.simHashNearDuplicates(corpus, maxHamming = 7)
      .select("a_id", "b_id", "hamming")
    // brute-force ground truth over all pairs
    val sigs = graft.ops.DedupOps.withSimHash(corpus).select($"doc_id", $"simhash")
    val l = sigs.select($"doc_id".as("a_id"), $"simhash".as("sa"))
    val r = sigs.select($"doc_id".as("b_id"), $"simhash".as("sb"))
    val brute = l.crossJoin(r).where($"a_id" < $"b_id")
      .select($"a_id", $"b_id", hamming64($"sa", $"sb").as("hamming"))
      .where($"hamming" <= 7)
    assert(banded.exceptAll(brute).count() == 0 && brute.exceptAll(banded).count() == 0)
    assert(brute.count() > 0) // some planted copies do land within 7 bits
  }

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)
}
