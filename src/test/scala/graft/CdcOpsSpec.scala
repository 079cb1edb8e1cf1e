package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CdcOps
import graft.wal.TranscriptWal

class CdcOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def wal(n: Long = 500, convs: Int = 10) =
    TranscriptWal.synthetic(spark, n, convs)

  test("dedupByKeyLsn collapses exact duplicate events") {
    val w = wal()
    val doubled = w.unionAll(w)
    assert(CdcOps.dedupByKeyLsn(doubled).count() == w.count())
  }

  test("dedup keeps distinct lsns for the same key") {
    val df = Seq(
      ("U", 1L, "c1", 0, "a"), ("U", 2L, "c1", 0, "b"), ("U", 2L, "c1", 0, "b")
    ).toDF("op", "lsn", "conv_id", "turn_idx", "text")
    assert(CdcOps.dedupByKeyLsn(df).count() == 2)
  }

  test("arbitrateLastWriterWins keeps exactly the max-lsn row per key") {
    val w = wal(1000, 7)
    val arb = CdcOps.arbitrateLastWriterWins(w)
    // one row per key
    assert(arb.groupBy("conv_id", "turn_idx").count().where($"count" > 1).count() == 0)
    // winner lsn equals max lsn per key
    val maxes = w.groupBy("conv_id", "turn_idx").agg(max("lsn").as("mx"))
    val bad = arb.join(maxes, Seq("conv_id", "turn_idx"))
      .where($"lsn" =!= $"mx").count()
    assert(bad == 0)
  }

  test("arbitration is permutation-invariant") {
    val w = wal(800, 5)
    val shuffledW = w.orderBy(xxhash64($"lsn", lit("p")))
    val a = CdcOps.arbitrateLastWriterWins(w).orderBy("conv_id", "turn_idx")
    val b = CdcOps.arbitrateLastWriterWins(shuffledW).orderBy("conv_id", "turn_idx")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("sanitize masks emails, urls, ips and leaves clean text alone") {
    val df = Seq(
      (1, "write to bob@corp.io now"),
      (2, "see https://x.io/a?b=1 and 192.168.0.1"),
      (3, "nothing sensitive here")
    ).toDF("id", "text")
    val out = CdcOps.sanitize(df).orderBy("id").select("text").as[String].collect()
    assert(out(0) == "write to [EMAIL] now")
    assert(out(1).contains("[URL]") && out(1).contains("[IP]"))
    assert(out(2) == "nothing sensitive here")
  }

  test("sessionizeByGap splits on gaps strictly greater than the gap") {
    val df = Seq(
      ("c1", 0, 0L), ("c1", 1, 100L), ("c1", 2, 4000L), ("c1", 3, 4100L),
      ("c2", 0, 0L)
    ).map { case (c, t, s) => (c, t, new java.sql.Timestamp(s * 1000)) }
      .toDF("conv_id", "turn_idx", "ts")
    val out = CdcOps.sessionizeByGap(df, "ts", 3600)
      .select("conv_id", "turn_idx", "session_id")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out(("c1", 0)) == 1 && out(("c1", 1)) == 1)
    assert(out(("c1", 2)) == 2 && out(("c1", 3)) == 2)
    assert(out(("c2", 0)) == 1)
  }

  test("dropLate drops strictly-older-than-cutoff rows and observes the count") {
    val w = wal(300, 5)
    val hw = w.agg(max(unix_micros($"commit_ts"))).collect()(0).getLong(0)
    val kept = CdcOps.dropLate(w, hw, expr("INTERVAL '5' MINUTE"))
    val cutoff = hw - 5 * 60 * 1000000L
    val expected = w.where(unix_micros($"commit_ts") >= cutoff).count()
    assert(kept.count() == expected)
    assert(kept.count() < w.count()) // synthetic spans > 5 minutes
  }

  test("flagBoilerplate flags text repeated across conversations") {
    val rows = (0 until 20).map(i => (s"c$i", 0, "PLEASE RATE THIS CHAT")) ++
      Seq(("c0", 1, "unique text one"), ("c1", 1, "unique text two"))
    val df = rows.toDF("conv_id", "turn_idx", "text")
    val out = CdcOps.flagBoilerplate(df, minConvs = 3)
    assert(out.where($"is_boilerplate").count() == 20)
    assert(out.where(!$"is_boilerplate").count() == 2)
  }

  test("lineageMetrics counts ops per conversation") {
    val df = Seq(
      ("U", 1L, "c1", 0), ("U", 2L, "c1", 1), ("D", 3L, "c1", 1),
      ("U", 4L, "c2", 0)
    ).toDF("op", "lsn", "conv_id", "turn_idx")
    val m = CdcOps.lineageMetrics(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("c1").getLong(1) == 3 && m("c1").getLong(2) == 2 && m("c1").getLong(3) == 1)
    assert(m("c1").getLong(4) == 2) // distinct turns
    assert(m("c2").getLong(1) == 1)
  }

  test("withGlobalId is replay-stable: same ids regardless of input order") {
    val st = TranscriptWal.expectedState(wal(400, 6))
    val a = CdcOps.withGlobalId(st)
    val b = CdcOps.withGlobalId(st.orderBy(xxhash64($"conv_id", $"turn_idx")))
    assert(a.select("global_id", "conv_id", "turn_idx")
      .exceptAll(b.select("global_id", "conv_id", "turn_idx")).count() == 0)
  }

  test("saltedRepartition preserves rows and spreads a hot key") {
    val w = TranscriptWal.synthetic(spark, 2000, 10, hotConvShare = 0.5)
    val salted = CdcOps.saltedRepartition(w, 8, 8)
    assert(salted.count() == w.count())
    // hot conversation must span multiple partitions after salting
    val parts = salted.where($"conv_id" === "hot")
      .select(spark_partition_id()).distinct().count()
    assert(parts > 1, s"hot conv landed in $parts partition(s)")
  }

  test("pipeline with flagBoilerplate drops cross-conv repeated turns") {
    import graft.model.IngestConfig
    def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)
    val boiler = (0 until 20).map(i => ("U", 1000L + i, ts(i), s"c$i", 0,
      "assistant", "PLEASE RATE THIS CHAT", null: String, ts(i)))
    val unique = (0 until 5).map(i => ("U", 2000L + i, ts(i), s"c$i", 1,
      "user", s"unique text $i", null: String, ts(i)))
    val df = (boiler ++ unique)
      .toDF("op", "lsn", "commit_ts", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val conf = IngestConfig(tablePath = "/tmp/x", checkpointPath = "/tmp/y",
      enforceWatermark = false, flagBoilerplate = true)
    val out = graft.stream.CdcIngestJob.pipeline(df, conf, 0L)
    assert(out.count() == 5)
    assert(out.where($"text" === "PLEASE RATE THIS CHAT").count() == 0)
  }

  test("boilerplate drop never eats tombstones or null-text rows") {
    import graft.model.IngestConfig
    def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 1000L)
    // boilerplate text lives in 20 convs; one DELETE carries the same text
    // as its before-image — dropping it would resurrect the target row
    val boiler = (0 until 20).map(i => ("U", 1000L + i, ts(i), s"c$i", 0,
      "assistant", "PLEASE RATE THIS CHAT", null: String, ts(i)))
    val del = Seq(("D", 3000L, ts(99), "c0", 0,
      "assistant", "PLEASE RATE THIS CHAT", null: String, ts(99)))
    // null-text rows span many convs: xxhash64(null) collapses to the seed,
    // so a naive fingerprint would pool them into one "boilerplate" group
    val nulls = (0 until 5).map(i => ("U", 4000L + i, ts(i), s"c$i", 2,
      "user", null: String, null: String, ts(i)))
    val df = (boiler ++ del ++ nulls)
      .toDF("op", "lsn", "commit_ts", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val conf = IngestConfig(tablePath = "/tmp/x", checkpointPath = "/tmp/y",
      enforceWatermark = false, flagBoilerplate = true)
    val out = graft.stream.CdcIngestJob.pipeline(df, conf, 0L)
    assert(out.where($"op" === "D").count() == 1, "tombstone survives the filter")
    assert(out.where($"text".isNull).count() == 5, "null-text rows never flagged")
    assert(out.where($"op" === "U" && $"text" === "PLEASE RATE THIS CHAT").count() == 0)
  }
}
