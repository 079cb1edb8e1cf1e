package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.model.IngestConfig
import graft.stream.CdcIngestJob
import graft.wal.TranscriptWal

/** CLI demo of the lake-merge semantics: insert batch → idempotent re-apply
  * (no-op) → update batch → deletes → additive schema evolution. Prints one
  * observation line per step; exits nonzero if any invariant fails.
  *
  * Run: `sbt "runMain graft.tools.ReplayDemo"`.
  */
object ReplayDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("replay-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = Files.createTempDirectory("replaydemo").toString
    val table = new LakeTable(spark, s"$work/t", numBuckets = 8)
    var failed = false
    def check(name: String, cond: Boolean, detail: String): Unit = {
      println(s"${if (cond) "OK " else "FAIL"} $name  $detail")
      if (!cond) failed = true
    }

    // 1. Insert-only batch without the `tool` column (pre-evolution schema).
    val b1 = TranscriptWal.synthetic(spark, 1000, 20, withTool = false)
      .drop("tool")
    val r1 = table.merge(b1, "demo", 1)
    val n1 = table.read().count()
    check("insert", r1.applied && n1 > 0, s"rows=$n1 v=${r1.version} buckets=${r1.touchedBuckets}")

    // 2. Re-apply the same epoch: must be a metadata no-op.
    val r2 = table.merge(b1, "demo", 1)
    check("idempotent-epoch", !r2.applied && table.read().count() == n1,
      s"applied=${r2.applied} rows=${table.read().count()}")

    // 3. Higher-lsn updates for a subset of keys: state must change, count not.
    val upd = b1.where(col("turn_idx") < 5)
      .withColumn("lsn", col("lsn") + 1000000L)
      .withColumn("text", concat(lit("UPDATED "), col("text")))
    val r3 = table.merge(upd, "demo", 2)
    val updated = table.read().where(col("text").startsWith("UPDATED")).count()
    val expUpd = TranscriptWal.expectedState(b1).where(col("turn_idx") < 5).count()
    check("lww-update", r3.applied && updated == expUpd && table.read().count() == n1,
      s"updated=$updated expected=$expUpd rows=${table.read().count()}")

    // 4. Tombstones: delete every turn_idx==0 row.
    val dels = b1.where(col("turn_idx") === 0)
      .withColumn("lsn", col("lsn") + 2000000L)
      .withColumn("op", lit("D"))
    table.merge(dels, "demo", 3)
    val zeroLeft = table.read().where(col("turn_idx") === 0).count()
    check("delete", zeroLeft == 0, s"turn0-rows=$zeroLeft rows=${table.read().count()}")

    // 5. Additive evolution: batch introduces `tool`; old rows read as null.
    val b5 = TranscriptWal.synthetic(spark, 200, 20, withTool = true, lsnOffset = 5000000L)
    table.merge(b5, "demo", 4)
    val schemaHasTool = table.read().columns.contains("tool")
    val toolRows = table.read().where(col("tool").isNotNull).count()
    check("schema-evolution", schemaHasTool, s"tool-col=$schemaHasTool nonNullTool=$toolRows")

    // 6. Replay equality: independent oracle (window kernel) over the full WAL.
    val allWal = b1.withColumn("tool", lit(null).cast("string"))
      .select(b5.columns.map(col).toIndexedSeq: _*)
      .unionAll(upd.withColumn("tool", lit(null).cast("string"))
        .select(b5.columns.map(col).toIndexedSeq: _*))
      .unionAll(dels.withColumn("tool", lit(null).cast("string"))
        .select(b5.columns.map(col).toIndexedSeq: _*))
      .unionAll(b5)
    val oracle = TranscriptWal.expectedState(allWal)
      .select("conv_id", "turn_idx", "role", "text", "tool")
    val got = table.read().select("conv_id", "turn_idx", "role", "text", "tool")
    val diff = oracle.exceptAll(got).count() + got.exceptAll(oracle).count()
    check("replay-equality", diff == 0, s"symmetric-diff=$diff state=${got.count()}")

    // 7. Streaming: tail a WAL dir into a fresh table, then feed the SAME
    //    table from a SECOND stream with a new checkpoint (batchIds restart
    //    at 0) — the epoch namespace must be checkpoint-scoped or the second
    //    stream's batches would be skipped as already committed.
    val sWork = Files.createTempDirectory("replaydemo-stream").toString
    val conf = graft.model.IngestConfig(tablePath = s"$sWork/t",
      checkpointPath = s"$sWork/cp1", numBuckets = 8, enforceWatermark = false)
    val sw1 = TranscriptWal.synthetic(spark, 500, 10)
    sw1.coalesce(2).write.mode("append").parquet(s"$sWork/wal1")
    CdcIngestJob.start(spark, s"$sWork/wal1", conf).awaitTermination()
    val st = new LakeTable(spark, conf.tablePath, 8)
    val afterS1 = st.read().count()
    val sw2 = TranscriptWal.synthetic(spark, 200, 10, lsnOffset = 9000000L)
      .withColumn("text", lit("FROM-STREAM-2"))
    sw2.coalesce(1).write.mode("append").parquet(s"$sWork/wal2")
    CdcIngestJob.start(spark, s"$sWork/wal2",
      conf.copy(checkpointPath = s"$sWork/cp2")).awaitTermination()
    val s2Rows = st.read().where(col("text") === "FROM-STREAM-2").count()
    check("stream-two-checkpoints", afterS1 > 0 && s2Rows > 0,
      s"stream1Rows=$afterS1 stream2Applied=$s2Rows")

    spark.stop()
    if (failed) sys.exit(1)
  }
}
