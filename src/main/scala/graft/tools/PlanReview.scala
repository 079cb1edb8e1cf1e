package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.wal.TranscriptWal

/** Dumps `.explain("formatted")` for the engine's hot paths so plan quality
  * (pushdown, pruning, codegen spans, join strategies, shuffle count) can be
  * reviewed and tracked. Run: `sbt "runMain graft.tools.PlanReview" > PLANS.txt`.
  */
object PlanReview {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n======== PLAN: $name ========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    Files.createDirectories(Paths.get("/dev/shm/graft-bench"))
    val work = Files.createTempDirectory(Paths.get("/dev/shm/graft-bench"), "plan").toString
    val t = new LakeTable(spark, s"$work/t", 8)
    val wal = TranscriptWal.synthetic(spark, 5000, 20, deleteFraction = 0.05)
    t.merge(wal, "p", 1)
    t.merge(wal.withColumn("lsn", col("lsn") + 100000L), "p", 2)

    // 1. MOR read: base+deltas arbitration
    show("lake.read (merge-on-read)")(t.read())
    // 2. Compacted read fast path
    t.compactAll()
    show("lake.read (compacted fast path)")(t.read())
    // 3. Column pruning + filter pushdown through the lake read
    show("lake.read pruned+filtered")(
      t.read().where(col("conv_id") === "c3").select("conv_id", "turn_idx", "role"))
    // 4. Flagship CDC apply source side (scan → pipeline)
    show("wal scan + sanitize pipeline")(
      graft.stream.CdcIngestJob.pipeline(
        TranscriptWal.fromEvents(spark, sf),
        graft.model.IngestConfig(s"$work/t2", s"$work/cp2", sanitize = true),
        highWaterMicros = 1704067200000000L)) // 2024-01-01 in MICROseconds
    // 5. Broadcast join chain
    show("q_join_nation_rev (broadcast chain)")(
      graft.SparkEntry.queries("q_join_nation_rev")(spark, sf))
    // 6. LSH candidate self-join
    show("minhash LSH candidates")(
      graft.ops.DedupOps.lshCandidates(
        spark.read.parquet(s"$sf/documents.parquet")))

    spark.stop()
  }
}
