package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.lake.LakeTable
import graft.wal.TranscriptWal

/** Phase-level profile of one CDC merge: scan / stats+persist / merge+write.
  * Run: `SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.MergeProfile [nEvents]"`.
  */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    Files.createDirectories(Paths.get("/dev/shm/graft-bench"))
    val work = Files.createTempDirectory(Paths.get("/dev/shm/graft-bench"), "mp").toString
    val walDir = s"$work/wal"
    timed("generate+write") {
      TranscriptWal.synthetic(spark, n, nConvs = 50000, hotConvShare = 0.05,
        dupFraction = 0.02, deleteFraction = 0.05)
        .repartition(64).write.parquet(walDir)
    }
    val wal = spark.read.parquet(walDir)
    timed("scan-count")(wal.count())
    val table = new LakeTable(spark, s"$work/t", 64)
    val res = timed("merge-total")(table.merge(wal, "prof", 1))
    println(s"events=${res.events} upserts=${res.upserts} deletes=${res.deletes} " +
      s"buckets=${res.touchedBuckets} tp=${(n / 1) } ")
    timed("read-count")(table.read().count())
    // second merge: updates for 10% of keys
    val upd = wal.where(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.col("conv_id")),
        org.apache.spark.sql.functions.lit(10)) === 0)
      .withColumn("lsn", org.apache.spark.sql.functions.col("lsn") + 100000000L)
    timed("merge-10pct")(table.merge(upd, "prof", 2))
    spark.stop()
  }
}
