package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.wal.TranscriptWal

/** Prices the SQL-INSERT per-row-lsn window (VERDICT-r5 "what's wrong" #1):
  * the same payload batch appended via [[LakeTable.appendAsUpserts]]
  * WITHOUT an lsn column (pays the key-partitioned row_number window that
  * makes same-key winners deterministic) vs WITH a precomputed lsn column
  * (window skipped — the pre-r5 write shape). min-of-3 per arm, tmpfs.
  */
object InsertProbe {
  def main(args: Array[String]): Unit = {
    val root = "/dev/shm/graft-bench"
    Files.createDirectories(Paths.get(root))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nBase = sys.env.getOrElse("PROBE_EVENTS", "2000000").toLong
    val nBatch = nBase / 10
    val batch = TranscriptWal.synthetic(spark, nBatch, 20000,
      lsnOffset = 100L * nBase).cache()
    val payload = batch.drop("op", "lsn", "commit_ts").cache()
    payload.count(); batch.count()

    def arm(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 3).map { _ =>
        val work = Files.createTempDirectory(Paths.get(root), "ins").toString
        val t = new LakeTable(spark, s"$work/t", numBuckets = 32)
        t.merge(TranscriptWal.synthetic(spark, nBase, 20000), "seed", 1)
        val t0 = System.nanoTime()
        t.appendAsUpserts(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-18s min=${secs.min}%6.2f s  runs=${secs.map(s => f"$s%.2f").mkString(",")}")
    }
    arm("insert-no-lsn", payload) // pays the per-row-lsn window
    arm("insert-with-lsn", batch.drop("commit_ts")
      .withColumn("lsn", col("lsn"))) // window skipped
    spark.stop()
  }
}
