package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.wal.TranscriptWal

/** Prices broadcast merge-on-read vs the window fallback (round 6): the
  * same full-table aggregation over a table whose EVERY bucket carries a
  * small delta — the steady-ingest worst case for the old shape, which
  * shuffled+sorted every base row. Arms differ only in
  * `spark.graft.mor.deltaBroadcastBytes` (default → broadcast joins;
  * 0 → the pre-r6 window over base ∪ deltas). min-of-3 per arm, tmpfs.
  * `PROBE_EVENTS` scales the base (default 2M rows, ~1/20 delta).
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val root = "/dev/shm/graft-bench"
    Files.createDirectories(Paths.get(root))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Shuffle-byte accounting: wall time on tmpfs/local barely prices an
    // exchange (no network, page-cached reads) — bytes exchanged is the
    // number that scales with the cluster, so the probe reports both.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val scanBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          scanBytes.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
        }
      })

    val nBase = sys.env.getOrElse("PROBE_EVENTS", "2000000").toLong
    val work = Files.createTempDirectory(Paths.get(root), "mor").toString
    val t = new LakeTable(spark, s"$work/t", numBuckets = 32)
    t.merge(TranscriptWal.synthetic(spark, nBase, 20000), "seed", 1)
    t.compactAll()
    // a small delta touching EVERY bucket (the steady-ingest shape)
    t.merge(TranscriptWal.synthetic(spark, nBase / 20, 20000,
      lsnOffset = 10L * nBase), "tail", 1)
    val dirty = t.currentSnapshot.get.buckets.values.count(_.deltas.nonEmpty)
    println(s"dirty-buckets=$dirty/32 base=$nBase delta=${nBase / 20}")

    def arm(tag: String, conf: Option[String]): Unit = {
      conf match {
        case Some(v) => spark.conf.set("spark.graft.mor.deltaBroadcastBytes", v)
        case None    => spark.conf.unset("spark.graft.mor.deltaBroadcastBytes")
      }
      val runs = (1 to 3).map { _ =>
        Thread.sleep(1200) // let listener events drain
        shuffleBytes.set(0); scanBytes.set(0)
        val t0 = System.nanoTime()
        // full-width live-state aggregation: forces every payload byte
        // through the arbitration shape under test
        t.read().agg(count(lit(1)), sum(length(col("text"))),
          approx_count_distinct(col("conv_id"))).collect()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1200) // let listener events drain
        (secs, shuffleBytes.get, scanBytes.get)
      }
      val best = runs.minBy(_._1)
      println(f"$tag%-16s min=${best._1}%6.2f s  shuffleMB=${best._2 / 1e6}%8.1f  scanMB=${best._3 / 1e6}%8.1f  runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    arm("warmup", None)
    arm("mor-broadcast", None)      // r6 shape: deltas windowed, base joined
    arm("mor-window", Some("0"))    // pre-r6 shape: window over base ∪ deltas
    arm("mor-broadcast2", None)     // order-independence check
    arm("mor-window2", Some("0"))
    spark.stop()
  }
}
