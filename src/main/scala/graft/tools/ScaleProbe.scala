package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.model.IngestConfig
import graft.stream.CdcIngestJob
import graft.wal.TranscriptWal

/** One-off diagnostic: measure CDC-replay throughput across core counts with
  * per-stage wall times, to pick the N vs 4N pair the bench publishes and to
  * find any stage that fails to scale. Not part of the driver contract.
  */
object ScaleProbe {
  val root = "/dev/shm/graft-probe"

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"probe-$cores")
      // Identical PLAN at every level: partition counts sized to the data,
      // concurrency is the only variable (cluster practice for a scale-up).
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.minPartitionNum", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  final class StageTimes extends SparkListener {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double, Long)]
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val i = e.stageInfo
      val sec = (for { a <- i.completionTime; b <- i.submissionTime } yield (a - b) / 1e3).getOrElse(-1.0)
      rows += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), sec, i.numTasks))
    }
  }

  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("PROBE_EVENTS", "4000000").toLong
    Files.createDirectories(Paths.get(root))
    val gen = session(32)
    val walDir = Files.createTempDirectory(Paths.get(root), "wal").toString + "/wal"
    TranscriptWal.synthetic(gen, nEvents, nConvs = 50000,
      hotConvShare = 0.05, dupFraction = 0.02, deleteFraction = 0.05)
      .repartition(64).write.parquet(walDir)
    val warmDir = Files.createTempDirectory(Paths.get(root), "wal").toString + "/warm"
    TranscriptWal.synthetic(gen, 100000, nConvs = 5000)
      .repartition(8).write.parquet(warmDir)
    gen.stop()

    val levels = sys.env.getOrElse("PROBE_LEVELS", "2,4,8,16,32").split(",").map(_.trim.toInt)
    val trialsPer = sys.env.getOrElse("PROBE_TRIALS", "2").toInt
    (1 to trialsPer).foreach { trial =>
      levels.foreach { cores =>
        val s = session(cores)
        // warmup
        locally {
          val work = Files.createTempDirectory(Paths.get(root), "w").toString
          CdcIngestJob.replayBatch(s, s.read.parquet(warmDir),
            IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
              numBuckets = 64, enforceWatermark = false, sanitize = true))
        }
        val lst = new StageTimes
        s.sparkContext.addSparkListener(lst)
        val work = Files.createTempDirectory(Paths.get(root), "m").toString
        val t0 = System.nanoTime()
        CdcIngestJob.replayBatch(s, s.read.parquet(walDir),
          IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
            numBuckets = 64, enforceWatermark = false, sanitize = true))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE trial=$trial cores=$cores%2d wall=$sec%7.2f s tput=${nEvents / sec}%8.0f ev/s")
        lst.rows.foreach { case (id, name, t, nt) =>
          println(f"  stage $id%3d tasks=$nt%3d $t%7.2f s  $name")
        }
        s.stop()
      }
    }
  }
}
