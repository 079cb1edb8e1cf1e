package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.IngestConfig
import graft.ops.DedupOps
import graft.stream.CdcIngestJob
import graft.wal.TranscriptWal

/** Round-7 optimization probe: phase-level decomposition of the expensive
  * bench queries under the exact Bench session shape (local[32],
  * shuffle.partitions=64, minPartitionNum=64, AQE on). Diagnostics only.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("optprobe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.minPartitionNum", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("/dev/shm/graft-bench/spark-local"))

    if (sys.env.get("OPT_PROBE_JOBS").contains("1")) {
      val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties.getProperty("spark.job.description")).getOrElse("")
          jobStarts.put(js.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStarts.get(je.jobId)).foreach { case (t0, desc) =>
            println(f"  JOB ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1e3
          println(f"    STAGE ${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"wall=${wall.getOrElse(-1.0)}%7.3f s " +
            f"run=${si.taskMetrics.executorRunTime / 1e3}%7.3f s " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%7.3f s  ${si.name.take(60)}")
        }
      })
    }

    def timed[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val what = if (args.isEmpty) Set("cdc", "lsh") else args.toSet

    if (what("cdc")) (1 to 2).foreach { round =>
      println(s"--- cdc round $round ---")
      val work = Files.createTempDirectory(Paths.get("/dev/shm/graft-bench"), "op").toString
      val conf = IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
        numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(spark, dir)
      timed("wal-noop")(noop(wal))
      val table = timed("replayBatch")(CdcIngestJob.replayBatch(spark, wal, conf))
      timed("read-noop")(noop(table.read()))
      timed("read-select-orderBy-count") {
        table.read().select("conv_id", "turn_idx", "role", "text", "tool")
          .orderBy("conv_id", "turn_idx").count()
      }
    }

    if (what("sql")) (1 to 2).foreach { round =>
      println(s"--- sql round $round ---")
      val work = Files.createTempDirectory(Paths.get("/dev/shm/graft-bench"), "op").toString
      val conf = IngestConfig(tablePath = s"$work/lake/ns/t",
        checkpointPath = s"$work/cp", numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(spark, dir)
      val table = timed("replayBatch")(CdcIngestJob.replayBatch(spark, wal, conf))
      val mark = table.latestVersion.get
      val cat = s"gr${Math.abs(work.hashCode)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.lake.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", s"$work/lake")
      timed("sql-delete")(
        spark.sql(s"DELETE FROM $cat.ns.t WHERE role = 'user' AND turn_idx >= 3"))
      timed("sql-insert")(spark.sql(s"INSERT INTO $cat.ns.t VALUES " +
        "('zz_gone', 0, 'user', 'will be rolled back', NULL, TIMESTAMP'2024-06-01 00:00:00')"))
      timed("rollback")(
        spark.sql(s"CALL $cat.system.rollback(table => 'ns.t', version => $mark)"))
      timed("read-count") {
        table.read().select("conv_id", "turn_idx", "role", "text", "tool")
          .orderBy("conv_id", "turn_idx").count()
      }
    }

    if (what("merge")) (1 to 2).foreach { round =>
      println(s"--- merge round $round ---")
      val work = Files.createTempDirectory(Paths.get("/dev/shm/graft-bench"), "op").toString
      val conf = IngestConfig(tablePath = s"$work/lake/ns/t",
        checkpointPath = s"$work/cp", numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(spark, dir)
      val table = timed("replayBatch")(CdcIngestJob.replayBatch(spark, wal, conf))
      val cat = s"gm${Math.abs(work.hashCode)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.lake.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", s"$work/lake")
      val live = table.read()
      val src = timed("src-build") {
        live.where(col("role") === "user" && col("turn_idx") >= 3)
          .select(col("conv_id"), col("turn_idx"),
            lit(null).cast("string").as("new_text"), lit(null).cast("string").as("role"),
            lit(null).cast("string").as("tool"), lit(null).cast("timestamp").as("ts"),
            lit("D").as("src_op"))
          .unionByName(live.where(col("role") === "assistant" && col("turn_idx") === 1)
            .select(col("conv_id"), col("turn_idx"),
              concat(col("text"), lit(" [merged]")).as("new_text"),
              lit(null).cast("string").as("role"), lit(null).cast("string").as("tool"),
              lit(null).cast("timestamp").as("ts"), lit("U").as("src_op")))
          .unionByName(spark.sql(
            "SELECT 'zz_merge' AS conv_id, 0 AS turn_idx, 'merged in' AS new_text, " +
              "'user' AS role, CAST(NULL AS STRING) AS tool, " +
              "TIMESTAMP'2024-06-01 00:00:00' AS ts, 'I' AS src_op"))
      }
      src.createOrReplaceTempView("mrgsrc")
      timed("merge-stmt")(spark.sql(
        s"""MERGE INTO $cat.ns.t t USING mrgsrc s
           |  ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
           |  WHEN MATCHED AND s.src_op = 'D' THEN DELETE
           |  WHEN MATCHED AND s.src_op = 'U' THEN UPDATE SET text = s.new_text
           |  WHEN NOT MATCHED AND s.src_op = 'I' THEN
           |    INSERT (conv_id, turn_idx, role, text, tool, ts)
           |    VALUES (s.conv_id, s.turn_idx, s.role, s.new_text, s.tool, s.ts)
           |""".stripMargin))
      timed("read-count") {
        table.read().select("conv_id", "turn_idx", "role", "text", "tool")
          .orderBy("conv_id", "turn_idx").count()
      }
    }

    if (what("changes")) (1 to 2).foreach { round =>
      println(s"--- changes round $round ---")
      val work = Files.createTempDirectory(Paths.get("/dev/shm/graft-bench"), "op").toString
      val wal = TranscriptWal.fromEvents(spark, dir).cache()
      val Array(lo, hi) = wal.agg(min(col("lsn")), max(col("lsn")))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      val split = Math.floorDiv(lo + hi, 2L)
      val t = new graft.lake.LakeTable(spark, s"$work/t", numBuckets = 16)
      timed("merge-1")(t.merge(wal.where(col("lsn") < split), "t", 1))
      timed("merge-2")(t.merge(wal.where(col("lsn") >= split), "t", 2))
      wal.unpersist()
      timed("changesSince-count") {
        t.changesSince(1)
          .select(col("conv_id"), col("turn_idx"), col("op"),
            col("_lsn").as("lsn"), col("role"), col("text"),
            col("_commit_version").as("commit_version"))
          .orderBy("conv_id", "turn_idx", "lsn", "op").count()
      }
      timed("timetravel-count") {
        t.readAsOf(1).select("conv_id", "turn_idx", "role", "text")
          .orderBy("conv_id", "turn_idx").count()
      }
    }

    if (what("dsv2")) (1 to 2).foreach { round =>
      println(s"--- dsv2 round $round ---")
      val work = Files.createTempDirectory(Paths.get("/dev/shm/graft-bench"), "op").toString
      val conf = IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
        numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(spark, dir)
      val table = timed("replayBatch")(CdcIngestJob.replayBatch(spark, wal, conf))
      timed("compactAll")(table.compactAll())
      timed("dsv2-read-count") {
        spark.read.format("graftlake").load(table.path)
          .select("conv_id", "turn_idx", "role", "text", "tool")
          .orderBy("conv_id", "turn_idx").count()
      }
    }

    if (what("lsh")) (1 to 2).foreach { round =>
      println(s"--- lsh round $round ---")
      val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val copies = d.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail marker")).as("text"))
      val all = d.unionAll(copies)
      if (round == 1) {
        println("=== minHashSignatures optimized plan ===")
        println(DedupOps.minHashSignatures(all, "doc_id", 32, 3)
          .queryExecution.optimizedPlan.treeString.take(4000))
      }
      val out = timed("nearDuplicates")(
        DedupOps.nearDuplicates(all, threshold = 0.5, bands = 16))
      timed("final-filter-count")(
        out.where(col("b_id") === col("a_id") + 100000)
          .orderBy("a_id", "b_id").count())
      out.unpersist(blocking = false)
    }

    spark.stop()
  }
}
