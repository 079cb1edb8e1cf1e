package graft

import org.apache.spark.sql.SparkSession

import graft.model.IngestConfig
import graft.stream.CdcIngestJob

/** spark-submit entrypoint: `spark-submit --class graft.Main <jar> ingest
  * --wal DIR --table DIR --checkpoint DIR [--buckets N] [--watermark '1 hour']
  * [--sanitize] [--drop-boilerplate] [--max-files-per-trigger N]
  * [--no-watermark] [--format parquet|json]
  * [--follow [interval]] [--for-seconds N]`
  *
  * Default ingest drains the WAL dir and exits (resumable catch-up).
  * `--follow` keeps tailing for new files on a ProcessingTime trigger
  * (default cadence '2 seconds', or pass one: `--follow '10 seconds'`);
  * stop with SIGTERM/Ctrl-C — a shutdown hook stops the query gracefully
  * (the in-flight epoch completes; checkpoint + epoch manifest resume
  * exactly-once). `--for-seconds N` bounds a follow run (demos, tests).
  *
  * Also: `compact --table DIR [--gc-below-lsn N]`, `vacuum --table DIR
  * [--keep N]`, `history --table DIR` (one JSON line per retained commit,
  * newest first), `delete --table DIR --where 'SQL bool expr'` (tombstone
  * merge of matching live rows), `rollback --table DIR --version V`
  * (restore an earlier retained version as a NEW diff commit — the reversal
  * flows through the change feed), `rebucket --table DIR --target DIR
  * --buckets N`, and
  * `mirror --source DIR --target DIR --checkpoint DIR [--buckets N]
  * [--starting-version V] [--follow [interval]] [--for-seconds N]` —
  * lake→lake replication over the streaming change feed: offsets are source
  * snapshot versions and the target's epoch manifest dedups, so kill/rerun
  * resumes exactly-once; default drains available commits and exits.
  * Every documented flag is exercised by the CLI smoke test (MainSpec).
  * The session comes from spark-submit (master/executors configured there);
  * local runs default to local[*].
  */
object Main {

  private def parseArgs(args: Seq[String]): Map[String, String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case flag :: tail if flag.startsWith("--") =>
          tail match {
            case v :: t2 if !v.startsWith("--") => loop(t2, acc + (flag.drop(2) -> v))
            case _ => loop(tail, acc + (flag.drop(2) -> "true"))
          }
        case _ :: tail => loop(tail, acc)
      }
    loop(args.toList, Map.empty)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: ingest|mirror|compact|vacuum|history|delete|rollback|rebucket [--flags]")
    val cmd = args(0)
    val a = parseArgs(args.drop(1).toSeq)
    def req(k: String): String =
      a.getOrElse(k, sys.error(s"missing required flag --$k"))

    // Embedded use (tests, notebooks) must not have its session torn down by
    // a CLI call — only stop a session this entrypoint itself created.
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val builder = SparkSession.builder()
      .appName(s"graft-$cmd")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit provides spark.master; bare JVM runs fall back to local
    if (!sys.props.contains("spark.master")) builder.master("local[*]")
    val spark = builder.getOrCreate()

    try cmd match {
      case "ingest" =>
        val conf = IngestConfig(
          tablePath = req("table"),
          checkpointPath = req("checkpoint"),
          numBuckets = a.getOrElse("buckets", "64").toInt,
          watermarkDelay = a.getOrElse("watermark", "1 hour"),
          enforceWatermark = !a.contains("no-watermark"),
          sanitize = a.contains("sanitize"),
          flagBoilerplate = a.contains("drop-boilerplate"),
          maxFilesPerTrigger = a.getOrElse("max-files-per-trigger", "8").toInt,
          walFormat = a.getOrElse("format", "parquet"),
          followInterval = a.get("follow")
            .map(v => if (v == "true") "2 seconds" else v))
        val (q, metrics) = CdcIngestJob.startWithMetrics(spark, req("wal"), conf)
        if (conf.followInterval.isDefined) {
          // graceful stop on SIGTERM/Ctrl-C: finish the in-flight epoch,
          // then exit — the next start resumes from the checkpoint
          Runtime.getRuntime.addShutdownHook(new Thread(() =>
            try q.stop() catch { case _: Throwable => () }))
          a.get("for-seconds") match {
            case Some(secs) =>
              if (!q.awaitTermination(secs.toLong * 1000L)) q.stop()
              q.awaitTermination()
            case None => q.awaitTermination()
          }
        } else q.awaitTermination()
        println(s"""{"eventsApplied":${metrics.eventsApplied},"lateDrops":${metrics.lateDrops}}""")
      case "mirror" =>
        import org.apache.spark.sql.functions.col
        val follow = a.get("follow").map(v => if (v == "true") "2 seconds" else v)
        val target = new graft.lake.LakeTable(spark, req("target"),
          a.getOrElse("buckets", "64").toInt)
        val applied = new java.util.concurrent.atomic.LongAdder
        val reader = spark.readStream.format("graftlake")
          .option("path", req("source"))
          .option("startingVersion", a.getOrElse("starting-version", "0"))
        // bound a deep catch-up's batches (replication admission control)
        a.get("max-versions-per-trigger")
          .foreach(reader.option("maxVersionsPerTrigger", _))
        val q = reader.load()
          .writeStream
          .option("checkpointLocation", req("checkpoint"))
          .trigger(follow match {
            case Some(iv) => org.apache.spark.sql.streaming.Trigger.ProcessingTime(iv)
            case None     => org.apache.spark.sql.streaming.Trigger.AvailableNow()
          })
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val base = b.withColumnRenamed("_lsn", "lsn").drop("_commit_version")
            val batch = // watermark column: event time when present
              if (base.columns.contains("ts")) base.withColumn("commit_ts", col("ts"))
              else base.withColumn("commit_ts",
                org.apache.spark.sql.functions.lit(null).cast("timestamp"))
            // retry, not bare merge: concurrent maintenance on the target
            // must cost a retry, never kill the replication query
            val r = target.mergeWithRetry(batch, s"mirror-${req("checkpoint")}", id)
            applied.add(r.events)
            ()
          }
          .start()
        if (follow.isDefined) {
          Runtime.getRuntime.addShutdownHook(new Thread(() =>
            try q.stop() catch { case _: Throwable => () }))
          a.get("for-seconds") match {
            case Some(secs) =>
              if (!q.awaitTermination(secs.toLong * 1000L)) q.stop()
              q.awaitTermination()
            case None => q.awaitTermination()
          }
        } else q.awaitTermination()
        println(s"""{"mirrored":true,"eventsApplied":${applied.sum()},""" +
          s""""targetVersion":${target.latestVersion.getOrElse(-1L)}}""")
      case "delete" =>
        // tombstone-merge DELETE: --where takes a SQL boolean expression
        // over the payload columns, evaluated on the arbitrated live state
        val t = graft.lake.LakeTable.open(spark, req("table"))
        val n = t.deleteWhere(org.apache.spark.sql.functions.expr(req("where")))
        println(s"""{"deleted":$n,"version":${t.latestVersion.getOrElse(-1L)}}""")
      case "rollback" =>
        // restore an earlier version AS A NEW COMMIT (diff-based; the
        // reversal is change-feed visible, history keeps every generation)
        val t = graft.lake.LakeTable.open(spark, req("table"))
        val r = t.rollbackTo(req("version").toLong)
        println(s"""{"restoredVersion":${req("version")},"newVersion":${r.version},""" +
          s""""upserts":${r.upserts},"deletes":${r.deletes}}""")
      case "history" =>
        // ops surface: one JSON line per retained commit, newest first
        val t = graft.lake.LakeTable.open(spark, req("table"))
        t.history().toJSON.collect().foreach(println)
      case "compact" =>
        val t = graft.lake.LakeTable.open(spark, req("table"))
        t.compactAll(a.get("gc-below-lsn").map(_.toLong))
        println(s"""{"compacted":true,"version":${t.latestVersion.getOrElse(-1L)}}""")
      case "vacuum" =>
        val t = graft.lake.LakeTable.open(spark, req("table"))
        val (snaps, files) = t.vacuum(a.getOrElse("keep", "2").toInt,
          retainAgeMs = a.get("retain-age-ms").map(_.toLong))
        println(s"""{"snapshotsDeleted":$snaps,"dataFilesDeleted":$files}""")
      case "rebucket" =>
        val t = graft.lake.LakeTable.open(spark, req("table"))
        // --buckets is the documented flag; --new-buckets kept as an alias
        val nb = a.get("buckets").orElse(a.get("new-buckets"))
          .getOrElse(sys.error("missing required flag --buckets")).toInt
        val target = t.rebucket(req("target"), nb)
        println(s"""{"rebucketed":true,"target":"${target.path}","numBuckets":${target.numBuckets}}""")
      case other => sys.error(s"unknown command: $other")
    } finally if (!preExisting) spark.stop()
  }
}
