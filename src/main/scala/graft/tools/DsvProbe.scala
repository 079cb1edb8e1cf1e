package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.wal.TranscriptWal

/** Measures the SQL-read paths over ONE compacted lake (tmpfs):
  *   - v1 bridge: `CREATE TEMP VIEW ... USING graftlake` → PrunedFilteredScan
  *     (.rdd Row boundary — the round-3 connector's only path)
  *   - DSv2: `spark.read.format("graftlake")` → delegated vectorized
  *     parquet BatchScan (round 4)
  *   - engine: `LakeTable.read()` (Scala MOR plan, the in-process baseline)
  * Workload: full-scan aggregate sum(length(text)) — scan-dominated, no
  * shuffle, so the scan boundary is what's measured. min-of-3 per path.
  */
object DsvProbe {
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

    val nEvents = sys.env.getOrElse("PROBE_EVENTS", "4000000").toLong
    val work = Files.createTempDirectory(Paths.get(root), "dsv").toString
    val t = new LakeTable(spark, s"$work/t", numBuckets = 32)
    t.merge(TranscriptWal.synthetic(spark, nEvents, 50000), "p", 1)
    t.compactAll()

    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW v1lake USING graftlake " +
      s"OPTIONS (path '${t.path}')")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(sum(length(col("text")))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-12s min=${secs.min}%6.2f s  runs=${secs.map(s => f"$s%.2f").mkString(",")}")
    }
    time("engine")(t.read())
    time("dsv2")(spark.read.format("graftlake").load(t.path))
    time("v1-bridge")(spark.table("v1lake"))

    // COUNT(*): with aggregate pushdown the DSv2 path answers from footers
    // (metadata), the v1 bridge must materialize every row
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    def timeCount(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-12s min=${secs.min}%6.3f s  runs=${secs.map(s => f"$s%.3f").mkString(",")}")
    }
    timeCount("count-dsv2")(spark.read.format("graftlake").load(t.path))
    timeCount("count-v1")(spark.table("v1lake"))

    // DIRTY-TABLE phase (VERDICT-r5 #4): price the row-mode V1Scan bridge
    // on a table where EVERY bucket carries deltas — the worst case between
    // ingest and compaction. `engine-dirty` is the arbitration plan run
    // directly; `dsv2-dirty` is the same plan behind the DSv2 V1Scan bridge,
    // so (dsv2-dirty − engine-dirty) isolates the bridge's Row-boundary +
    // lost-codegen-fusion cost from the inherent merge-on-read window.
    val updFrac = sys.env.getOrElse("PROBE_DIRTY_FRAC", "50").toLong // 1/50 = 2%
    t.merge(TranscriptWal.synthetic(spark, nEvents / updFrac, 50000,
      lsnOffset = 10L * nEvents), "p", 2)
    val dirty = t.currentSnapshot.get.buckets.count(_._2.deltas.nonEmpty)
    println(s"dirty buckets: $dirty / 32 (update fraction 1/$updFrac)")
    time("engine-dirty")(t.read())
    time("dsv2-dirty")(spark.read.format("graftlake").load(t.path))
    time("v1-dirty")(spark.table("v1lake"))
    spark.stop()
  }
}
