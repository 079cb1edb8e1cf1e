package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Bench

/** The Bench query phase alone (same session shape), for iteration. */
object BenchQueries {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("benchq")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.minPartitionNum", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // tmpfs like Bench: the VM's virtio disk throttles unpredictably, and
      // a disk-backed shuffle/spill measures the disk, not the query
      .config("spark.local.dir", s"${Bench.benchRoot}/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.toSet
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
        // best-of-2, exactly like Bench's query stretch
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = try fn(spark, dir).count() catch { case e: Throwable =>
            println(s"BQ ERROR $name: ${e.getMessage.take(120)}"); -1L }
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (sec, n) = runs.minBy(_._1)
        println(f"BQ $name%-22s $sec%7.3f s rows=$n")
        sec
      }
    println(f"BQ TOTAL ${results.sum}%.2f s")
    spark.stop()
  }
}
