package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates which Spark layer fails to scale on this box: pure codegen
  * compute, shuffle, parquet write, parquet read.
  * Run: `sbt "runMain graft.tools.ScalingProbe"`.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    Seq(8, 32).foreach { cores =>
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName(s"probe$cores").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def timed(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime(); f
        println(f"PROBE cores=$cores $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      val work = Files.createTempDirectory(s"probe$cores").toString
      // warmup
      spark.range(1000000).select(sum(pmod(xxhash64(col("id")), lit(1000)))).collect()
      timed("compute") {
        spark.range(200000000L).select(sum(pmod(xxhash64(col("id"), lit("x")), lit(1000)))).collect()
      }
      val df = spark.range(4000000L).select(col("id"),
        concat(lit("payload "), xxhash64(col("id")).cast("string"),
          lit(" tail tail tail")).as("s"))
      timed("shuffle") {
        df.repartition(64, col("id")).groupBy(pmod(col("id"), lit(1000)))
          .agg(count(lit(1))).collect()
      }
      timed("pq-write") { df.repartition(64).write.parquet(s"$work/pq") }
      timed("pq-read") { spark.read.parquet(s"$work/pq").select(sum(length(col("s")))).collect() }
      spark.stop()
    }
  }
}
