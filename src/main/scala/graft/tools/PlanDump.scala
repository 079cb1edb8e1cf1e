package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to files:
  * `sbt "runMain graft.tools.PlanDump <outDir> <tag> q1 q2 ..."` writes
  * `<outDir>/<query>_<tag>.txt`. Bench session shape (local[32],
  * shuffle.partitions=64, minPartitionNum=64, AQE on) so the dumped plans
  * are the ones the bench runs (pre-execution AQE plans).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("plandump")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.minPartitionNum", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
        println(s"PLAN $name -> $outDir/${name}_$tag.txt")
      } catch { case e: Throwable =>
        println(s"PLAN $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
