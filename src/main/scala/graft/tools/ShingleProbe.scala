package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Is the tokens projection surviving CollapseProject, and what does the
  * shingle expression actually cost? (diagnostics only)
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("shingleprobe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val twoStep = d.repartition(32, col("doc_id"))
      .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("__toks"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("__toks"), 3).as("sh"))
    println("=== twoStep optimized plan ===")
    println(twoStep.queryExecution.optimizedPlan.treeString.take(3000))

    val inline = d.repartition(32, col("doc_id"))
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))

    (1 to 2).foreach { i =>
      timed(s"inline-$i")(noop(inline))
      timed(s"twoStep-$i")(noop(twoStep))
      timed(s"tokens-only-$i")(noop(d.repartition(32, col("doc_id"))
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("t"))))
      timed(s"size-only-$i")(noop(d.repartition(32, col("doc_id"))
        .select(col("doc_id"), size(TextOps.tokens(lower(col("text")))).as("n"))))
    }
    spark.stop()
  }
}
