package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics for the LSH pipeline cost structure. */
object LshCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.DedupOps
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
    val copies = d.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" tail marker")).as("text"))
    val corpus = d.unionAll(copies)
    val sigs = DedupOps.withMinHash(corpus).select(col("doc_id"), col("minhash"))
      .persist()
    sigs.count()
    val grp = sigs.groupBy(col("minhash"))
      .agg(min(col("doc_id")).as("rep")).persist()
    val r = 4
    val banded = grp.select(col("rep"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"), xxhash64(
          concat_ws(",", slice(col("minhash"), b * r + 1, r))).as("bh"))
      }: _*)).as("bb"))
      .select(col("rep"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      .persist()
    val sizes = banded.groupBy("band", "bh").count()
    sizes.select(max("count"), expr("percentile(count, 0.5)"),
      expr("percentile(count, 0.99)"), sum(col("count") * col("count")).as("sum_sq")).show(false)
    spark.stop()
  }
}
