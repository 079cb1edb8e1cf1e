package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** One-off measurement of ANN recall@k vs brute force on the embeddings
  * fixture, across index parameters — used to set the regression-gate
  * thresholds in TrainingOpsSpec at measured-minus-margin levels.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 25)
    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
    val brute = pairs(SimilarityOps.bruteForceTopK(e, q, k))
    for ((bits, mp) <- Seq((4, 4), (6, 6), (8, 8), (4, 0), (6, 0)))
      println(f"LSH bits=$bits mp=$mp recall=${
        pairs(SimilarityOps.lshTopK(e, q, k, bits = bits, multiProbe = mp))
          .intersect(brute).size.toDouble / brute.size}%.3f")
    for ((nlist, nprobe) <- Seq((16, 8), (16, 4), (8, 4)))
      println(f"IVF nlist=$nlist nprobe=$nprobe recall=${
        pairs(SimilarityOps.ivfTopK(e, q, k, nlist = nlist, nprobe = nprobe))
          .intersect(brute).size.toDouble / brute.size}%.3f")
    spark.stop()
  }
}
