package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Cold-run cost structure of q_near_dup_lsh: per-stage wall + gaps. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("cgprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t00 = System.nanoTime()
    @volatile var lastEnd = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val sub = i.submissionTime.getOrElse(0L)
        val fin = i.completionTime.getOrElse(0L)
        val gap = if (lastEnd == 0) 0.0 else (sub - lastEnd) / 1e3
        lastEnd = math.max(lastEnd, fin)
        println(f"CGSTAGE id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"run=${(fin - sub) / 1e3}%6.2f s gapBefore=$gap%6.2f s")
      }
    })
    val n = graft.SparkEntry.queries("q_near_dup_lsh")(spark, "/root/testdata/sf0.1").count()
    println(f"CGPROBE total ${(System.nanoTime() - t00) / 1e9}%7.2f s rows=$n")
    spark.stop()
  }
}
