package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, TextOps}

/** Job-level decomposition of the LSH near-dup pipeline (diagnostics only). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("lshprobe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.minPartitionNum", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("/dev/shm/graft-bench/spark-local"))

    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties.getProperty("spark.job.description")).getOrElse("")
        jobStarts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
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

    def timed[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd ---")
      val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val copies = d.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail marker")).as("text"))
      val all = d.unionAll(copies)

      // === lshCandidates internals, bands=16, k=32, prefilterAgree=0.25 ===
      val bands = 16; val k = 32; val r = k / bands
      val sigs = DedupOps.minHashSignatures(all, "doc_id", k, 3)
      val grp = sigs.groupBy(col("minhash"))
        .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("ids"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("grp-count")(grp.count())
      val banded = grp.select(col("rep"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(lit(b) +: (0 until r).map(i =>
              element_at(col("minhash"), b * r + i + 1)): _*).as("bh"))
        }: _*)).as("bb"))
        .select(col("rep"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val kept = banded.withColumn("__bn",
          count(lit(1)).over(Window.partitionBy("band", "bh")))
        .where(col("__bn") <= 1000).drop("__bn")
      val l = kept.select(col("rep").as("ra"), col("band"), col("bh"))
      val rt = kept.select(col("rep").as("rb"), col("band"), col("bh"))
      val minAgree = math.ceil(0.25 * k).toInt
      val sigOf = grp.select(col("rep"), col("minhash"))
      val repPairs = l.join(rt, Seq("band", "bh"))
        .where(col("ra") <= col("rb"))
        .select("ra", "rb").distinct()
        .join(sigOf.select(col("rep").as("ra"), col("minhash").as("sa")), "ra")
        .join(sigOf.select(col("rep").as("rb"), col("minhash").as("sb")), "rb")
        .where(size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
          b => b)) >= minAgree)
        .select("ra", "rb")
      val out = repPairs
        .join(grp.select(col("rep").as("ra"), col("ids").as("ia")), "ra")
        .join(grp.select(col("rep").as("rb"), col("ids").as("ib")), "rb")
        .select(explode(col("ia")).as("a_id"), col("ib"))
        .select(col("a_id"), explode(col("ib")).as("b_id"))
        .where(col("a_id") =!= col("b_id"))
        .select(least(col("a_id"), col("b_id")).as("a_id"),
          greatest(col("a_id"), col("b_id")).as("b_id"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("cands-count")(out.count())
      grp.unpersist(blocking = false)

      // === jaccardVerify internals ===
      val p = out
      val needed = timed("needed-build") {
        p.select(col("a_id").as("doc_id"))
          .unionAll(p.select(col("b_id").as("doc_id"))).distinct()
      }
      val sh = all.join(needed, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val withA = p.join(sh.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("sh", "sh_a"), "a_id")
      val withB = withA.join(sh.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("sh", "sh_b"), "b_id")
      val ver = withB
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .where(col("inter") / col("uni") >= 0.5)
        .withColumn("jaccard", round(col("inter") / col("uni"), 6))
        .select("a_id", "b_id", "jaccard")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("verify-count")(ver.count())
      sh.unpersist(blocking = false)
      timed("final-filter-count")(
        ver.where(col("b_id") === col("a_id") + 100000)
          .orderBy("a_id", "b_id").count())
      out.unpersist(blocking = false)
      ver.unpersist(blocking = false)
    }
    spark.stop()
  }
}
