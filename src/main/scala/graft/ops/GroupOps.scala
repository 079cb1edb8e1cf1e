package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered per-group operators that genuinely need sequential state — the
  * SURVEY §2.5 W6/W10 rows the window kernel cannot express. Carrier is
  * `groupByKey(...).flatMapSortedGroups(...)`: the intra-group order comes
  * from the shuffle's secondary sort (no in-memory group materialization),
  * and the scan state is O(lookback)/O(1), so a 10^7-turn hot conversation
  * streams through one task without buffering.
  */
object GroupOps {

  /** W6 — bounded-lookback adjacency link (reference: ListProcessor.java:
    * 167-222 scans back a capped interval list to attach continuations).
    * Links each turn to the most recent PRIOR turn with the same role within
    * the last `lookback` rows; -1 if none. Output:
    * (conv_id, turn_idx, role, link_idx).
    */
  def linkSameRole(df: DataFrame, lookback: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("conv_id"), col("turn_idx").cast("int"), col("role"))
      .as[(String, Int, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("turn_idx")) { (conv, it) =>
        var recent = List.empty[(Int, String)] // newest first, ≤ lookback
        it.map { case (_, idx, role) =>
          val link = recent.find(_._2 == role).map(_._1).getOrElse(-1)
          recent = ((idx, role) :: recent).take(lookback)
          (conv, idx, role, link)
        }
      }
      .toDF("conv_id", "turn_idx", "role", "link_idx")
  }

  /** W10 — greedy span clustering (reference: TableStructureNormalizer.java:
    * 157-225 greedily merges rows into clusters anchored at the cluster
    * head). A turn joins the current cluster while its timestamp is within
    * `spanMicros` of the CLUSTER START — not of the previous row, which is
    * what makes this non-window-expressible (the boundary depends on running
    * state, not a fixed frame). Output:
    * (conv_id, turn_idx, ts_micros, cluster_id).
    */
  def greedyCluster(df: DataFrame, spanMicros: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("conv_id"), col("turn_idx").cast("int"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .as[(String, Int, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("tsu"), col("turn_idx")) { (conv, it) =>
        var cid = -1L
        var start = Long.MinValue
        it.map { case (_, idx, ts) =>
          if (cid < 0 || ts - start > spanMicros) { cid += 1; start = ts }
          (conv, idx, ts, cid)
        }
      }
      .toDF("conv_id", "turn_idx", "ts_micros", "cluster_id")
  }
}
