package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conditional routing (SURVEY §3.3): the reference's hybrid triage scores
  * each page through a priority cascade and routes it to the java or backend
  * pipeline (hybrid/TriageProcessor.java:648-706). Spark-first: the cascade
  * is a single `when` chain producing a `route` column; the branches are two
  * plan subtrees over the SAME scan, unioned back — no second pass over the
  * data, no driver-side routing loop.
  */
object Route {

  /** Priority cascade over per-conversation signals — first match wins,
    * mirroring the reference's ordered signal list (two reference signals are
    * deliberately disabled after FP experiments; config-driven here too).
    */
  def triage(events: DataFrame,
             deleteHeavy: Double = 0.3,
             updateStorm: Long = 100,
             boilerplateMin: Int = 12): DataFrame = {
    val perConv = events.groupBy("conv_id").agg(
      count(lit(1)).as("n"),
      count(when(col("op") === "D", 1)).as("dels"),
      countDistinct(col("turn_idx")).as("turns"),
      max(col("lsn")).as("max_lsn"))
    perConv.withColumn("route",
      when(col("dels") / col("n") > deleteHeavy, lit("quarantine"))
        .when(col("n") > updateStorm && col("turns") < col("n") / 10, lit("review"))
        .otherwise(lit("fast")))
  }

  /** Every route the cascade can emit — Route.apply requires a branch (or the
    * default passthrough) for each, so no routed event can silently vanish.
    */
  val allRoutes: Set[String] = Set("quarantine", "review", "fast")

  /** Route + per-branch transform + union: each branch is a lazy plan over
    * the shared routed frame; Catalyst collapses the scan. Routes without an
    * entry in `branches` pass through unchanged (identity branch) — a
    * quarantine-routed conversation must never disappear because the caller
    * forgot the branch. No broadcast hint on the routed side: it is one row
    * per conv_id (unbounded at 10^8 conversations); AQE broadcasts iff small.
    */
  def apply(events: DataFrame,
            branches: Map[String, DataFrame => DataFrame]): DataFrame = {
    require(branches.keySet.subsetOf(allRoutes),
      s"unknown routes: ${branches.keySet -- allRoutes}")
    val exhaustive = allRoutes.map(r =>
      r -> branches.getOrElse(r, identity[DataFrame] _)).toMap
    val routed = triage(events)
    val withRoute = events.join(routed.select("conv_id", "route"), "conv_id")
    exhaustive.map { case (route, f) =>
      f(withRoute.where(col("route") === route))
    }.reduce(_ unionByName _)
  }
}
