package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal Column ↔ Expression bridge. Spark 4's Connect refactor made the
  * classic conversion utilities `private[sql]`; extension libraries that ship
  * native Catalyst expressions conventionally expose them via a shim in the
  * `org.apache.spark.sql` package (same pattern as other Spark extension
  * projects).
  */
package object graftbridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Clone of a session: same SparkContext, COPIED session state (conf,
    * UDFs, experimental rules, listeners). Lets a library scope a SQLConf
    * override to its own jobs instead of mutating the caller's session.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Re-root a frame's logical plan into another session (of the same
    * SparkContext): actions on the result plan and run under THAT session's
    * conf. Resolution is already done; the plan re-wraps as-is.
    */
  def reroot(df: DataFrame, to: SparkSession): DataFrame =
    classic.Dataset.ofRows(to.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)

  /** DataFrame over a hand-built [[catalyst.plans.logical.LogicalPlan]] —
    * the entry point a library-level relation (e.g. a custom FileIndex
    * wrapped in a HadoopFsRelation) needs, made `private[sql]` by the
    * Connect refactor.
    */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
