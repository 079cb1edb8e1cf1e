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

  /** Re-root a batch DataFrame as a STREAMING one (isStreaming=true): the
    * contract `Source.getBatch` must satisfy — MicroBatchExecution asserts
    * the returned plan is streaming. Same pattern as Spark's own v1 sources
    * (they call the private[sql] `internalCreateDataFrame`).
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
