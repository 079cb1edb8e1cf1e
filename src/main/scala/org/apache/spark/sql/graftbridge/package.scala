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
}
