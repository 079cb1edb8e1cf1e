package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, exprOf}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hamming distance between two 64-bit SimHash
  * signatures — `popcount(a XOR b)`. SURVEY §2.10's "hot scorers as custom
  * Expression with codegen": this sits in the inner loop of the SimHash
  * near-dup join (every candidate pair), so it gets `doGenCode` that emits a
  * single `Long.bitCount` call inside whole-stage codegen — no UDF
  * serialization, no boxing.
  */
case class Hamming64(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming64 expects (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming64"
}

object Hamming64 {
  /** Column-API entry point (Spark 4: Column ↔ Expression via bridge). */
  def hamming64(a: Column, b: Column): Column =
    columnOf(Hamming64(exprOf(a), exprOf(b)))
}
