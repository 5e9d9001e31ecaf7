package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Fingerprint

/** Native Catalyst expression for the 64-bit rolling document fingerprint
  * — same scalar-kernel codegen pattern as [[SimHash64Expr]] /
  * [[BpeCount32Expr]] (explicit `MODULE$` call target; see those files).
  */
case class Fingerprint64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint64Expr.fp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.Fingerprint64Expr$$.MODULE$$.fp($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64Expr =
    copy(child = newChild)
}

object Fingerprint64Expr {

  /** Shared entry for the interpreted and generated code paths. */
  def fp(s: UTF8String): Long = Fingerprint.rolling64(s.toString)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64Expr(exprs.head), "scala_udf")
}
