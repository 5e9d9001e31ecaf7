package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Quality

/** Native Catalyst expression for the BPE-ish subword-piece count — the
  * scalar-kernel codegen route (custom `Expression` + `doGenCode`), per
  * the measured finding in BENCH.md that higher-order-function Column
  * chains are CodegenFallback and typed maps pay the encoder round-trip.
  * Same pattern as [[SimHash64Expr]], including the explicit `MODULE$`
  * call target (a bare object-method reference would be shadowed by the
  * inherited `eval` and janino would silently fall back).
  */
case class BpeCount32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeCount32Expr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.BpeCount32Expr$$.MODULE$$.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCount32Expr =
    copy(child = newChild)
}

object BpeCount32Expr {

  /** Shared entry for the interpreted and generated code paths. */
  def count(s: UTF8String): Int = Quality.bpeIshTokenCount(s.toString)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_count", exprs => BpeCount32Expr(exprs.head), "scala_udf")
}
