package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.SimHash

/** Native Catalyst expression for the 64-bit SimHash fingerprint.
  *
  * Preference order per the build brief: compose built-ins → custom
  * `Expression` → full plan nodes → mapPartitions. SimHash of a string is a
  * scalar function Spark lacks; as an `Expression` with `doGenCode` it
  * stays inside whole-stage codegen (a static call on the UTF8String, no
  * Scala-UDF serialization boundary, no Row boxing), unlike the
  * `Dataset.map` formulation.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expr.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHash64Expr.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  /** Static entry used by both interpreted and generated code paths. */
  def eval(s: UTF8String): Long = SimHash.simhash64(s.toString)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
}

/** SparkSessionExtensions hook: injects the function at session build time
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expr.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
        (exprs: Seq[Expression]) => SimHash64Expr(exprs.head)))
  }
}
