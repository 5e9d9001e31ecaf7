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
    SimHash64Expr.simhash(input.asInstanceOf[UTF8String])

  // NOTE the explicit MODULE$ form: a bare `SimHash64Expr.simhash(...)`
  // static-forwarder call does not exist on this class (the inherited
  // `eval(InternalRow)` suppressed forwarder generation for same-named
  // members and janino then failed compiling the generated code, silently
  // falling the whole stage back to interpreted mode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.SimHash64Expr$$.MODULE$$.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  /** Shared entry for the interpreted and generated code paths. */
  def simhash(s: UTF8String): Long = SimHash.simhash64(s.toString)

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
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_count"),
        new ExpressionInfo(classOf[BpeCount32Expr].getName, "bpe_count"),
        (exprs: Seq[Expression]) => BpeCount32Expr(exprs.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("fingerprint64"),
        new ExpressionInfo(classOf[Fingerprint64Expr].getName, "fingerprint64"),
        (exprs: Seq[Expression]) => Fingerprint64Expr(exprs.head)))
  }
}
