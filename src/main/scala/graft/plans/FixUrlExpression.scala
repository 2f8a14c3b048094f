package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** X1 `fix_url` as a NATIVE codegen expression (the (b)-tier extension in
  * SURVEY §2.2: custom Expression WITH doGenCode, one step beyond
  * ExtractText's CodegenFallback). The generated code is a static call —
  * the same shape Spark's own string built-ins emit — so the expression
  * stays inside WholeStageCodegen with no interpreted-eval row boundary
  * and no UDF encoder hop.
  */
case class FixUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_url"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    FixUrl.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FixUrl.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): FixUrl =
    copy(child = newChild)
}

object FixUrl {
  /** Static entry point referenced by the generated code. */
  def fix(u: UTF8String): UTF8String =
    if (u == null) null
    else UTF8String.fromString(graft.extract.UrlFix.fixUrl(u.toString))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FixUrl].getName, null, "graft_fix_url",
    "_FUNC_(url) - normalizes a raw href the way the hyperlink relation " +
      "does (mailto:, https:// scheme inference, passthrough otherwise).", "")

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_fix_url(url) takes 1 argument")
    FixUrl(exprs.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fix_url", builder, "built-in")
}
