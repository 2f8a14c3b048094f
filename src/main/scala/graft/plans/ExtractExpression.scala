package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression wrapper for the extraction kernel — the
  * optional-polish path named in SURVEY.md §4: explicit null handling and
  * `CodegenFallback` (the kernel is a black box to codegen, but staying an
  * `Expression` keeps it inside the Project so column pruning, filter
  * pushdown around it, and WholeStageCodegen of the surrounding operators
  * all hold; a plain Scala UDF achieves the same plan shape, this variant
  * removes the UDF encoder/decoder hop for the String output path).
  *
  * Null semantics mirror the kernel's R1 error isolation: a null html falls
  * back to the text column; both null -> empty string (never null output,
  * never a thrown error).
  */
case class ExtractText(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_extract_text"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, STRING), got (${left.dataType}, ${right.dataType})")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val html = left.eval(input)
    val text = right.eval(input)
    val textStr = if (text == null) "" else text.toString
    val htmlBytes = if (html == null) Array.emptyByteArray else html.asInstanceOf[Array[Byte]]
    UTF8String.fromString(
      graft.extract.Extractor.extract(htmlBytes, textStr).extractedText)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExtractText =
    copy(left = newLeft, right = newRight)
}

object ExtractText {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ExtractText].getName, null, "graft_extract_text",
    "_FUNC_(html, text) - main-content extraction of an html/pdf binary " +
      "payload, falling back to the text column.", "")

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_extract_text(html, text) takes 2 arguments")
    ExtractText(exprs.head, exprs(1))
  }

  /** Register on an existing session (tests / notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_extract_text", builder, "built-in")
}

/** spark-submit registration hook:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_extract_text"),
      ExtractText.info, ExtractText.builder))
    ext.injectFunction((FunctionIdentifier("graft_fix_url"),
      FixUrl.info, FixUrl.builder))
  }
}
