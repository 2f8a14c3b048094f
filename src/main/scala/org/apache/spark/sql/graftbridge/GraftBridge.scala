package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}
import graft.plans.{TopKPerKeyNode, TopKStrategy}

/** Bridge into Spark's private[sql] Dataset constructor so the custom
  * TopKPerKey logical node is exposed as a DataFrame -> DataFrame operator.
  * Lives under org.apache.spark.sql.* for access scope only — the standard
  * pattern for Catalyst extension libraries.
  */
object GraftBridge {

  /** Exact top-k rows per key, ordered by `orderCol`. Registers the planner
    * strategy on first use (idempotent). */
  def topKPerKey(dfIn: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      keyCols: Seq[String], orderCol: String,
      k: Int, descending: Boolean = true): DataFrame = {
    val df = dfIn.asInstanceOf[DataFrame]
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val plan = df.queryExecution.analyzed
    val keyExprs = keyCols.map(c =>
      plan.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no column $c in ${plan.output}")))
    val ordAttr = plan.output.find(_.name == orderCol).getOrElse(
      throw new IllegalArgumentException(s"no column $orderCol"))
    val order = SortOrder(ordAttr, if (descending) Descending else Ascending)
    Dataset.ofRows(spark, TopKPerKeyNode(keyExprs, order, k, plan))
  }

  /** Wrap a raw Catalyst Expression as a user-facing Column (the classic
    * ExpressionUtils converter is private[sql] — hence this bridge). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Inverse: the Catalyst Expression behind a Column. */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
