package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Hash60Expr, KmvDistinctAgg}

/** Session extensions registering the engine's native expressions with
  * the SQL function registry, so `spark.sql("SELECT hash60(text) ...")`
  * works alongside the Column API (the brief's extension mechanism:
  * custom Catalyst surface wired via `SparkSessionExtensions`).
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (done by [[GraftSession]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "hash60"),
      (children: Seq[Expression]) => Hash60Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinctAgg].getName, "kmv_distinct"),
      GraftExtensions.kmvBuilder))
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftasof.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.GraftNativeRewrite)
  }
}

object GraftExtensions {
  /** SQL builder for `kmv_distinct(hash_col, k)`. A NULL or
    * non-integral k must fail as a clean analysis-time error with the
    * usage string, not an executor NPE/ClassCastException. Returns the
    * bare AggregateFunction: the analyzer wraps it in an
    * AggregateExpression (and handles DISTINCT/FILTER) itself. */
  private[graft] def kmvBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2 && children(1).foldable,
      "usage: kmv_distinct(hash_col, k) with literal k")
    val k = children(1).eval() match {
      case n: java.lang.Byte    => n.intValue()
      case n: java.lang.Short   => n.intValue()
      case n: java.lang.Integer => n.intValue()
      case n: java.lang.Long if n.longValue() == n.intValue() => n.intValue()
      case bad => throw new IllegalArgumentException(
        s"usage: kmv_distinct(hash_col, k) with a non-null integral k; got $bad")
    }
    KmvDistinctAgg(children.head, k)
  }
}
