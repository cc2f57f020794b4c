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
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "usage: kmv_distinct(hash_col, k) with literal k")
        // Bare AggregateFunction: the analyzer wraps it in an
        // AggregateExpression (and handles DISTINCT/FILTER) itself.
        KmvDistinctAgg(children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftasof.AsOfJoinStrategy)
  }
}
