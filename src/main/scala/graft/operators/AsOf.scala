package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftasof.{AsOfJoin, AsOfJoinStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Public API for the custom as-of join (see
  * [[org.apache.spark.sql.graftasof.AsOfJoinPlan]] for semantics and the
  * physical design). Column names must be disjoint between the two
  * sides (alias the right side first — same contract as `join` with a
  * `using` column would otherwise blur). */
object AsOf {

  /** Left as-of join: every `left` row, extended with the `right` row
    * sharing `rightKey` whose `rightTs` is the greatest value ≤
    * `leftTs` (backward, the default) or the smallest value ≥ `leftTs`
    * (`forward = true`); null-extended when none exists. */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    // Self-register the planner strategy so any session can use the
    // operator (GraftExtensions also injects it for sessions built with
    // spark.sql.extensions).
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))
    require(lPlan.output.map(_.name).toSet.intersect(rPlan.output.map(_.name).toSet).isEmpty,
      "as-of join requires disjoint column names; alias the right side")
    Bridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs), forward))
  }
}
