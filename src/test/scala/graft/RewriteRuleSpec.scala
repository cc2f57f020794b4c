package graft

import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProductExpr, Hash60Expr, TextFunctions, VectorFunctions}
import graft.plans.GraftNativeRewrite

/** The injected optimizer rule ([[GraftNativeRewrite]]): declarative
  * hot-path idioms rewritten to the native expressions, with the
  * soundness guards proven BOTH ways — the rule fires on the exact
  * pattern and leaves unprovable shapes alone. The rule is applied
  * directly to optimized plans (the shared test session cannot reload
  * `spark.sql.extensions`); the injection itself is asserted via
  * [[Bridge.optimizerRules]]. */
class RewriteRuleSpec extends AnyFunSuite with SparkSpec {

  private def rewrite(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    GraftNativeRewrite(df.queryExecution.optimizedPlan)

  private def has(plan: LogicalPlan, p: Expression => Boolean): Boolean =
    plan.exists(_.expressions.exists(_.exists(p)))

  test("GraftExtensions injects the rewrite rule") {
    assert(Bridge.optimizerRules(spark, new graft.GraftExtensions)
      .contains(GraftNativeRewrite))
  }

  test("legacy md5-conv-substring hash rewrites to native hash60, values unchanged") {
    val s = spark
    import s.implicits._
    // The repartition barrier keeps the projection out of
    // ConvertToLocalRelation's reach — over a bare LocalRelation the
    // optimizer constant-folds the whole project before any injected
    // rule runs (a FileScan input behaves like the barrier form).
    val df = Seq(Some("alpha"), Some(""), Some("x y z"), None).toDF("t")
      .repartition(2)
      .select(col("t"), TextFunctions.hash60Legacy(col("t")).as("h"))
    val plan = rewrite(df)
    assert(has(plan, _.isInstanceOf[Hash60Expr]))
    assert(!has(plan, _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Conv]))
    assert(Bridge.ofRows(spark, plan).collect().toSeq == df.collect().toSeq)
  }

  test("declarative dot fold over dense attributes rewrites to guarded native dot") {
    val s = spark
    import s.implicits._
    val base = Seq((1, 3, 3), (2, 4, 3), (3, 0, 0), (4, -1, 2))
      .toDF("id", "na", "nb")
      .repartition(2) // barrier: no constant folding over LocalRelation
      .select(col("id"),
        when(col("na") >= 0,
          slice(typedlit(Seq(0.5f, 1.0f, 1.5f, 2.0f)), lit(1), col("na"))).as("a"),
        when(col("nb") >= 0,
          slice(typedlit(Seq(2.0f, 0.5f, 1.0f, 0.25f)), lit(1), col("nb"))).as("b"))
      .repartition(2) // project barrier: the fold's operands stay attributes
    val df = base
      .select(col("id"), VectorFunctions.dotHof(col("a"), col("b")).as("d"))
      .orderBy("id")
    val plan = rewrite(df)
    assert(has(plan, _.isInstanceOf[DotProductExpr]))
    assert(!has(plan, _.isInstanceOf[ArrayAggregate]))
    def vals(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
    val got = vals(Bridge.ofRows(spark, plan).collect())
    assert(got == vals(df.collect()))
    // equal lengths → the fold; unequal → null (zip_with null-pads);
    // both empty → the 0.0 zero; null array → null.
    assert(got == Seq(0.5 * 2.0 + 1.0 * 0.5 + 1.5 * 1.0, null, 0.0, null))
  }

  test("the declarative tokenizer chain rewrites to the native tokenizer") {
    val s = spark
    import s.implicits._
    val df = Seq("A1 b2!", "", "x  Y").toDF("t").repartition(2)
      .select(col("t"),
        TextFunctions.tokensLegacy(col("t")).as("toks"),
        TextFunctions.normalizeTextLegacy(col("t")).as("norm"))
    val plan = rewrite(df)
    assert(has(plan, _.isInstanceOf[graft.functions.TokenizeExpr]))
    assert(!has(plan, _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.StringSplit]))
    assert(!has(plan, _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace]))
    assert(Bridge.ofRows(spark, plan).collect().toSeq == df.collect().toSeq)
    // A similar-but-different chain (other regex) must NOT rewrite.
    val other = Seq("A1 b2!").toDF("t").repartition(2)
      .select(split(trim(regexp_replace(
        regexp_replace(lower(col("t")), "[^a-z ]", " "), " +", " ")), " ").as("x"))
    assert(!has(rewrite(other), _.isInstanceOf[graft.functions.TokenizeExpr]))
    // Nor a chain whose replace starts at an explicit later position
    // (prefix preserved — a different function, SQL-only surface).
    val pos2 = Seq("#ab").toDF("t").repartition(2)
      .selectExpr("split(trim(regexp_replace(regexp_replace(lower(t), " +
        "'[^a-z0-9 ]', ' ', 2), ' +', ' ', 1)), ' ') AS x")
    assert(!has(rewrite(pos2), _.isInstanceOf[graft.functions.TokenizeExpr]))
  }

  test("nullable-element arrays are NOT rewritten (density guard)") {
    val s = spark
    import s.implicits._
    val base = Seq(1, 2).toDF("n")
      .repartition(2)
      .select(array(when(col("n") > 1, col("n").cast("float"))).as("a"),
        array(col("n").cast("float")).as("b"))
      .repartition(2)
    val df = base.select(VectorFunctions.dotHof(col("a"), col("b")).as("d"))
    val plan = rewrite(df)
    assert(!has(plan, _.isInstanceOf[DotProductExpr]))
    assert(has(plan, _.isInstanceOf[ArrayAggregate]))
  }

  test("non-attribute operands are NOT rewritten (duplication guard)") {
    val s = spark
    import s.implicits._
    // Same fold, but the operands are in-project expression trees (the
    // rewrite would duplicate them into the size guard).
    val df = Seq((3, 3)).toDF("na", "nb")
      .repartition(2)
      .select(VectorFunctions.dotHof(
        slice(typedlit(Seq(0.5f, 1.0f, 1.5f)), lit(1), col("na")),
        slice(typedlit(Seq(2.0f, 0.5f, 1.0f)), lit(1), col("nb"))).as("d"))
    val plan = rewrite(df)
    assert(!has(plan, _.isInstanceOf[DotProductExpr]))
  }

  test("the session kill switch disables every rewrite") {
    val s = spark
    import s.implicits._
    val df = Seq("A1 b2!").toDF("t").repartition(2)
      .select(TextFunctions.hash60Legacy(col("t")).as("h"),
        TextFunctions.tokensLegacy(col("t")).as("toks"))
    spark.conf.set(GraftNativeRewrite.EnabledKey, "false")
    try {
      val off = rewrite(df)
      assert(!has(off, _.isInstanceOf[Hash60Expr]))
      assert(!has(off, _.isInstanceOf[graft.functions.TokenizeExpr]))
    } finally spark.conf.unset(GraftNativeRewrite.EnabledKey)
    // and back on by default
    assert(has(rewrite(df), _.isInstanceOf[Hash60Expr]))
  }
}
