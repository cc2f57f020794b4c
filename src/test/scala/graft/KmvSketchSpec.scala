package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KmvDistinctAgg, VectorFunctions}

/** Tests for the KMV distinct-count TypedImperativeAggregate: exact
  * path (buffer not full), estimation accuracy, partitioning invariance
  * (partial buffers serialize + merge through the shuffle), per-group
  * independence, and SQL registration. */
class KmvSketchSpec extends AnyFunSuite with SparkSpec {

  private def hashes(prefix: String, n: Int): Seq[Long] =
    (1 to n).map(i => VectorFunctions.hash60Scala(s"$prefix-$i"))

  private def sketchRow(df: DataFrame, k: Int): Row =
    df.agg(KmvDistinctAgg(col("h"), k).as("sk"))
      .select(col("sk.n_filled"), col("sk.kth_min"), col("sk.est"))
      .collect()(0)

  test("exact path: n_distinct < k reports the exact count") {
    val s = spark
    import s.implicits._
    val df = (hashes("v", 50) ++ hashes("v", 50)).toDF("h") // dups collapse
    val r = sketchRow(df, 128)
    assert(r.getLong(0) == 50L)
    assert(r.getLong(2) == 50L)
  }

  test("estimation path: relative error well under 3/sqrt(k) for n >> k") {
    val s = spark
    import s.implicits._
    val n = 20000
    val r = sketchRow(hashes("item", n).toDF("h"), 128)
    assert(r.getLong(0) == 128L)
    val est = r.getLong(2).toDouble
    assert(math.abs(est - n) / n < 3.0 / math.sqrt(128),
      s"estimate $est too far from $n")
  }

  test("sketch is invariant to input partitioning and duplication") {
    val s = spark
    import s.implicits._
    val base = hashes("x", 5000)
    val dupd = base ++ base.take(1234)
    val a = sketchRow(base.toDF("h").repartition(1), 64)
    val b = sketchRow(base.toDF("h").repartition(13), 64)
    val c = sketchRow(dupd.toDF("h").repartition(7), 64)
    assert(a == b && b == c)
  }

  test("per-group buffers are independent and exact below k") {
    val s = spark
    import s.implicits._
    val df = (hashes("g1", 30).map(("g1", _)) ++ hashes("g2", 70).map(("g2", _)))
      .toDF("g", "h").repartition(5)
    val got = df.groupBy("g").agg(KmvDistinctAgg(col("h"), 128).as("sk"))
      .select(col("g"), col("sk.est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g1" -> 30L, "g2" -> 70L))
  }

  test("kmv_distinct is registered in SQL via GraftExtensions") {
    // Shared test session loads no extensions; register through the same
    // builder shape the extension uses (bare AggregateFunction — the
    // analyzer wraps it).
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("kmv_distinct"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[KmvDistinctAgg].getName, "kmv_distinct"),
      graft.GraftExtensions.kmvBuilder _) // the extension's real builder
    val s = spark
    import s.implicits._
    hashes("sql", 40).toDF("h").createOrReplaceTempView("kmv_in")
    val r = spark.sql(
      "SELECT (kmv_distinct(h, 16)).n_filled AS f, (kmv_distinct(h, 64)).est AS e FROM kmv_in")
      .collect()(0)
    assert(r.getLong(0) == 16L)
    assert(r.getLong(1) == 40L)
  }

  test("kmv_values emits the exact sorted k-minima, invariant to partitioning") {
    val s = spark
    import s.implicits._
    val base = hashes("kv", 3000)
    val expected = base.distinct.sorted.take(64)
    def mins(df: DataFrame): Seq[Long] =
      df.agg(graft.functions.KmvValuesAgg(col("h"), 64).as("m"))
        .collect()(0).getSeq[Long](0)
    assert(mins(base.toDF("h").repartition(1)) == expected)
    assert(mins(base.toDF("h").repartition(17)) == expected)
    assert(mins((base ++ base.take(777)).toDF("h").repartition(5)) == expected)
    // Below k: the whole distinct set, sorted.
    val small = hashes("kw", 10)
    assert(mins(small.toDF("h")) == small.distinct.sorted)
  }

  test("KMV set-operation Jaccard: estimator is consistent with the values sketch") {
    val s = spark
    import s.implicits._
    // Two sets with known overlap: A = 1..2000, B = 1001..3000 over the
    // same hash family; true Jaccard = 1000/3000.
    val a = hashes("ov", 2000)
    val b = hashes("ov", 3000).drop(1000)
    val k = 256
    val ma = a.distinct.sorted.take(k)
    val mb = b.distinct.sorted.take(k)
    val x = (ma ++ mb).distinct.sorted.take(k)
    val est = x.count(v => ma.contains(v) && mb.contains(v)).toDouble / x.size
    assert(math.abs(est - 1.0 / 3.0) < 3.0 / math.sqrt(k),
      s"KMV Jaccard $est too far from 1/3")
  }

  test("kmv_distinct rejects NULL and non-integral k with the usage message") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    val h = Literal(1L)
    def usageError(k: Literal): Unit = {
      val e = intercept[IllegalArgumentException] {
        graft.GraftExtensions.kmvBuilder(Seq(h, k))
      }
      assert(e.getMessage.contains("usage: kmv_distinct"), e.getMessage)
    }
    usageError(Literal(null, IntegerType))       // NULL -> clean error, not NPE
    usageError(Literal(2.5, DoubleType))         // non-integral -> not a cast crash
    usageError(Literal(Long.MaxValue))           // out of Int range
    // Valid literals still build.
    assert(graft.GraftExtensions.kmvBuilder(Seq(h, Literal(64)))
      .isInstanceOf[KmvDistinctAgg])
    assert(graft.GraftExtensions.kmvBuilder(Seq(h, Literal(64L)))
      .isInstanceOf[KmvDistinctAgg])
  }
}
