package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TDigestAgg, TDigestBuffer}

/** t-digest quantile sketch: rank-error guarantee under every
  * aggregation path (in-order, shuffled, partial-merge trees), bounded
  * centroid state, exact order statistics for sub-δ groups. */
class TDigestSpec extends AnyFunSuite with SparkSpec {

  private val Comp = 100

  /** Rank of `v` in sorted `data` as the (lt, le) bracket. */
  private def rankBracket(data: Array[Double], v: Double): (Int, Int) =
    (data.count(_ < v), data.count(_ <= v))

  /** Assert the t-digest guarantee: the estimate's rank interval
    * intersects [p·n − slack, p·n + slack]. */
  private def assertRank(data: Array[Double], v: Double, p: Double,
                         slack: Double): Unit = {
    val (lt, le) = rankBracket(data, v)
    val target = p * data.length
    assert(le >= target - slack - 1 && lt <= target + slack + 1,
      s"p=$p est=$v rank in [$lt,$le], target $target ± $slack")
  }

  /** Skewed deterministic sample: exponential body + lognormal tail. */
  private def sample(n: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n) {
      val u = rnd.nextDouble()
      if (rnd.nextDouble() < 0.9) -math.log(1.0 - u) * 100.0
      else math.exp(3.0 + 2.0 * rnd.nextGaussian())
    }
  }

  test("driver-side buffer: rank bound holds on skewed data at every p") {
    val data = sample(20000, seed = 7L)
    val buf = new TDigestBuffer(Comp)
    data.foreach(buf.add(_, 1L))
    buf.compress()
    val slack = 2.0 * data.length / Comp
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
      assertRank(data, buf.quantile(p), p, slack)
    assert(buf.nCentroids <= 2 * Comp + 1, s"state ${buf.nCentroids} centroids")
    assert(buf.total == data.length)
  }

  test("sub-δ groups are exact order statistics (singleton centroids)") {
    val data = Array(5.0, 1.0, 9.0, 3.0, 7.0)
    val buf = new TDigestBuffer(Comp)
    data.foreach(buf.add(_, 1L))
    buf.compress()
    assert(buf.nCentroids == data.length) // cap < 1 → no clustering
    // Median of 5 singleton points: t = 2.5 lands exactly on the 3rd
    // centroid's midpoint.
    assert(buf.quantile(0.5) == 5.0)
    assert(buf.quantile(0.0) == 1.0 && buf.quantile(1.0) == 9.0)
  }

  test("merge path preserves the rank bound regardless of partitioning") {
    val s = spark
    import s.implicits._
    val data = sample(20000, seed = 11L)
    val slack = 2.0 * data.length / Comp
    for (nPart <- Seq(1, 7, 32)) {
      val df = s.sparkContext.parallelize(data.toSeq, nPart).toDF("v")
      val row = df.agg(TDigestAgg(col("v"), Comp, Seq(0.1, 0.5, 0.9)).as("td"))
        .select(col("td.n"), col("td.n_centroids"), col("td.qs")).head()
      assert(row.getLong(0) == data.length)
      assert(row.getInt(1) <= 2 * Comp + 1)
      val qs = row.getSeq[Double](2)
      assertRank(data, qs(0), 0.1, slack)
      assertRank(data, qs(1), 0.5, slack)
      assertRank(data, qs(2), 0.9, slack)
    }
  }

  test("grouped aggregation: per-group totals and per-group rank bounds") {
    val s = spark
    import s.implicits._
    val groups = Seq("a" -> sample(5000, 3L), "b" -> sample(300, 5L))
    val rows = groups.flatMap { case (g, xs) => xs.map(g -> _) }
    val df = s.sparkContext.parallelize(rows, 16).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(TDigestAgg(col("v"), Comp, Seq(0.5)).as("td"))
      .select(col("g"), col("td.n"), col("td.qs")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2).head))
      .toMap
    for ((g, xs) <- groups) {
      val (n, q50) = got(g)
      assert(n == xs.length)
      assertRank(xs, q50, 0.5, math.max(2.0 * xs.length / Comp, 1.0))
    }
  }

  test("sketch/merge rollup: stored binaries roll up to rank-sound quantiles") {
    val s = spark
    import s.implicits._
    val data = sample(20000, seed = 17L)
    // 13 "daily" groups, sketched independently, merged from the
    // STORED binary column — never re-reading the raw values.
    val df = s.sparkContext.parallelize(
      data.zipWithIndex.map { case (v, i) => (i % 13, v) }.toSeq, 8)
      .toDF("g", "v")
    val daily = df.groupBy("g")
      .agg(graft.functions.TDigestSketchAgg(col("v"), Comp).as("sk"))
    val row = daily
      .agg(graft.functions.TDigestMergeAgg(col("sk"), Comp, Seq(0.1, 0.5, 0.9))
        .as("td"))
      .select(col("td.n"), col("td.n_centroids"), col("td.qs")).head()
    assert(row.getLong(0) == data.length)
    assert(row.getInt(1) <= 2 * Comp + 1)
    val qs = row.getSeq[Double](2)
    // One extra cap of slack vs the direct bound: merged pre-clustered
    // centroids can sit anywhere within their original span.
    val slack = 3.0 * data.length / Comp
    assertRank(data, qs(0), 0.1, slack)
    assertRank(data, qs(1), 0.5, slack)
    assertRank(data, qs(2), 0.9, slack)
  }

  test("SQL registration: the tdigest builder resolves literal args") {
    // The shared test JVM can't restart its context with
    // spark.sql.extensions, so materialize the injections directly
    // (same approach as FunctionsSpec's wiring test).
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftbridge.Bridge
    val reg = Bridge.registeredFunctions(new graft.GraftExtensions)
    val f = reg.lookupFunction(FunctionIdentifier("tdigest"),
      Seq(Literal(1.0), Literal(100), Literal(0.5), Literal(0.9)))
    val agg = f.asInstanceOf[TDigestAgg]
    assert(agg.compression == 100 && agg.percentiles == Seq(0.5, 0.9))
    intercept[IllegalArgumentException] {
      reg.lookupFunction(FunctionIdentifier("tdigest"), Seq(Literal(1.0)))
    }
  }

  test("empty group evaluates to n=0 with null quantiles") {
    val s = spark
    import s.implicits._
    val row = Seq(1.0).toDF("v").filter(col("v") < 0)
      .agg(TDigestAgg(col("v"), Comp, Seq(0.5)).as("td"))
      .select(col("td.n"), col("td.qs")).head()
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }
}
