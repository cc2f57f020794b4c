package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase rank-selection percentile
  * ([[ScalarQueries.exactPercentilesByRank]]) must be BIT-IDENTICAL to
  * Spark's built-in exact `percentile` aggregate — that identity is
  * what lets q_percentiles keep its unchanged DuckDB `quantile_cont`
  * oracle. Pinned on adversarial shapes: single-element groups, all
  * ties, tiny groups where ⌊p·(n−1)⌋ = ⌈p·(n−1)⌉, duplicates
  * straddling range-partition boundaries, and fixed-seed random data
  * (same raw-Gen pattern as KernelPropertySpec). */
class PercentileRankSpec extends AnyFunSuite with graft.SparkSpec {

  private val ps = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50",
    0.77 -> "p77", 1.0 -> "p100")

  private def compare(rows: Seq[(String, Double)]): Unit = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("g", "v").repartition(5)
    val expected = df.groupBy("g")
      .agg(expr(s"percentile(v, ${ps.head._1}D)").as(ps.head._2),
        ps.tail.map { case (p, n) => expr(s"percentile(v, ${p}D)").as(n) }: _*)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap
    val got = ScalarQueries.exactPercentilesByRank(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (g, vals) =>
      vals.zip(expected(g)).zipWithIndex.foreach { case ((a, b), i) =>
        // Bit-identity, not approximate equality: the oracle hash
        // compare tolerates nothing less.
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b),
          s"group $g p=${ps(i)._1}: $a != $b")
      }
    }
  }

  test("edge shapes: singleton group, all-ties group, two-element group") {
    compare(Seq("a" -> 42.0, "b" -> 7.0, "b" -> 7.0, "b" -> 7.0,
      "c" -> 1.5, "c" -> 2.5))
  }

  test("90%-tied column spreads across range partitions (tiebreaker in the range key)") {
    val s = spark
    import s.implicits._
    // Adversarial shape: one group, 90% a single value. Without the
    // unique tiebreaker in the range key, repartitionByRange cannot
    // split the tied run and ~90% of rows land in one partition.
    val n = 4000
    val rows = (1 to n).map(i => ("g", if (i % 10 == 0) i.toDouble else 7.0))
    val nPart = 4
    val perPart = ScalarQueries.rangedByValue(rows.toDF("g", "v").repartition(8),
        "g", "v", nPart)
      .groupBy("_pid").count().collect().map(_.getLong(1))
    assert(perPart.length == nPart, s"expected $nPart non-empty partitions, got ${perPart.length}")
    val maxRows = perPart.max
    // ≈ n/nPart with sampling slack — far below the 0.9·n pile-up the
    // tiebreaker exists to prevent.
    assert(maxRows <= n / nPart * 1.6,
      s"max partition rows $maxRows vs balanced ${n / nPart}")
    // And the same adversarial data still matches the built-in bit-for-bit.
    compare(rows)
  }

  test("fixed-seed random grouped doubles match the built-in bit-for-bit") {
    val gen = for {
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("g1", "g2", "g3")
        v <- Gen.chooseNum(-1e6, 1e6)
      } yield (g, v))
    } yield rows
    (1 to 10).foreach { i =>
      val rows = gen(Gen.Parameters.default, Seed(i.toLong)).get
      compare(rows)
    }
  }
}
