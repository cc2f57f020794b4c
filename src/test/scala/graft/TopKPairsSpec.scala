package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKPairsAgg, TopKPairsBuffer}

/** The map-side top-k aggregate must be indistinguishable from the
  * row_number window it replaced in the ANN family — same (score desc,
  * id asc) total order, same ≤ k results per group — including through
  * the partial-merge + serialize path a multi-partition shuffle takes.
  */
class TopKPairsSpec extends AnyFunSuite with SparkSpec {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rnk", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("id"))))
      .filter(col("rnk") <= k)
      .select("g", "id", "s", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKPairsAgg.topk(col("s"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("i0", "t")))
      .select(col("g"), col("t.id").as("id"), col("t.score").as("s"),
        (col("i0") + 1).cast("int").as("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet

  test("equals the row_number window on random data with planted ties") {
    val rnd = new scala.util.Random(7)
    // 40 groups × ~50 rows; coarse scores (one decimal) force frequent
    // exact ties so the id tiebreak is load-bearing, not incidental.
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, rnd.nextInt(10) / 10.0)
    }
    val s = spark
    import s.implicits._
    // 8 partitions: partial buffers per partition, serialized across
    // the exchange, merged on the reduce side.
    val df = rows.toDF("g", "id", "s").repartition(8)
    for (k <- Seq(1, 3, 10))
      assert(aggTopK(df, k) == windowTopK(df, k), s"k=$k diverged")
  }

  test("groups smaller than k emit all rows, in rank order") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 20L, 0.1))
      .toDF("g", "id", "s")
    assert(aggTopK(df, 5) == windowTopK(df, 5))
  }

  test("NULL scores and ids are skipped like the window ranks them out") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (1L, 1L, 0.9), (1L, 2L, null), (1L, null, 0.8), (1L, 3L, 0.7))
      .toDF("g", "id", "s")
    val got = aggTopK(df.na.drop(Seq()).withColumn("g", col("g")), 2)
    assert(got == Set((1L, 1L, 0.9, 1), (1L, 3L, 0.7, 2)))
  }

  test("buffer: offer keeps the exact (score desc, id asc) order under ties") {
    val b = new TopKPairsBuffer(3)
    Seq((0.5, 7L), (0.5, 3L), (0.9, 9L), (0.5, 1L), (0.1, 2L))
      .foreach { case (sc, id) => b.offer(sc, id) }
    assert((0 until b.size).map(i => (b.scores(i), b.ids(i))) ==
      Seq((0.9, 9L), (0.5, 1L), (0.5, 3L)))
  }
}
