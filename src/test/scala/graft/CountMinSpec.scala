package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CountMinAgg, Hash60Impl}

/** Pins [[graft.functions.CountMinAgg]] against a plain-Scala model of
  * its declared semantics — cell (r, i) = count of inputs whose seeded
  * hash60 lands on i — plus the sketch laws: partition-invariant
  * merge, structural over-estimation, and exactness when no bucket
  * collides.
  */
class CountMinSpec extends AnyFunSuite with SparkSpec {

  private val depth = 3
  private val width = 64

  private def modelCells(values: Seq[String]): Map[(Int, Int), Long] =
    values.flatMap { v =>
      (0 until depth).map { r =>
        (r, (Hash60Impl.hash60(UTF8String.fromString(s"$r:$v")) % width).toInt)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def sketch(values: Seq[String], parts: Int): Seq[Seq[Long]] = {
    val s = spark
    import s.implicits._
    val row = values.toDF("w").repartition(parts)
      .agg(CountMinAgg(col("w"), depth, width).as("cms"))
      .collect().head
    row.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq)
  }

  private val corpus: Seq[String] =
    Seq.tabulate(500)(i => s"w${i % 37}") ++ Seq.fill(100)("hot")

  test("sketch cells == the declared hash-bucket counts, any partitioning") {
    val expect = modelCells(corpus)
    for (parts <- Seq(1, 3, 8)) {
      val cells = sketch(corpus, parts)
      assert(cells.length == depth && cells.forall(_.length == width))
      for (r <- 0 until depth; i <- 0 until width)
        assert(cells(r)(i) == expect.getOrElse((r, i), 0L),
          s"cell ($r,$i) at parts=$parts")
    }
  }

  test("estimates over-count, never under-count; row sums conserve mass") {
    val cells = sketch(corpus, 4)
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((w, n) <- exact) {
      val est = (0 until depth).map { r =>
        cells(r)((Hash60Impl.hash60(UTF8String.fromString(s"$r:$w")) % width).toInt)
      }.min
      assert(est >= n, s"under-count for $w: $est < $n")
    }
    for (r <- 0 until depth)
      assert(cells(r).sum == corpus.size.toLong, s"row $r mass")
  }

  test("no-collision inputs estimate exactly") {
    // One value per sketch: its buckets hold only its own count.
    val values = Seq.fill(42)("solo")
    val cells = sketch(values, 2)
    val est = (0 until depth).map { r =>
      cells(r)((Hash60Impl.hash60(UTF8String.fromString(s"$r:solo")) % width).toInt)
    }.min
    assert(est == 42L)
  }

  test("SQL registration builds a CountMinAgg with the literal shape") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.Literal
    val installer = new graft.GraftExtensions
    val reg = org.apache.spark.sql.graftbridge.Bridge.registeredFunctions(installer)
    val fn = reg.lookupFunction(FunctionIdentifier("count_min"),
      Seq(Literal.create("x",
        org.apache.spark.sql.types.StringType), Literal(3), Literal(256)))
    assert(fn.isInstanceOf[CountMinAgg])
    val cm = fn.asInstanceOf[CountMinAgg]
    assert(cm.depth == 3 && cm.width == 256)
  }
}
