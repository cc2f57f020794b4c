package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CentroidIndex

/** Pins the defining contract of the two-level centroid index: the
  * pruned argmin is EXACT — bit-identical to the flat
  * min(struct(dist_u, cid)) scan, ties included — while doing
  * provably sub-n·K work. Exactness is what lets the whole Lloyd/ANN
  * family adopt it without touching a single oracle. */
class NearestCellSpec extends AnyFunSuite with SparkSpec {

  private def brute(model: Seq[(Long, Array[Long], Long)],
                    eu: Array[Long]): (Long, Long) =
    model.map { case (cid, c, _) =>
      var d = 0L; var i = 0
      while (i < c.length) { val t = eu(i) - c(i); d += t * t; i += 1 }
      (d, cid)
    }.min

  test("indexed assign equals the flat argmin on random models — " +
       "duplicate centroids (forced dist ties) and on-centroid probes included") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 15) {
      val dim = 1 + rnd.nextInt(16)
      val k = 1 + rnd.nextInt(80)
      val base = (0 until k).map { i =>
        val v = Array.fill(dim)((rnd.nextInt(2000001) - 1000000).toLong)
        (i.toLong * 3 + 1, v, v.map(x => x * x).sum)
      }
      // Plant a duplicate centroid pair: equal distances everywhere,
      // so the (dist_u, cid) tie-break is exercised on every probe.
      val model =
        if (k >= 2) base.updated(k - 1,
          (base(k - 1)._1, base(0)._2.clone(), base(0)._3))
        else base
      val index = CentroidIndex.build(model)
      for (t <- 0 until 150) {
        val eu =
          if (t % 4 == 0) model(rnd.nextInt(k))._2.clone() // exact hit: dist 0 (maybe twice)
          else Array.fill(dim)((rnd.nextInt(2000001) - 1000000).toLong)
        val n2u = eu.map(x => x * x).sum
        val got = index.assign(new GenericArrayData(eu), n2u)
        val (bd, bc) = brute(model, eu)
        assert(got.getLong(0) === bd && got.getLong(1) === bc,
          s"dim=$dim k=$k: got (${got.getLong(0)}, ${got.getLong(1)}), " +
            s"want ($bd, $bc)")
      }
    }
  }

  test("indexed TOP-M equals the first m rows of the flat (dist, cid) " +
       "order — ties and m > K included") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 10) {
      val dim = 1 + rnd.nextInt(12)
      val k = 1 + rnd.nextInt(60)
      val base = (0 until k).map { i =>
        val v = Array.fill(dim)((rnd.nextInt(2000001) - 1000000).toLong)
        (i.toLong * 7 + 2, v, v.map(x => x * x).sum)
      }
      val model =
        if (k >= 3) base.updated(k - 1, (base(k - 1)._1, base(1)._2.clone(), base(1)._3))
        else base
      val index = CentroidIndex.build(model)
      for (t <- 0 until 80) {
        val m = 1 + rnd.nextInt(k + 3) // sometimes m > K
        val eu =
          if (t % 5 == 0) model(rnd.nextInt(k))._2.clone()
          else Array.fill(dim)((rnd.nextInt(2000001) - 1000000).toLong)
        val n2u = eu.map(x => x * x).sum
        val got = index.assignTop(new GenericArrayData(eu), n2u, m)
        val want = model.map { case (cid, c, _) =>
          var d = 0L; var i = 0
          while (i < c.length) { val x = eu(i) - c(i); d += x * x; i += 1 }
          (d, cid)
        }.sorted.take(m)
        assert(got.numElements() === want.length)
        want.zipWithIndex.foreach { case ((d, c), i) =>
          val row = got.getStruct(i, 2)
          assert(row.getLong(0) === d && row.getLong(1) === c,
            s"dim=$dim k=$k m=$m rank $i: got " +
              s"(${row.getLong(0)}, ${row.getLong(1)}), want ($d, $c)")
        }
      }
    }
  }

  test("pruning does sub-n·K work on clustered geometry (the scale claim)") {
    val rnd = new scala.util.Random(42)
    val dim = 16
    val k = 1024
    // Clustered model: 32 well-separated hubs, 32 centroids each.
    val model = (0 until k).map { i =>
      val hub = i / 32
      val v = Array.tabulate(dim)(p =>
        (hub.toLong * 600000L * (if (p % 3 == hub % 3) 1 else -1)) +
          (rnd.nextInt(20001) - 10000).toLong)
      (i.toLong, v, v.map(x => x * x).sum)
    }
    val index = CentroidIndex.build(model)
    val n = 2000
    index.probes.reset()
    for (_ <- 0 until n) {
      val near = model(rnd.nextInt(k))._2
      val eu = near.map(_ + (rnd.nextInt(10001) - 5000).toLong)
      val n2u = eu.map(x => x * x).sum
      val got = index.assign(new GenericArrayData(eu), n2u)
      val (bd, bc) = brute(model, eu)
      assert(got.getLong(0) === bd && got.getLong(1) === bc)
    }
    val flatWork = n.toLong * k
    assert(index.probes.sum() < flatWork / 4,
      s"pruned work ${index.probes.sum()} should be well under flat $flatWork")
  }
}
