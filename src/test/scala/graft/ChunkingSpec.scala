package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q_chunk_docs' geometry: chunks tile every doc at exactly the
  * stride, interior chunks are full-length, the last chunk ends exactly
  * at the doc's token count (full coverage, no gap, no overrun) —
  * the properties downstream packing relies on. The oracle pins chunk
  * CONTENT (md5 fingerprints); this pins the shape.
  */
class ChunkingSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("chunks tile each doc: stride starts, full-length interiors, exact tail") {
    val rows = SparkEntry.queries("q_chunk_docs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val cs = rs.sortBy(_._2)
      // Contiguous chunk indices with starts 0, 48, 96, ...: every
      // consecutive full-length pair therefore overlaps by exactly 16.
      cs.zipWithIndex.foreach { case ((_, idx, start, _), i) =>
        assert(idx == i && start == 48L * i, s"doc $doc: chunk $idx at $start")
      }
      // The last start is the largest stride multiple below n, so the
      // tail length n − lastStart is ≤ 48 < chunkLen — meaning the tail
      // is never clamped and n is recoverable exactly from it.
      val (_, _, lastStart, lastLen) = cs.last
      val n = lastStart + lastLen
      assert(lastLen >= 1 && lastLen <= 48, s"doc $doc: tail $lastLen")
      // Every chunk's length is exactly the clamp min(64, n − start):
      // full coverage, no gap, no overrun — including short docs whose
      // "interior" chunks clamp below 64 while later starts still tile.
      cs.foreach { case (_, idx, start, len) =>
        assert(len == math.min(64L, n - start),
          s"doc $doc: chunk $idx len $len, expected ${math.min(64L, n - start)}")
      }
      // And the tiling is maximal: one more stride step would start at
      // or past the end of the doc.
      assert(48L * cs.length >= n, s"doc $doc: under-tiled")
    }
  }
}
