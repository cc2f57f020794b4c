package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Recall pin for the containment band: the DuckDB oracle mirrors the
  * candidate generator, so a generator that systematically misses the
  * pairs the query exists for would still hash-match — this spec plants
  * the adversarial case and asserts end-to-end behavior through the
  * PUBLIC query surface instead.
  *
  * The planted pair: a 40-token document fully contained in a 300-token
  * one. Shingle-set containment is 1.0 but Jaccard ≈ 38/298 ≈ 0.13 —
  * the subset-copy regime. Minhash bands are tuned to collide at high
  * Jaccard and the J≥0.5 verify rejects the pair regardless, so
  * q_near_dup_minhash must NOT report it; q_containment_pairs' sampled-
  * shingle candidates (every sampled key of the contained doc collides
  * with its container) must find it with containment 1.0.
  */
class DedupRecallSpec extends AnyFunSuite with SparkSpec {

  test("containment pairs find the subset copy that the Jaccard pipeline misses") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_recall").toString
    val big = (0 until 300).map(i => s"tok$i").mkString(" ")
    val contained = (0 until 40).map(i => s"tok$i").mkString(" ")
    val unrelated = (0 until 100).map(i => s"other$i").mkString(" ")
    Seq(
      (1L, big, "en", "src0", big.length.toLong),
      (2L, contained, "en", "src0", contained.length.toLong),
      (3L, unrelated, "en", "src1", unrelated.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    try {
      val cp = SparkEntry.queries("q_containment_pairs")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(r.fieldIndex("containment")),
            r.getDouble(r.fieldIndex("jaccard"))))
        .toMap
      assert(cp.contains((1L, 2L)),
        s"subset copy not found by containment candidates: ${cp.keySet}")
      val (cont, jac) = cp((1L, 2L))
      assert(cont == 1.0, s"containment $cont != 1.0")
      assert(jac < 0.2, s"planted pair unexpectedly high-Jaccard: $jac")
      graft.queries.StagedCache.releaseAll()

      val mh = SparkEntry.queries("q_near_dup_minhash")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!mh.contains((1L, 2L)),
        "J=0.13 pair passed the J>=0.5 Jaccard verify?!")
    } finally graft.queries.StagedCache.releaseAll()
  }
}
