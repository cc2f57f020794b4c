package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder
import graft.sources.Tables

/** The z-order layout's locality property, proven on real parquet
  * files: range-writing by the Morton key bounds EVERY file's span in
  * BOTH dimensions, while a 1-D layout leaves the second dimension
  * spanning its whole domain in every file. Bounded per-file spans are
  * exactly what parquet min/max row-group stats turn into scan pruning
  * for predicates on either column. */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("zvalue interleaves bits; z-sorted files bound both dimensions") {
    // Bit-level unit check: z(a=bits at even positions, b at odd).
    val s = spark
    import s.implicits._
    val zs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFL, 0L), (0L, 0xFFFFL),
      (3L, 5L)).toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b"))).collect().map(_.getLong(0))
    assert(zs(0) == 0L && zs(1) == 1L && zs(2) == 2L)
    assert(zs(3) == 0x55555555L && zs(4) == 0xAAAAAAAAL)
    // a=3 (bits 0,1 → positions 0,2), b=5 (bits 0,2 → positions 1,5).
    assert(zs(5) == (1L | (1L << 2) | (1L << 1) | (1L << 5)))

    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id"),
        expr("(unix_micros(ts) DIV 60000000) % 1440").as("minute"))
    val out = Files.createTempDirectory("zorder")
    // 32 range cuts slice the top 5 interleaved bits (3 of one dim, 2
    // of the other); fewer cuts leave too few bits per dimension for
    // the spans to tighten measurably.
    val nFiles = 32
    // Scale both dimensions to the full 16-bit width before
    // interleaving (see ZOrder scaladoc): with raw inputs the top
    // occupied z bits all belong to the wider (minute) domain and the
    // layout degenerates to a 1-D minute sort — measured score 1.18,
    // no better than the 1-D baseline.
    val uMax = ev.agg(max("user_id")).collect()(0).getLong(0)
    val z = ZOrder.zvalue(
      expr(s"user_id * 65535 DIV $uMax"), expr("minute * 65535 DIV 1439"))
    ev.withColumn("z", z)
      .repartitionByRange(nFiles, col("z")).sortWithinPartitions("z")
      .write.parquet(out.resolve("z").toString)
    ev.repartitionByRange(nFiles, col("user_id"), col("minute"))
      .write.parquet(out.resolve("oned").toString)

    // Per-FILE span sum over both dimensions, each normalized by the
    // DATA's global span (so 1.0 = one dimension fully unbounded).
    // input_file_name() groups rows by the physical file they landed in.
    val globals = ev.agg(
      (max("user_id") - min("user_id")).cast("double").as("gu"),
      (max("minute") - min("minute")).cast("double").as("gm")).collect()(0)
    val (gu, gm) = (globals.getDouble(0), globals.getDouble(1))
    def spanScore(dir: String): Double =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(((max("user_id") - min("user_id")) / lit(gu) +
          (max("minute") - min("minute")) / lit(gm)).as("score"))
        .agg(avg("score")).collect()(0).getDouble(0)
    val zScore = spanScore(out.resolve("z").toString)
    val onedScore = spanScore(out.resolve("oned").toString)
    // The 1-D range layout slices user_id only: minute spans its whole
    // domain in every file (score ≈ 1). The z layout splits its 8
    // ranges across the top interleaved bits, bounding both spans.
    assert(zScore < 0.75, s"z-layout span score $zScore not bounded")
    assert(zScore < onedScore * 0.8,
      s"z-layout ($zScore) not tighter than 1-D layout ($onedScore)")
  }
}
