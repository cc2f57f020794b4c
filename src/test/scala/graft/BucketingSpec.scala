package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Bucketing: pre-partitioned tables join WITHOUT a shuffle — the
  * co-located-join technique SURVEY §7 reserves for repeated large
  * joins on a stable key (at 100 TB, bucketing the fact tables on the
  * join key once amortizes the shuffle across every downstream query). */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed-by-key tables sort-merge join with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    val wh = Files.createTempDirectory("graft-buckets")
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")

    orders.write.option("path", wh.resolve("orders_b").toString)
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.option("path", wh.resolve("lineitem_b").toString)
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    try {
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("orders_b")
          .join(spark.table("lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange hashpartitioning"),
          s"expected no shuffle for co-bucketed join:\n$plan")
        // And it computes the right thing.
        val n = joined.count()
        val expected = orders.join(lineitem,
          col("o_orderkey") === col("l_orderkey")).count()
        assert(n == expected && n > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
