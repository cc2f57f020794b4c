package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One-off A/B for q_column_profile's 1.47× r13 drift (verdict task
  * #6): the CURRENT two-scan shape (wide declarative agg + a second
  * explode→hash→kmv scan) vs a SINGLE-SCAN form folding the five
  * kmv sketches into the same wide aggregate
  * (`sbt "Test/runMain graft.ColumnProfileAB /root/testdata/sf0.1"`).
  * Median of 5 after one warm-up, noop-consumed like Bench. */
object ColumnProfileAB {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("colprofile-ab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 4096
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_linestatus")
    def canon(c: String): Column = c match {
      case "l_quantity" | "l_extendedprice" =>
        round(col(c) * 1e6).cast("long").cast("string")
      case _ => col(c).cast("string")
    }

    def current(): DataFrame = SparkEntry.queries("q_column_profile")(spark, d)

    def singleScan(): DataFrame = {
      val li = Tables.lineitem(spark, d)
      val wide = li.agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          sum(col(c).isNull.cast("long")).as(s"${c}_nulls"),
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max"),
          graft.functions.KmvDistinctAgg(
            graft.functions.TextFunctions.hash60(canon(c)), k)
            .as(s"${c}_sk"))): _*)
      wide.select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("column_name"),
          col(s"${c}_nulls").as("n_nulls"),
          col(s"${c}_sk.est").as("n_distinct_est"),
          col(s"${c}_min").as("min_str"),
          col(s"${c}_max").as("max_str"))): _*)).as("p"))
        .select(col("p.column_name"), col("n_rows"), col("p.n_nulls"),
          col("p.n_distinct_est"), col("p.min_str"), col("p.max_str"))
        .orderBy("column_name")
    }

    def time(tag: String, f: () => DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // warm
      val samples = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$tag%-12s median=${samples(2)}%7.0f ms " +
        f"(min=${samples.head}%.0f max=${samples.last}%.0f)")
    }
    // Equal answers first (the A/B is pointless otherwise).
    val a = current().collect().map(_.toString).toSeq
    val b = singleScan().collect().map(_.toString).toSeq
    require(a == b, s"shapes disagree:\nA=$a\nB=$b")
    time("current", () => current())
    time("single-scan", () => singleScan())
    time("current", () => current())
    time("single-scan", () => singleScan())
    spark.stop()
  }
}
