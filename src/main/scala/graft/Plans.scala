package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-audit utility: print `explain("formatted")` for the named
  * queries (or every query) at an sf dir — the loop behind PLANS.md.
  *
  * {{{
  *   sbt "runMain graft.Plans /root/testdata/sf0.01 q_wordcount q_join_multi"
  *   sbt "runMain graft.Plans /root/testdata/sf0.01"          # all queries
  * }}}
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate("graft-plans")
    for (n <- names) SparkEntry.queries.get(n) match {
      case Some(fn) =>
        println(s"===== $n =====")
        println(fn(spark, sfDir).queryExecution.explainString(FormattedMode))
      case None =>
        System.err.println(s"unknown query: $n (see SparkEntry.queries)")
    }
    spark.stop()
  }
}
