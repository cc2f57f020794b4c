package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Diagnostic: print the formatted physical plan of one registry query
  * at a given table dir — `runMain graft.tools.ExplainOne <name> <dir>`.
  * Plan-shape iteration without editing tests.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args.take(2)
    val spark = graft.GraftSession.getOrCreate("graft-explain")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    // scalastyle:off println
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    // scalastyle:on println
    graft.queries.StagedCache.releaseAll()
    spark.stop()
  }
}
