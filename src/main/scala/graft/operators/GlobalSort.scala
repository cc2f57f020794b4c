package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global sort.
  *
  * Reference semantics: map emits `(line, "")` and the MR shuffle sort IS
  * the computation (`/root/reference/trace-sort-job/src/main/java/org/
  * example/TraceSortMapper.java:114-116`); a single reducer yields total
  * order (`TraceSortJob.java:51`).
  *
  * Spark upgrade: `orderBy` range-partitions on sampled boundaries and
  * sorts each partition — a true total order across ANY parallelism,
  * where the reference only gets total order at parallelism 1 (it never
  * configures a TotalOrderPartitioner). At 100 TB a single reducer is a
  * non-starter; range partitioning is the only strategy that scales, and
  * AQE rebalances skewed ranges.
  */
object GlobalSort {

  /** Total order (reference `--reducers 1` semantics, but parallel). */
  def apply(df: DataFrame, keys: Column*): DataFrame = df.orderBy(keys: _*)

  def apply(df: DataFrame, key: String): DataFrame = df.orderBy(col(key))

  /** Reference `--reducers N>1` emulation: hash-partitioned sorted runs
    * (each output partition sorted by `keys`, no global order). The
    * first key is the partitioning key (≙ the MR HashPartitioner on the
    * map-output key). */
  def sortedRuns(df: DataFrame, n: Int, keys: String*): DataFrame =
    df.repartition(n, col(keys.head)).sortWithinPartitions(keys.map(col): _*)
}
