package graft.observe

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}

/** Structural query signature (sigv1) — the Spark re-expression of the
  * reference's job-shape fingerprint
  * (`/root/reference/trace-wordcount-job/src/main/java/org/example/
  * TraceWordCountJob.java:105-130`: SHA-256 over
  * `mapper|reducer|combiner|formats|KV classes|partitioner|comparators|
  * reducer-bucket|sigv1`).
  *
  * The Spark analog of "job shape" is the analyzed logical plan's
  * STRUCTURE: operator tree + expression classes + leaf schemas — with
  * data locations and literal values excluded, exactly as the reference
  * excludes input paths. Two runs of the same pipeline over different
  * directories therefore share a signature, while any change to an
  * operator, expression, or schema changes it.
  */
object PlanSignature {

  /** Canonical shape string of a plan (stable across paths/literals). */
  def shapeOf(plan: LogicalPlan): String = plan match {
    case leaf: LeafNode =>
      // ≙ input format + map-input KV classes: the scanned schema, not
      // the scanned location.
      leaf.nodeName + leaf.output.map(_.dataType.simpleString)
        .mkString("<", ",", ">")
    case node =>
      node.nodeName +
        node.expressions.map(shapeOfExpr).mkString("(", ",", ")") +
        node.children.map(shapeOf).mkString("[", ";", "]")
  }

  private def shapeOfExpr(e: Expression): String = e match {
    case _: Attribute => "attr:" + e.dataType.simpleString
    case l: Literal   => "lit:" + l.dataType.simpleString // value excluded
    case other =>
      other.getClass.getSimpleName +
        (if (other.children.isEmpty) ""
         else other.children.map(shapeOfExpr).mkString("(", ",", ")"))
  }

  /** Reducer-count bucket (≙ `TraceWordCountJob.java`'s r0/r1/rmany):
    * the physical parallelism class, not the exact number — so tuning
    * `spark.sql.shuffle.partitions` between 32 and 200 does not change
    * query identity, but single-reducer semantics does. */
  def reducerBucket(spark: SparkSession): String =
    spark.conf.get("spark.sql.shuffle.partitions", "200") match {
      case "0" => "r0"
      case "1" => "r1"
      case _   => "rmany"
    }

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** sigv1 of a DataFrame's analyzed plan. */
  def sigv1(df: DataFrame): String = {
    val shape = shapeOf(df.queryExecution.analyzed)
    sha256Hex(shape + "|" + reducerBucket(df.sparkSession) + "|sigv1")
  }
}
