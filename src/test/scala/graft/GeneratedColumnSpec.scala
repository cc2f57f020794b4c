package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** GENERATED columns ([[TxnLog.addGeneratedColumn]]): always-derived
  * table-property columns computed inside every staged write — the
  * consistent skipping-key derivation a 100 TB lake needs. */
class GeneratedColumnSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_gen_${spark.sparkContext.applicationId}_$tag"
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  test("omitted on write -> computed; supplied -> recomputed (never " +
       "writer-owned); pre-addition rows read null") {
    import spark.implicits._
    val t = freshTable("basic")
    TxnLog.create(spark, t, Seq((10L, "aa"), (25L, "bb")).toDF("id", "s"))
    TxnLog.addGeneratedColumn(spark, t, "bucket", "id % 10")
    // Writer omits the column: derived.
    TxnLog.append(spark, t, Seq((33L, "cc")).toDF("id", "s"))
    // Writer supplies a WRONG value: silently replaced by the
    // derivation (GENERATED ALWAYS AS — the column is not writable).
    TxnLog.append(spark, t,
      Seq((47L, "dd", 999L)).toDF("id", "s", "bucket"))
    val got = TxnLog.read(spark, t).select("id", "bucket").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got === Map(10L -> None, 25L -> None, // pre-addition rows
      33L -> Some(3L), 47L -> Some(7L)))
  }

  test("an UPDATE to a source column self-heals the derived value in " +
       "the rewritten copies; stats on the generated column prune") {
    import spark.implicits._
    val t = freshTable("heal")
    TxnLog.create(spark, t, Seq((1L, 100L)).toDF("id", "n"))
    TxnLog.addGeneratedColumn(spark, t, "n2", "n * 2")
    TxnLog.append(spark, t, (2L to 40L).map(i => (i, i * 100L)).toDF("id", "n"))
    TxnLog.updateMoR(spark, t, col("id") === 5L, Map("n" -> lit(7L)))
    val healed = TxnLog.read(spark, t).filter(col("id") === 5L)
      .select("n", "n2").head()
    assert(healed.getLong(0) === 7L && healed.getLong(1) === 14L,
      "the update's copy must re-derive n2 from the new n")
    // Default stats recorded on the derived column -> range pruning.
    val pruned = TxnLog.readPruned(spark, t, "n2", 400L, 800L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned === (2L to 4L).toSeq)
  }

  test("renaming or dropping a column a GENERATED expression derives " +
       "from refuses; dropping the generated column itself is fine") {
    import spark.implicits._
    val t = freshTable("refs")
    TxnLog.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    TxnLog.addGeneratedColumn(spark, t, "id2", "id * 2")
    intercept[IllegalArgumentException] {
      TxnLog.renameColumn(spark, t, "id", "ident")
    }
    intercept[IllegalArgumentException] { TxnLog.dropColumn(spark, t, "id") }
    // The derived column itself drops freely (it references id, but a
    // column never blocks its own removal).
    TxnLog.dropColumn(spark, t, "id2")
    TxnLog.renameColumn(spark, t, "id", "ident") // now unblocked
    assert(TxnLog.tableSchema(spark, t).get.fieldNames.toSeq
      === Seq("ident", "s"))
  }

  test("SQL: ADD GENERATED COLUMN infers the type from the expression; " +
       "the catalog INSERT path derives it") {
    val dml = GraftSqlDmlSpec.session
    val root = s"${sys.props("java.io.tmpdir")}/graft_gensql_${System.nanoTime()}"
    dml.conf.set("spark.sql.catalog.gn", classOf[graft.sources.GraftCatalog].getName)
    dml.conf.set("spark.sql.catalog.gn.root", root)
    dml.conf.set("spark.sql.catalog.gn.writable", "true")
    val dir = s"$root/ns/t"
    locally {
      import dml.implicits._
      TxnLog.create(dml, dir, Seq((1L, "alpha")).toDF("id", "s"))
    }
    dml.sql(s"ALTER TABLE '$dir' ADD GENERATED COLUMN slen AS (length(s))")
    assert(TxnLog.tableSchema(dml, dir).get("slen").dataType
      === org.apache.spark.sql.types.IntegerType)
    dml.sql("INSERT INTO gn.ns.t VALUES (2, 'four', NULL)")
    val got = dml.sql("SELECT id, slen FROM gn.ns.t ORDER BY id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got === Map(1L -> -1, 2L -> 4))
  }
}
