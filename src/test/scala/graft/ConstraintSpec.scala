package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** CHECK constraints ([[TxnLog.addConstraint]]): log-carried table
  * invariants enforced per row INSIDE every staged write. */
class ConstraintSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_ck_${spark.sparkContext.applicationId}_$tag"
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  test("a violating append fails the WRITE and publishes nothing; valid " +
       "writes pass; NULL passes (SQL CHECK semantics)") {
    import spark.implicits._
    val t = freshTable("basic")
    TxnLog.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    TxnLog.addConstraint(spark, t, "pos_id", "id > 0")
    val v = TxnLog.latestVersion(spark, t)
    val e = intercept[Exception] {
      TxnLog.append(spark, t, Seq((-5L, "x")).toDF("id", "s"))
    }
    assert(e.getMessage.contains("pos_id") ||
      Option(e.getCause).exists(_.getMessage.contains("pos_id")))
    assert(TxnLog.latestVersion(spark, t) === v, "nothing may publish")
    assert(TxnLog.read(spark, t).count() === 2L)
    // Valid rows and NULLs pass.
    TxnLog.append(spark, t,
      Seq((3L, "c"), (4L, null: String)).toDF("id", "s"))
    TxnLog.append(spark, t,
      Seq((Some(5L), "e")).toDF("id", "s")) // non-null fine
    assert(TxnLog.read(spark, t).count() === 5L)
  }

  test("ADD CONSTRAINT validates existing rows first and refuses a " +
       "violated one; duplicate names refuse") {
    import spark.implicits._
    val t = freshTable("addtime")
    TxnLog.create(spark, t, Seq((1L, "a"), (-2L, "b")).toDF("id", "s"))
    val e = intercept[IllegalArgumentException] {
      TxnLog.addConstraint(spark, t, "pos_id", "id > 0")
    }
    assert(e.getMessage.contains("1 existing rows violate"))
    TxnLog.addConstraint(spark, t, "len_ok", "length(s) <= 10")
    intercept[Exception] {
      TxnLog.addConstraint(spark, t, "len_ok", "id < 100")
    }
  }

  test("an UPDATE that would break the invariant fails; a valid UPDATE, " +
       "MERGE, and compaction all pass under the constraint") {
    import spark.implicits._
    val t = freshTable("dml")
    TxnLog.create(spark, t, (1L to 10L).map(i => (i, s"v$i")).toDF("id", "s"))
    TxnLog.addConstraint(spark, t, "pos_id", "id > 0")
    // MoR UPDATE writing violating copies must fail.
    intercept[Exception] {
      TxnLog.updateMoR(spark, t, col("id") === 3L,
        Map("id" -> lit(-3L)))
    }
    assert(TxnLog.read(spark, t).filter(col("id") < 0).count() === 0L)
    // Valid DML and maintenance pass.
    TxnLog.updateMoR(spark, t, col("id") === 3L, Map("id" -> lit(300L)))
    TxnLog.merge(spark, t, Seq((11L, "k")).toDF("id", "s"), "id")
    TxnLog.compact(spark, t, targetFiles = 1)
    assert(TxnLog.read(spark, t).count() === 11L)
    // And a violating MERGE delta fails.
    intercept[Exception] {
      TxnLog.merge(spark, t, Seq((-9L, "bad")).toDF("id", "s"), "id")
    }
  }

  test("constraints survive checkpoints, schema evolution, and " +
       "overwrite; RENAME/DROP of a referenced column refuses; " +
       "dropConstraint restores writability") {
    import spark.implicits._
    val t = freshTable("lifecycle")
    TxnLog.create(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxnLog.addConstraint(spark, t, "pos_id", "id > 0")
    // Drive past a checkpoint (interval 10).
    (1 to 12).foreach(i =>
      TxnLog.append(spark, t, Seq((i + 10L, s"r$i")).toDF("id", "s")))
    assert(TxnLog.constraints(spark, t) === Map("pos_id" -> "id > 0"))
    TxnLog.addColumns(spark, t,
      Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType)))
    assert(TxnLog.constraints(spark, t).contains("pos_id"))
    intercept[IllegalArgumentException] {
      TxnLog.renameColumn(spark, t, "id", "id2")
    }
    intercept[IllegalArgumentException] { TxnLog.dropColumn(spark, t, "id") }
    // Unreferenced columns still rename/drop freely.
    TxnLog.renameColumn(spark, t, "s", "s2")
    // Overwrite keeps the invariant: violating replacement fails…
    intercept[Exception] {
      TxnLog.overwrite(spark, t,
        Seq((-1L, "x", "y")).toDF("id", "s2", "extra"))
    }
    // …valid replacement passes and the constraint is still recorded.
    TxnLog.overwrite(spark, t, Seq((7L, "x", "y")).toDF("id", "s2", "extra"))
    assert(TxnLog.constraints(spark, t).contains("pos_id"))
    TxnLog.dropConstraint(spark, t, "pos_id")
    TxnLog.append(spark, t, Seq((-1L, "ok", "z")).toDF("id", "s2", "extra"))
    assert(TxnLog.read(spark, t).count() === 2L)
  }

  test("the exactly-once streaming sink enforces constraints per " +
       "batch: a violating batch fails the query, nothing publishes") {
    import spark.implicits._
    val dst = freshTable("stream")
    val src = freshTable("streamsrc")
    TxnLog.create(spark, dst, Seq((1L, "a")).toDF("id", "s"))
    TxnLog.addConstraint(spark, dst, "pos_id", "id > 0")
    TxnLog.create(spark, src, Seq((2L, "b"), (-3L, "bad")).toDF("id", "s"))
    val q = spark.readStream.format("graft-txn").load(src)
      .writeStream.format("graft-txn")
      .option("path", dst).option("streamId", "ck-ingest")
      .option("checkpointLocation", freshTable("streamckpt"))
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(e.getMessage.contains("pos_id") ||
      Option(e.getCause).exists(c => Option(c.getMessage).exists(
        _.contains("pos_id"))) || e.toString.contains("pos_id"))
    assert(TxnLog.read(spark, dst).count() === 1L,
      "the violating batch must publish nothing")
  }

  test("SQL statements: ADD CONSTRAINT enforces through the catalog " +
       "INSERT path; DROP CONSTRAINT lifts it") {
    val dml = GraftSqlDmlSpec.session
    val root = s"${sys.props("java.io.tmpdir")}/graft_cksql_${System.nanoTime()}"
    dml.conf.set("spark.sql.catalog.ck", classOf[graft.sources.GraftCatalog].getName)
    dml.conf.set("spark.sql.catalog.ck.root", root)
    dml.conf.set("spark.sql.catalog.ck.writable", "true")
    val dir = s"$root/ns/t"
    locally {
      import dml.implicits._
      TxnLog.create(dml, dir, Seq((1L, "a")).toDF("id", "s"))
    }
    dml.sql(s"ALTER TABLE '$dir' ADD CONSTRAINT pos_id CHECK (id > 0)")
    val e = intercept[Exception] {
      dml.sql("INSERT INTO ck.ns.t VALUES (-2, 'x')")
    }
    assert(e.getMessage.contains("pos_id") ||
      Option(e.getCause).exists(_.getMessage.contains("pos_id")))
    dml.sql("INSERT INTO ck.ns.t VALUES (2, 'ok')")
    dml.sql(s"ALTER TABLE '$dir' DROP CONSTRAINT pos_id")
    dml.sql("INSERT INTO ck.ns.t VALUES (-2, 'now fine')")
    assert(dml.sql("SELECT count(*) FROM ck.ns.t").head().getLong(0) === 3L)
  }
}
