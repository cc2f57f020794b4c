package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftCatalog

/** Pins the read-only DSv2 catalog: name resolution over the testdata
  * lake, the REAL parquet scan underneath (pushdown + pruning), parity
  * with the path-based reads, and the read-only contract.
  */
class GraftCatalogSpec extends AnyFunSuite with SparkSpec {

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.tdl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tdl.root", "/root/testdata")
  }

  test("catalog tables resolve and agree with path reads") {
    ensureCatalog()
    val viaCatalog = spark.sql(
      "SELECT count(*) AS n FROM tdl.`sf0.001`.documents").collect()(0).getLong(0)
    val viaPath = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001").count()
    assert(viaCatalog == viaPath && viaCatalog > 0)
  }

  test("SHOW surfaces namespaces and tables from the lake layout") {
    ensureCatalog()
    // Dotted namespace names come back backtick-quoted.
    val ns = spark.sql("SHOW NAMESPACES IN tdl").collect().map(_.getString(0))
    assert(ns.contains("`sf0.001`"), s"namespaces: ${ns.toSeq}")
    val tables = spark.sql("SHOW TABLES IN tdl.`sf0.001`")
      .collect().map(_.getString(1))
    assert(graft.sources.Tables.names.forall(tables.contains),
      s"tables: ${tables.toSeq}")
  }

  test("catalog scans keep predicate pushdown and column pruning") {
    ensureCatalog()
    val df = spark.sql(
      "SELECT o_orderkey FROM tdl.`sf0.001`.orders WHERE o_orderkey = 7")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(o_orderkey)"),
      s"no pushdown through the catalog:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("o_totalprice"),
      s"column pruning lost through the catalog:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("catalog joins plan like path joins (broadcast the small side)") {
    ensureCatalog()
    val df = spark.sql(
      """SELECT n.n_name, count(*) AS n_cust
        |FROM tdl.`sf0.001`.customer c
        |JOIN tdl.`sf0.001`.nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY n.n_name ORDER BY n_cust DESC, n_name LIMIT 3""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(df.collect().length == 3)
  }

  test("txn-log tables resolve through the catalog with SQL time " +
       "travel (VERSION AS OF / TIMESTAMP AS OF)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // A scratch lake root: one namespace, one TxnLog table.
    val root = s"${sys.props("java.io.tmpdir")}/graft_cat_${System.nanoTime()}"
    val table = s"$root/ns/tt"
    graft.sources.TxnLog.create(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    graft.sources.TxnLog.append(spark, table, Seq((3L, "c")).toDF("id", "s"))
    spark.conf.set("spark.sql.catalog.ttl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ttl.root", root)

    assert(spark.sql("SELECT count(*) AS n FROM ttl.ns.tt")
      .collect()(0).getLong(0) === 3)
    assert(spark.sql("SELECT count(*) AS n FROM ttl.ns.tt VERSION AS OF 0")
      .collect()(0).getLong(0) === 2)
    // TIMESTAMP AS OF now → the latest version.
    val nowUtc = java.time.Instant.now().plusSeconds(60)
      .toString.replace("T", " ").takeWhile(_ != '.')
    assert(spark.sql(
      s"SELECT count(*) AS n FROM ttl.ns.tt TIMESTAMP AS OF '$nowUtc'")
      .collect()(0).getLong(0) === 3)
    // SHOW TABLES lists the txn directory alongside plain parquet.
    val tables = spark.sql("SHOW TABLES IN ttl.ns").collect().map(_.getString(1))
    assert(tables.contains("tt"))

    // A live deletion vector refuses the bare SQL scan (silently
    // over-reading masked rows would be a correctness hole).
    graft.sources.TxnLog.deleteMoR(spark, table, col("id") === 2L)
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM ttl.ns.tt").collect()
    }
    assert(e.getMessage.contains("deletion vectors"))
    // Compaction materializes the mask; SQL works again.
    graft.sources.TxnLog.compact(spark, table, targetFiles = 1)
    assert(spark.sql("SELECT count(*) AS n FROM ttl.ns.tt")
      .collect()(0).getLong(0) === 2)
  }

  test("the catalog is read-only: DDL and writes are refused") {
    ensureCatalog()
    intercept[UnsupportedOperationException] {
      spark.sql("DROP TABLE tdl.`sf0.001`.documents")
    }
    intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE tdl.`sf0.001`.t2 (id BIGINT) USING parquet")
    }
  }
}
