package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session extensions registering the engine's native expressions with
  * the SQL function registry, so `spark.sql("SELECT hash60(text) ...")`
  * works alongside the Column API (the brief's extension mechanism:
  * custom Catalyst surface wired via `SparkSessionExtensions`).
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (done by [[GraftSession]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionBuilders.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(cls, name), builder))
    }
    // Table-valued CDC/audit surface over txn-log tables:
    //   SELECT * FROM table_changes('/path/to/table', v1, v2)
    //   SELECT * FROM table_history('/path/to/table')
    // — the SQL face of TxnLog.changes/history (the Delta-style TVFs).
    // Arguments are literals folded at analysis; the plan is the same
    // churned-files-only diff the Scala API builds.
    GraftExtensions.tableFunctionBuilders.foreach { case (name, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.sources.TxnLog", name), builder))
    }
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftasof.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.GraftNativeRewrite)
    // SQL DML over txn-log tables intercepts at the PARSER (see
    // TxnSqlDml for why the analyzer's row-level path can't be joined
    // from an extension) …
    ext.injectParser((_, parser) => new graft.plans.GraftSqlParser(parser))
    // SQL point-lookups over bloom-indexed (or partitioned) txn
    // tables file-prune through the metadata tiers at plan time —
    // injected BEFORE the masked-read rule so a Filter-over-relation
    // gets the pruned rewrite first (its readState plan applies DV
    // masks and partition attachment too); relations the prune rule
    // leaves alone still get the masked rewrite below in the same
    // resolution iteration.
    ext.injectResolutionRule(session =>
      graft.plans.TxnSqlDml.BloomScanRule(session))
    // … and SQL SCANS of deletion-vector-carrying, column-mapped, or
    // partitioned tables rewrite to the readState plan during
    // resolution.
    ext.injectResolutionRule(session =>
      graft.plans.TxnSqlDml.MaskedReadRule(session))
  }
}

object GraftExtensions {

  private def literalString(e: Expression, usage: String): String = {
    require(e.foldable, usage)
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case bad => throw new IllegalArgumentException(s"$usage; got $bad")
    }
  }

  /** A TVF's table argument: a filesystem path verbatim, or a
    * `catalog.ns.table` NAME resolved through a registered
    * [[graft.sources.GraftCatalog]] — the same addressing the
    * maintenance statements take, so `table_changes('lake.ns.t', …)`
    * works like `VACUUM lake.ns.t`. Dotted strings that do NOT
    * resolve fall through as paths (a relative path can contain
    * dots), keeping every existing call site untouched. */
  private def tableArg(e: Expression, usage: String): String = {
    val raw = literalString(e, usage)
    if (raw.contains('/') || raw.contains('\\')) return raw
    val spark = org.apache.spark.sql.SparkSession.active
    scala.util.Try(spark.sessionState.sqlParser.parseMultipartIdentifier(raw))
      .toOption
      .flatMap(graft.plans.TxnSqlDml.txnDir(spark, _))
      .getOrElse(raw)
  }

  private def literalLong(e: Expression, usage: String): Long = {
    require(e.foldable, usage)
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case bad => throw new IllegalArgumentException(s"$usage; got $bad")
    }
  }

  /** Table-valued functions (path-addressed; catalog tables resolve
    * their own time travel through `VERSION AS OF`). Each builder runs
    * at analysis time in the active session and returns the SAME
    * logical plan the Scala API builds — churned-files-only CDC diff,
    * driver-metadata history. */
  private[graft] val tableFunctionBuilders: Seq[(String,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    ("table_changes", { children =>
      val u = "usage: table_changes('/path/to/txn/table', fromVersion|" +
        "'fromTimestamp', toVersion|'toTimestamp')"
      require(children.length == 3, u)
      val spark = org.apache.spark.sql.SparkSession.active
      val table = tableArg(children(0), u)
      // A version bound may be a commit number or a timestamp string —
      // the latter resolves through the SAME commit-mtime rule as the
      // catalog's TIMESTAMP AS OF, so `table_changes(p, t1, t2)` is
      // exactly the diff of the snapshots you'd read at t1 and t2.
      def bound(e: org.apache.spark.sql.catalyst.expressions.Expression): Long = {
        require(e.foldable, u)
        e.eval() match {
          case n: java.lang.Number => n.longValue()
          case s: org.apache.spark.unsafe.types.UTF8String =>
            graft.sources.TxnLog.versionAtTimestamp(spark, table,
              graft.sources.TxnLog.parseTsMicros(s.toString))
          case bad => throw new IllegalArgumentException(s"$u; got $bad")
        }
      }
      org.apache.spark.sql.graftbridge.Bridge.planOf(
        graft.sources.TxnLog.changes(spark, table,
          bound(children(1)), bound(children(2))))
    }),
    ("table_history", { children =>
      val u = "usage: table_history('/path/to/txn/table')"
      require(children.length == 1, u)
      val spark = org.apache.spark.sql.SparkSession.active
      org.apache.spark.sql.graftbridge.Bridge.planOf(
        graft.sources.TxnLog.history(spark, tableArg(children(0), u)))
    }),
    ("table_files", { children =>
      val u = "usage: table_files('/path/to/txn/table'[, version])"
      require(children.nonEmpty && children.length <= 2, u)
      val spark = org.apache.spark.sql.SparkSession.active
      org.apache.spark.sql.graftbridge.Bridge.planOf(
        graft.sources.TxnLog.files(spark, tableArg(children(0), u),
          children.lift(1).map(literalLong(_, u))))
    }),
    ("table_constraints", { children =>
      val u = "usage: table_constraints('/path/to/txn/table')"
      require(children.length == 1, u)
      val spark = org.apache.spark.sql.SparkSession.active
      import spark.implicits._
      org.apache.spark.sql.graftbridge.Bridge.planOf(
        graft.sources.TxnLog.constraints(spark,
            tableArg(children(0), u))
          .toSeq.sortBy(_._1).toDF("name", "expression"))
    }),
    ("table_partitions", { children =>
      val u = "usage: table_partitions('/path/to/txn/table'[, version])"
      require(children.nonEmpty && children.length <= 2, u)
      val spark = org.apache.spark.sql.SparkSession.active
      org.apache.spark.sql.graftbridge.Bridge.planOf(
        graft.sources.TxnLog.partitions(spark, tableArg(children(0), u),
          children.lift(1).map(literalLong(_, u))))
    }),
    ("table_ingests", { children =>
      // COPY INTO's ledger, one row per ingested source file — the
      // audit face of exactly-once ingestion ("did upload X land, and
      // in which commit?").
      val u = "usage: table_ingests('/path/to/txn/table'[, version])"
      require(children.nonEmpty && children.length <= 2, u)
      val spark = org.apache.spark.sql.SparkSession.active
      org.apache.spark.sql.graftbridge.Bridge.planOf(
        graft.sources.TxnLog.ingests(spark, tableArg(children(0), u),
          children.lift(1).map(literalLong(_, u))))
    }))

  /** Fold a literal argument to Int with a clean analysis-time error
    * (never an executor NPE/ClassCastException). */
  private def literalInt(e: Expression, usage: String): Int = {
    require(e.foldable, usage)
    e.eval() match {
      case n: java.lang.Byte    => n.intValue()
      case n: java.lang.Short   => n.intValue()
      case n: java.lang.Integer => n.intValue()
      case n: java.lang.Long if n.longValue() == n.intValue() => n.intValue()
      case bad => throw new IllegalArgumentException(s"$usage; got $bad")
    }
  }

  private def arity(n: Int, usage: String)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => { require(children.length == n, usage); f(children) }

  /** Fold a literal argument to Double with a clean analysis-time error. */
  private def literalDouble(e: Expression, usage: String): Double = {
    require(e.foldable, usage)
    e.eval() match {
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case bad => throw new IllegalArgumentException(s"$usage; got $bad")
    }
  }

  /** SQL builder for `kmv_distinct(hash_col, k)`. Returns the bare
    * AggregateFunction: the analyzer wraps it in an AggregateExpression
    * (and handles DISTINCT/FILTER) itself. */
  private[graft] def kmvBuilder(children: Seq[Expression]): Expression =
    arity(2, "usage: kmv_distinct(hash_col, k) with literal k") { c =>
      KmvDistinctAgg(c.head,
        literalInt(c(1), "usage: kmv_distinct(hash_col, k) with literal integral k"))
    }(children)

  /** The full native-function SQL surface: every Column-API kernel is
    * also callable from `spark.sql` under these names. Constant-table
    * expressions (minhash signatures, LSH planes) take their size
    * parameters as literals and build the driver-side constants exactly
    * as the Column API does, so SQL and Column results are identical. */
  private[graft] val functionBuilders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("hash60", classOf[Hash60Expr].getName,
      arity(1, "usage: hash60(text)")(c => Hash60Expr(c.head))),
    ("kmv_distinct", classOf[KmvDistinctAgg].getName, kmvBuilder(_)),
    ("kmv_values", classOf[KmvValuesAgg].getName,
      arity(2, "usage: kmv_values(hash_col, k) with literal k") { c =>
        KmvValuesAgg(c.head,
          literalInt(c(1), "usage: kmv_values(hash_col, k) with literal integral k"))
      }),
    ("tdigest", classOf[TDigestAgg].getName, { children =>
      val u = "usage: tdigest(value, compression literal, p1 literal, ...)"
      require(children.length >= 3, u)
      TDigestAgg(children.head, literalInt(children(1), u),
        children.drop(2).map(literalDouble(_, u)))
    }),
    ("tdigest_sketch", classOf[TDigestSketchAgg].getName,
      arity(2, "usage: tdigest_sketch(value, compression literal)") { c =>
        TDigestSketchAgg(c.head,
          literalInt(c(1), "usage: tdigest_sketch(value, compression literal)"))
      }),
    ("tdigest_merge", classOf[TDigestMergeAgg].getName, { children =>
      val u = "usage: tdigest_merge(sketch, compression literal, p1 literal, ...)"
      require(children.length >= 3, u)
      TDigestMergeAgg(children.head, literalInt(children(1), u),
        children.drop(2).map(literalDouble(_, u)))
    }),
    ("tokenize", classOf[TokenizeExpr].getName,
      arity(1, "usage: tokenize(text)")(c => TokenizeExpr(c.head))),
    ("shingle_hashes", classOf[ShingleHashExpr].getName,
      arity(2, "usage: shingle_hashes(tokens, n literal)") { c =>
        ShingleHashExpr(c.head,
          literalInt(c(1), "usage: shingle_hashes(tokens, n literal)"))
      }),
    ("dot_product", classOf[DotProductExpr].getName,
      arity(2, "usage: dot_product(a, b)")(c => DotProductExpr(c(0), c(1)))),
    ("dot_long", classOf[DotLongExpr].getName,
      arity(2, "usage: dot_long(a, b)")(c => DotLongExpr(c(0), c(1)))),
    ("topk_pairs", classOf[TopKPairsAgg].getName,
      arity(3, "usage: topk_pairs(score, id, k literal)") { c =>
        TopKPairsAgg(c(0), c(1),
          literalInt(c(2), "usage: topk_pairs(score, id, k literal)"))
      }),
    ("simhash32", classOf[SimHashExpr].getName,
      arity(1, "usage: simhash32(token_hashes)")(c => SimHashExpr(c.head))),
    ("jaccard_sorted", classOf[JaccardExpr].getName,
      arity(2, "usage: jaccard_sorted(a_sorted, b_sorted)")(
        c => JaccardExpr(c(0), c(1)))),
    ("minhash_sig", classOf[MinHashExpr].getName,
      arity(2, "usage: minhash_sig(hashes, k literal)") { c =>
        val k = literalInt(c(1), "usage: minhash_sig(hashes, k literal)")
        val consts = (0 until k).map(TextFunctions.mixConsts)
        MinHashExpr(c.head, consts.map(_._1).toArray, consts.map(_._2).toArray)
      }),
    ("heavy_hitters", classOf[SpaceSavingAgg].getName,
      arity(3, "usage: heavy_hitters(term, capacity literal, k literal)") { c =>
        val u = "usage: heavy_hitters(term, capacity literal, k literal)"
        SpaceSavingAgg(c.head, literalInt(c(1), u), literalInt(c(2), u))
      }),
    ("lsh_bucket", classOf[PlaneBucketExpr].getName,
      arity(3, "usage: lsh_bucket(vec, n_planes literal, dim literal)") { c =>
        val u = "usage: lsh_bucket(vec, n_planes literal, dim literal)"
        PlaneBucketExpr(c.head,
          VectorFunctions.planeMatrix(literalInt(c(1), u), literalInt(c(2), u)))
      }),
    ("count_min", classOf[CountMinAgg].getName,
      arity(3, "usage: count_min(term, depth literal, width literal)") { c =>
        val u = "usage: count_min(term, depth literal, width literal)"
        CountMinAgg(c.head, literalInt(c(1), u), literalInt(c(2), u))
      }),
    ("bloom_build", classOf[BloomBuildAgg].getName,
      arity(3, "usage: bloom_build(key, num_bits literal, num_hashes literal)") { c =>
        val u = "usage: bloom_build(key, num_bits literal, num_hashes literal)"
        BloomBuildAgg(c.head, literalInt(c(1), u), literalInt(c(2), u))
      }),
    ("bloom_might_contain", classOf[BloomMightContain].getName,
      arity(2, "usage: bloom_might_contain(filter, key)")(
        c => BloomMightContain(c(0), c(1)))))
}
