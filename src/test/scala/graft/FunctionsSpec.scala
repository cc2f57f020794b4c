package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions, VectorFunctions}

/** Unit tests for the LLM-pipeline building blocks: shingles, hashing,
  * MinHash/SimHash, and vector math — including the driver-side /
  * executor-side hash-family consistency the dedup oracle mirrors rely
  * on. */
class FunctionsSpec extends AnyFunSuite with SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column): T = {
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")
  }

  test("hash60 expression equals hash60Scala for the same input") {
    for (s <- Seq("", "a", "p3:17", "the quick brown fox", "ω unicode")) {
      assert(one[Long](TextFunctions.hash60(lit(s))) == VectorFunctions.hash60Scala(s),
        s"mismatch for '$s'")
    }
  }

  test("native Hash60Expr ≡ legacy conv(substring(md5)) composition") {
    val inputs = Seq("", "x", "a b c", "doc42", "ω∂ƒ unicode ≠ ascii",
      "\t tab", "0123456789abcdef" * 8) ++
      (1 to 50).map(i => s"generated-input-$i")
    val s = spark
    import s.implicits._
    val df = inputs.toDF("v")
    val rows = df.select(TextFunctions.hash60(col("v")).as("native"),
      TextFunctions.hash60Legacy(col("v")).as("legacy")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("hash60 is registered in SQL via GraftExtensions") {
    // The shared test session doesn't load extensions; register directly
    // through the same builder the extension uses.
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("hash60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.Hash60Expr].getName, "hash60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.Hash60Expr(children.head))
    val got = spark.sql("SELECT hash60('abc') AS h").collect()(0).getLong(0)
    assert(got == VectorFunctions.hash60Scala("abc"))
  }

  test("normalizeText lowercases, strips punctuation, collapses whitespace") {
    assert(one[String](TextFunctions.normalizeText(lit("The  quick, brown FOX!"))) ==
      "the quick brown fox")
    assert(one[String](TextFunctions.normalizeText(lit("  a1 b2  "))) == "a1 b2")
    assert(one[String](TextFunctions.normalizeText(lit("..."))) == "")
  }

  test("shingles: n-grams of tokens; empty when fewer than n tokens") {
    val toks = TextFunctions.tokens(lit("a b c d"))
    assert(one[scala.collection.Seq[String]](TextFunctions.shingles(toks, 3)).toSeq ==
      Seq("a b c", "b c d"))
    assert(one[scala.collection.Seq[String]](
      TextFunctions.shingles(TextFunctions.tokens(lit("a b")), 3)).toSeq ==
      Seq.empty[String])
  }

  test("minhash is the min of the seeded shingle hashes") {
    val shin = Seq("a b c", "b c d")
    val expected = shin.map(s => VectorFunctions.hash60Scala(s"7:$s")).min
    val got = one[Long](TextFunctions.minhash(
      typedLit(shin), 7))
    assert(got == expected)
  }

  test("simhash of identical token lists is identical; fits in `bits` bits") {
    val a = one[Long](TextFunctions.simhash(TextFunctions.tokens(lit("x y z x")), 32))
    val b = one[Long](TextFunctions.simhash(TextFunctions.tokens(lit("x  y z x ")), 32))
    assert(a == b) // normalization makes them the same token list
    assert(a >= 0 && a < (1L << 32))
  }

  test("fingerprintExact collides exactly on normalization-equivalent text") {
    val f1 = one[String](TextFunctions.fingerprintExact(lit("The fox!")))
    val f2 = one[String](TextFunctions.fingerprintExact(lit("the   fox")))
    val f3 = one[String](TextFunctions.fingerprintExact(lit("the fox jumps")))
    assert(f1 == f2 && f1 != f3)
  }

  test("fingerprintShuffle is order- and duplication-insensitive") {
    val f1 = one[String](TextFunctions.fingerprintShuffle(lit("b a c a")))
    val f2 = one[String](TextFunctions.fingerprintShuffle(lit("a b c")))
    assert(f1 == f2)
  }

  test("native DotProductExpr ≡ HOF fold on real embeddings, bit-for-bit") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50).select(col("embedding"))
    val pairs = emb.crossJoin(emb.select(col("embedding").as("e2")))
    val rows = pairs.select(
      VectorFunctions.dot(col("embedding"), col("e2")).as("native"),
      VectorFunctions.dotHof(col("embedding"), col("e2")).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
  }

  test("ragged inputs: dot goes NULL and lsh bucket goes 0, matching the HOF forms") {
    val s = spark
    import s.implicits._
    // A truncated embedding (32 of 64 dims) must surface as MISSING,
    // never as a silent prefix score or an arbitrary bucket.
    val planes = VectorFunctions.planeMatrix(4, 4)
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f, 4.0f), Seq(1.0f, 1.0f, 1.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 1.0f, 1.0f, 1.0f))) // ragged left
      .toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof"),
      VectorFunctions.lshBucket(col("a"), planes).as("nb"),
      VectorFunctions.lshBucketHof(col("a"), planes).as("hb")).collect()
    assert(!rows(0).isNullAt(0) && rows(0).getDouble(0) == 10.0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1),
      "mismatched lengths must be NULL in both forms")
    assert(rows(1).getLong(2) == 0L && rows(1).getLong(3) == rows(1).getLong(2),
      "ragged vector must bucket to 0 in both forms")
  }

  test("native dot on array<tinyint> ≡ HOF fold over cast doubles, bit-for-bit") {
    // The int8 quantized-code path: every product is an integer ≤ 127²·dim,
    // exactly representable, so the byte fold must match the double fold
    // over the cast arrays on raw bits.
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select(transform(col("embedding"), x =>
        round(x.cast("double") * 127).cast("tinyint")).as("q"))
    val pairs = emb.crossJoin(emb.select(col("q").as("q2")))
    val rows = pairs.select(
      VectorFunctions.dot(col("q"), col("q2")).as("native"),
      VectorFunctions.dotHof(col("q").cast("array<double>"),
        col("q2").cast("array<double>")).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
  }

  test("native DotLongExpr ≡ HOF fold ≡ BigInt model on µ-unit embeddings") {
    // The integer inner loop of the Lloyd/k-means chain: exact on longs,
    // NULL on ragged input, bit-identical to the declarative twin.
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(30)
      .select(VectorFunctions.microUnits(col("embedding")).as("e"))
    val pairs = emb.crossJoin(emb.select(col("e").as("e2")))
    val rows = pairs.select(col("e"), col("e2"),
      VectorFunctions.dotLong(col("e"), col("e2")).as("native"),
      VectorFunctions.dotLongHof(col("e"), col("e2")).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val model = r.getSeq[Long](0).zip(r.getSeq[Long](1))
        .map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      assert(BigInt(r.getLong(2)) == model && r.getLong(2) == r.getLong(3))
    }
    val s = spark
    import s.implicits._
    val ragged = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(VectorFunctions.dotLong(col("a"), col("b")).as("native"),
        VectorFunctions.dotLongHof(col("a"), col("b")).as("hof")).collect()
    assert(ragged(0).isNullAt(0) && ragged(0).isNullAt(1),
      "mismatched lengths must be NULL in both forms")
  }

  test("native SimHashExpr ≡ declarative 32-fold form on real documents") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(transform(col("toks"), t => TextFunctions.hash60(t)).as("th"))
    val rows = docs.select(
      graft.functions.SimHashExpr(col("th")).as("native"),
      TextFunctions.simhashOnHashes(col("th"), 32).as("declarative")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native sorted-merge Jaccard ≡ array_intersect formulation") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(3L, 5L, 7L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq.empty[Long], Seq(1L, 2L)))
      .toDF("a", "b")
    val rows = pairs.select(
      graft.functions.JaccardExpr(col("a"), col("b")).as("native"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        (size(col("a")) + size(col("b")) -
          size(array_intersect(col("a"), col("b"))))).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // Empty ∪ empty is undefined for the division form; native defines 0.
    val emptyBoth = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(graft.functions.JaccardExpr(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(emptyBoth == 0.0)
  }

  test("cosine: 1 for identical vectors, 0 for orthogonal, symmetric") {
    val v = typedLit(Seq(1.0f, 2.0f, 3.0f))
    val w = typedLit(Seq(-2.0f, 1.0f, 0.0f))
    assert(math.abs(one[Double](VectorFunctions.cosine(v, v)) - 1.0) < 1e-12)
    assert(math.abs(one[Double](VectorFunctions.cosine(v, w))) < 1e-12)
    assert(one[Double](VectorFunctions.cosine(v, w)) ==
      one[Double](VectorFunctions.cosine(w, v)))
  }

  test("planeMatrix is deterministic with entries in [-1, 1]") {
    val p1 = VectorFunctions.planeMatrix(4, 8)
    val p2 = VectorFunctions.planeMatrix(4, 8)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(x => x >= -1.0 && x <= 1.0))
  }

  test("lshBucket lands in [0, 2^nPlanes) and identical vectors share a bucket") {
    val planes = VectorFunctions.planeMatrix(4, 3)
    val v = typedLit(Seq(0.5f, -0.25f, 0.125f))
    val b1 = one[Long](VectorFunctions.lshBucket(v, planes))
    val b2 = one[Long](VectorFunctions.lshBucket(v, planes))
    assert(b1 == b2 && b1 >= 0 && b1 < 16)
  }

  test("native PlaneBucketExpr ≡ declarative lshBucket over real embeddings") {
    // Bit-identity on every vector of the sf0.01 embeddings table (the
    // exact input the LSH queries bucket), plus the zero vector (all
    // projections 0.0 -> no bit set: round(0)=0 is not > 0).
    val planes = VectorFunctions.planeMatrix(6, 64)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val diff = e.select(
      VectorFunctions.lshBucket(org.apache.spark.sql.functions.col("embedding"), planes).as("native"),
      VectorFunctions.lshBucketHof(org.apache.spark.sql.functions.col("embedding"), planes).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0L)
    val s = spark
    import s.implicits._
    val zero = Seq(Seq.fill(64)(0.0f)).toDF("v")
      .select(VectorFunctions.lshBucket(col("v"), planes)).collect()(0).getLong(0)
    assert(zero == 0L)
  }

  test("native MinHashExpr ≡ per-component minhashMixed folds") {
    val s = spark
    import s.implicits._
    val k = 8
    // Real-ish inputs: distinct hash60 values of generated shingles,
    // plus edge shapes (single element, repeated mins).
    val inputs: Seq[Seq[Long]] =
      (1 to 30).map(i => (0 until (i % 7) + 1)
        .map(j => VectorFunctions.hash60Scala(s"sh-$i-$j")).toSeq) :+
        Seq(0L) :+ Seq(TextFunctions.MixP - 1, 0L, 5L)
    val df = inputs.toDF("hs")
    val rows = df.select(
      graft.functions.MinHashExpr(col("hs"), k).as("native"),
      array((0 until k).map(i => TextFunctions.minhashMixed(col("hs"), i)): _*)
        .as("legacy")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r")
    }
    // Empty input: null, matching array_min over an empty transform.
    val empty = Seq(Seq.empty[Long]).toDF("hs")
      .select(graft.functions.MinHashExpr(col("hs"), k)).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("native TokenizeExpr ≡ legacy regex chain on real documents and edges") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val diff = docs.select(
      TextFunctions.tokens(col("text")).as("native"),
      TextFunctions.tokensLegacy(col("text")).as("legacy"))
      .filter(col("native") =!= col("legacy")).count()
    assert(diff == 0L)
    val ndiff = docs.select(
      TextFunctions.normalizeText(col("text")).as("n"),
      TextFunctions.normalizeTextLegacy(col("text")).as("l"))
      .filter(col("n") =!= col("l")).count()
    assert(ndiff == 0L)
    val s = spark
    import s.implicits._
    // Edge shapes, including the Unicode case-mapping corners the
    // scaladoc's case analysis names: Kelvin sign (→ k), İ (→ i +
    // boundary: "İx" must split), one-to-one non-ASCII lowercases,
    // supplementary characters (surrogate pairs), and the
    // empty-normalization artifact (single empty token).
    val edges = Seq("", "   ", "!!!", "A1 b2", "x\ty\nz", "a  b",
      " lead trail ", "Kelvin", "İx", "Aİ B",
      "ÀÉß", "a𝒳b", "MiXeD CaSe 42")
    val rows = edges.toDF("text").select(
      TextFunctions.tokens(col("text")).as("native"),
      TextFunctions.tokensLegacy(col("text")).as("legacy")).collect()
    rows.zip(edges).foreach { case (r, in) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"input: '$in'")
    }
    assert(rows(0).getSeq[String](0) == Seq("")) // split("") artifact
    assert(rows(8).getSeq[String](0) == Seq("i", "x")) // İ boundary
  }

  test("tokenizer equivalence holds on random ASCII strings (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val gen = Gen.listOf(Gen.frequency(
      4 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\t', '\n', '.', ',', '!'),
      1 -> Gen.choose(0.toChar, 127.toChar))).map(_.mkString)
    val samples = (0 until 300).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val diff = samples.toDF("text").select(
      TextFunctions.tokens(col("text")).as("native"),
      TextFunctions.tokensLegacy(col("text")).as("legacy"))
      .filter(col("native") =!= col("legacy")).count()
    assert(diff == 0L)
  }

  test("native ShingleHashExpr ≡ declarative shingle→hash60→distinct→sort chain") {
    // Bit-identity over every real document (the exact input of the
    // dedup family), including short docs (< n tokens → empty array).
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val diff = docs.select(
      TextFunctions.hashedShingleSet(col("toks"), 3).as("native"),
      array_sort(array_distinct(transform(TextFunctions.shingles(col("toks"), 3),
        sh => TextFunctions.hash60(sh)))).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0L)
    val s = spark
    import s.implicits._
    // Edge shapes: empty, below-n, exactly-n, duplicated shingles.
    val edges = Seq(Seq.empty[String], Seq("a"), Seq("a", "b"),
      Seq("a", "b", "c"), Seq("x", "x", "x", "x", "x")).toDF("toks")
    val rows = edges.select(
      TextFunctions.hashedShingleSet(col("toks"), 3).as("native"),
      array_sort(array_distinct(transform(TextFunctions.shingles(col("toks"), 3),
        sh => TextFunctions.hash60(sh)))).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"$r"))
    assert(rows(4).getSeq[Long](0).length == 1) // "x x x" three times → one hash
    // Null elements are skipped within their window exactly like the
    // chain's concat_ws ([a, null, b] hashes "a b"; all-null hashes "").
    val withNulls = Seq(
      Seq(Some("a"), None, Some("b"), Some("c")),
      Seq[Option[String]](None, None, None)).toDF("toks")
    val nrows = withNulls.select(
      TextFunctions.hashedShingleSet(col("toks"), 3).as("native"),
      array_sort(array_distinct(transform(TextFunctions.shingles(col("toks"), 3),
        sh => TextFunctions.hash60(sh)))).as("hof")).collect()
    nrows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"$r"))
  }

  test("shingle-hash equivalence holds on random token arrays (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    // Small alphabet forces repeated tokens (and thus repeated
    // shingles, exercising the dedup path); lengths 0..9 cross the
    // below-n boundary.
    val gen = Gen.choose(0, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "x1")))
    val samples = (0 until 300).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val diff = samples.toDF("toks").select(
      TextFunctions.hashedShingleSet(col("toks"), 3).as("native"),
      array_sort(array_distinct(transform(TextFunctions.shingles(col("toks"), 3),
        sh => TextFunctions.hash60(sh)))).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0L)
  }

  test("array-constant expressions canonicalize equal across separate builds") {
    // MinHashExpr/PlaneBucketExpr carry Array constants; the synthesized
    // case-class equals compared them by REFERENCE, so two identical
    // columns built by separate calls never canonicalized equal —
    // defeating Catalyst CSE and exchange reuse. Value-semantics
    // equals/hashCode restore it.
    // Construct over a shared child, as Catalyst compares them: in a
    // resolved plan both columns reference the same AttributeReference
    // (unresolved Column wrappers carry per-callsite Origin and never
    // compare equal — that is not the layer canonicalization sees).
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    val hs = Literal.create(Seq(1L, 2L, 3L), ArrayType(LongType))
    def mh(k: Int) = {
      val consts = (0 until k).map(TextFunctions.mixConsts)
      graft.functions.MinHashExpr(hs,
        consts.map(_._1).toArray, consts.map(_._2).toArray)
    }
    val (m1, m2) = (mh(8), mh(8))
    assert(m1 == m2 && m1.hashCode == m2.hashCode)
    assert(m1.semanticEquals(m2))
    val v = Literal.create(Seq(0.5f, -0.5f), ArrayType(FloatType))
    def pb(nPlanes: Int) = graft.functions.PlaneBucketExpr(
      v, VectorFunctions.planeMatrix(nPlanes, 64))
    val (p1, p2) = (pb(6), pb(6))
    assert(p1 == p2 && p1.hashCode == p2.hashCode)
    assert(p1.semanticEquals(p2))
    // Different constant tables must still distinguish.
    assert(m1 != mh(4))
    assert(p1 != pb(5))
  }

  test("GraftExtensions wiring registers the native functions and the as-of strategy") {
    // The real spark.sql.extensions path (a fresh session would load
    // GraftExtensions via config); the shared test JVM can't restart
    // its context, so materialize the injections directly.
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftbridge.Bridge
    val installer = new graft.GraftExtensions
    val reg = Bridge.registeredFunctions(installer)
    for (name <- Seq("hash60", "kmv_distinct", "tdigest", "tdigest_sketch",
      "tdigest_merge", "tokenize", "shingle_hashes",
      "dot_product", "dot_long", "simhash32", "jaccard_sorted", "minhash_sig",
      "lsh_bucket",
      "heavy_hitters", "count_min", "bloom_build", "bloom_might_contain"))
      assert(reg.functionExists(FunctionIdentifier(name)), name)
    val bb = reg.lookupFunction(FunctionIdentifier("bloom_build"),
      Seq(Literal(1L), Literal(1024), Literal(5)))
    assert(bb.isInstanceOf[graft.functions.BloomBuildAgg])
    val bm = reg.lookupFunction(FunctionIdentifier("bloom_might_contain"),
      Seq(Literal.create(Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0),
        org.apache.spark.sql.types.BinaryType), Literal(1L)))
    assert(bm.isInstanceOf[graft.functions.BloomMightContain])
    val h = reg.lookupFunction(FunctionIdentifier("hash60"), Seq(Literal("x")))
    assert(h.isInstanceOf[graft.functions.Hash60Expr])
    val k = reg.lookupFunction(FunctionIdentifier("kmv_distinct"),
      Seq(Literal(1L), Literal(16)))
    assert(k.isInstanceOf[graft.functions.KmvDistinctAgg])
    // Constant-table builders construct the same driver-side constants
    // as the Column API (SQL ≡ Column results).
    val mh = reg.lookupFunction(FunctionIdentifier("minhash_sig"),
      Seq(Literal.create(Seq(1L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)), Literal(4)))
    val mhDirect = Bridge.expression(
      graft.functions.MinHashExpr(org.apache.spark.sql.functions.col("hs"), 4))
    assert(mh.asInstanceOf[graft.functions.MinHashExpr].a.toSeq ==
      mhDirect.asInstanceOf[graft.functions.MinHashExpr].a.toSeq)
    // A non-literal size parameter fails at analysis, not on executors.
    intercept[IllegalArgumentException] {
      reg.lookupFunction(FunctionIdentifier("shingle_hashes"),
        Seq(Literal("x"), Literal("x")))
    }
    val strategies = Bridge.plannerStrategies(spark, installer)
    assert(strategies.contains(org.apache.spark.sql.graftasof.AsOfJoinStrategy))
  }

  test("approx-percentile rank gate is falsifiable: a poisoned quantile trips it") {
    // q_percentiles_approx's DuckDB oracle is a tolerance SELF-check
    // (hard-coded TRUE), so the gate's ability to fail must be proven
    // here: feed claims through the same rankGate the query uses.
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag"), col("l_extendedprice"))

    // Positive control: the real GK sketch passes at its published eps.
    val real = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D), 1000)").as("ap"))
      .select(col("l_returnflag").as("rf"),
        element_at(col("ap"), 1).as("a50"), element_at(col("ap"), 2).as("a90"))
    val ok = graft.queries.ScalarQueries.rankGate(li, real, 1.0 / 1000).collect()
    assert(ok.nonEmpty && ok.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "real sketch should pass its own guarantee")

    // Poisoned claim: the group MINIMUM offered as both p50 and p90 —
    // rank 0, nowhere near the n/2 and 9n/10 targets. Every group's
    // gate must trip (deterministic: no sketch involved).
    val poisoned = li.groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("a50"), min("l_extendedprice").as("a90"))
      .select(col("l_returnflag").as("rf"), col("a50"), col("a90"))
    val bad = graft.queries.ScalarQueries.rankGate(li, poisoned, 1.0 / 1000).collect()
    assert(bad.nonEmpty && bad.forall(r => !r.getBoolean(2) && !r.getBoolean(3)),
      "poisoned quantiles must fail the rank gate")
  }
}
