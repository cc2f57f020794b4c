package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.chaos.SlowInject
import graft.operators.{InvertedIndex, WordCount}

/** Chaos-harness tests (SURVEY M3): injected latency fires where
  * targeted, is observable via accumulators, and NEVER changes query
  * results (the harness invariant the reference maintains by sleeping
  * inside otherwise-unchanged map/reduce kernels). */
class ChaosSpec extends AnyFunSuite with SparkSpec {

  private def lines(ls: Seq[String]) = {
    val s = spark
    import s.implicits._
    ls.toDF("value")
  }

  private val indexFixture: Seq[String] =
    (1 to 5).flatMap(i => Seq(s"apple\tdoc$i", s"banana\tdoc$i", s"cat\tdoc$i")) :+
      "zebra\tdoc6"

  override def afterAll(): Unit = {
    SlowInject.reset(spark)
    super.afterAll()
  }

  test("disabled chaos is a plan no-op") {
    SlowInject.reset(spark)
    val df = lines(Seq("a", "b"))
    assert(SlowInject.slowMap(df).df eq df)
  }

  test("slow-map fires per eachN record, counts hits, preserves results") {
    SlowInject.reset(spark)
    spark.conf.set("spark.graft.slow.map.sleep.ms", "20")
    spark.conf.set("spark.graft.slow.map.eachN", "1")
    try {
      val base = lines(indexFixture)
      val inj = SlowInject.slowMap(base)
      val t0 = System.nanoTime()
      val got = InvertedIndex(InvertedIndex.parsePairs(inj.df)).collect().toSeq
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      val want = InvertedIndex(InvertedIndex.parsePairs(base)).collect().toSeq
      assert(got == want)
      assert(inj.hits.value == indexFixture.size) // every record slept
      // 16 records × 20 ms spread over 4 local cores ≥ ~80 ms of added wall time.
      assert(elapsedMs >= 80, s"elapsed $elapsedMs ms")
    } finally SlowInject.reset(spark)
  }

  test("slow-map partition targeting only hits the listed partitions") {
    SlowInject.reset(spark)
    spark.conf.set("spark.graft.slow.map.sleep.ms", "1")
    spark.conf.set("spark.graft.slow.map.partitions", "0")
    try {
      val base = lines((1 to 40).map(i => s"w$i")).repartition(4)
      val inj = SlowInject.slowMap(base)
      val n = inj.df.count()
      assert(n == 40)
      assert(inj.hits.value > 0 && inj.hits.value < 40) // one of 4 partitions
    } finally SlowInject.reset(spark)
  }

  test("heavy-key injection sleeps exactly on the skewed key, results unchanged") {
    SlowInject.reset(spark)
    spark.conf.set("spark.graft.slow.reduce.heavy.key", "zebra")
    spark.conf.set("spark.graft.slow.reduce.heavy.sleep.ms", "150")
    try {
      val base = InvertedIndex(InvertedIndex.parsePairs(lines(indexFixture)))
      val inj = SlowInject.slowReduce(base, "word")
      val t0 = System.nanoTime()
      val got = inj.df.collect().toSeq
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(got == base.collect().toSeq)
      assert(inj.hits.value == 1) // exactly the zebra group
      assert(elapsedMs >= 150, s"elapsed $elapsedMs ms")
    } finally SlowInject.reset(spark)
  }

  test("chaos hits surface as graft.* attributes on task spans") {
    import graft.observe.{InMemoryExporter, Trace}
    SlowInject.reset(spark)
    spark.conf.set("spark.graft.slow.map.sleep.ms", "1")
    val exporter = new InMemoryExporter
    val h = Trace.install(spark, exporter)
    try {
      val inj = SlowInject.slowMap(lines(indexFixture))
      InvertedIndex(InvertedIndex.parsePairs(inj.df)).collect()
      val deadline = System.currentTimeMillis() + 10000
      def hitSpans = exporter.named("spark.task")
        .filter(_.attributes.get("graft.slow.map.hits").exists(_.toLong > 0))
      while (System.currentTimeMillis() < deadline && hitSpans.isEmpty)
        Thread.sleep(100)
      assert(hitSpans.nonEmpty,
        "expected task spans carrying the chaos hit accumulator")
    } finally {
      Trace.uninstall(spark, h)
      SlowInject.reset(spark)
    }
  }

  test("planted heavy key: chaos hits it and AQE splits its skewed join partition") {
    // T9 (heavy key) meets the engine's actual skew remedy: the chaos
    // gate marks the hot key's rows (accumulator-visible), and AQE's
    // skew-join optimization — enabled in GraftSession — splits the
    // oversized shuffle partition into advisory-sized sub-reads, which
    // is what bounds a straggler reducer at 100 TB. Thresholds are
    // lowered to demonstration scale; the payload is per-row hashes
    // because shuffle partition sizes are measured on COMPRESSED bytes
    // (a constant payload would compress ~100x and never trip the
    // detector).
    import org.apache.spark.sql.functions._
    val s = spark
    val savedKeys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = savedKeys.map(k => k -> s.conf.getOption(k)).toMap
    SlowInject.reset(s)
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.graft.slow.reduce.heavy.key", "0")
      s.conf.set("spark.graft.slow.reduce.heavy.sleep.ms", "1")

      // Half the rows share key 0 (the planted skew), each carrying
      // ~512 B of incompressible payload.
      val payload = concat((1 to 8).map(i =>
        sha2(concat(col("id").cast("string"), lit(s"#$i")), 256)): _*)
      val left0 = s.range(0, 4000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
        payload.as("v"))
      val inj = SlowInject.slowReduce(left0, "k")
      val right = s.range(0, 4000).select(col("id").as("k"), lit("r").as("rv"))
      val joined = inj.df.join(right, "k")
      val rows = joined.collect()
      assert(rows.length == 4000) // 2000 key-0 matches + 2000 distinct
      assert(inj.hits.value == 2000L, "chaos heavy-key gate should hit every hot row")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire; final plan:\n$plan")
    } finally {
      SlowInject.reset(s)
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    }
  }

  test("chaos composes with wordcount without changing counts") {
    SlowInject.reset(spark)
    spark.conf.set("spark.graft.slow.map.sleep.ms", "1")
    spark.conf.set("spark.graft.slow.map.eachN", "5")
    try {
      val fixture = Seq("the quick brown fox", "the lazy dog", "the end")
      val base = WordCount(lines(fixture)).collect().toSeq
      val inj = SlowInject.slowMap(lines(fixture))
      val got = WordCount(inj.df, "value").collect().toSeq
      assert(got == base)
    } finally SlowInject.reset(spark)
  }
}
