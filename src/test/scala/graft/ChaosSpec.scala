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
