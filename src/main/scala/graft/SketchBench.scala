package graft

import graft.functions.SpaceSavingBuffer

/** Spark-free micro-benchmark for the SpaceSaving buffer's update path.
  *
  * Measures offers/sec on a deterministic heavy-tailed stream at the
  * tested capacity (64) and a production capacity (4096), against an
  * inline reimplementation of the previous map+minBy layout whose
  * eviction scanned all `capacity` entries per post-saturation insert.
  * The stream is mostly-unseen terms (the eviction-heavy worst case the
  * O(capacity) scan is quadratic on).
  *
  * Run: `sbt "runMain graft.SketchBench"`; numbers land in PLANS.md.
  */
object SketchBench {

  /** The pre-round-6 layout, kept here only as the measurement baseline. */
  private final class MinByBuffer(capacity: Int) {
    val entries = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    def offer(term: String): Unit = entries.get(term) match {
      case Some((c, e)) => entries.update(term, (c + 1, e))
      case None if entries.size < capacity => entries.update(term, (1L, 0L))
      case None =>
        val (victim, (vc, _)) = entries.minBy { case (t, (c, e)) => (c, -e, t) }
        entries.remove(victim)
        entries.update(term, (vc + 1, vc))
    }
  }

  /** Deterministic stream: 10% a small hot set, 90% effectively-unseen
    * tail (LCG-generated ids over a domain >> capacity). */
  private def stream(n: Int, seed: Long): Array[String] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    Array.fill(n) {
      val r = next() >>> 1
      if (r % 10 == 0) "hot" + (r % 16) else "t" + (r % 10000000L)
    }
  }

  private def time(label: String, terms: Array[String])(offer: String => Unit): Double = {
    val t0 = System.nanoTime()
    var i = 0
    while (i < terms.length) { offer(terms(i)); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    val rate = terms.length / sec / 1e6
    println(f"$label%-28s ${terms.length}%9d offers in $sec%7.3f s  = $rate%7.2f M offers/s")
    rate
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000000)
    val terms = stream(n, 42L)
    // JIT warm-up on both paths, discarded.
    locally { val w = new SpaceSavingBuffer(4096); terms.take(500000).foreach(w.offer) }
    locally { val w = new MinByBuffer(64); terms.take(200000).foreach(w.offer) }
    Seq(64, 4096).foreach { cap =>
      val ss = new SpaceSavingBuffer(cap)
      time(s"stream-summary cap=$cap", terms)(ss.offer)
      val mb = new MinByBuffer(cap)
      // The minBy baseline at 4096 is the quadratic regime; cut the
      // stream so the bench terminates in seconds either way.
      val cut = if (cap > 256) terms.take(n / 10) else terms
      time(s"minby-baseline cap=$cap", cut)(mb.offer)
    }
  }
}
