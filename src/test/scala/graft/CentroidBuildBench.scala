package graft

/** One-off micro-benchmark for [[graft.functions.CentroidIndex.build]]
  * at production model sizes (`sbt "Test/runMain graft.CentroidBuildBench"`)
  * — NOT a spec: the r12 verdict asked for a measured driver-side build
  * point at K ≥ 100 k (the coarse-index build is the one driver-side
  * O(K·√K·dim) loop in the vector family), recorded in PLANS.md. */
object CentroidBuildBench {
  def main(args: Array[String]): Unit = {
    val dim = 64
    for (k <- Seq(10000, 100000, 300000)) {
      val rnd = new scala.util.Random(42)
      val model: Seq[(Long, Array[Long], Long)] = (0 until k).map { i =>
        val v = Array.fill(dim)((rnd.nextInt(2000001) - 1000000).toLong)
        (i.toLong, v, v.map(x => x * x).sum)
      }
      graft.functions.CentroidIndex.build(model.take(2000)) // JIT warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.functions.CentroidIndex.build(model)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"K=$k%7d dim=$dim build median=${samples(1)}%.0f ms " +
        f"(min=${samples.head}%.0f max=${samples.last}%.0f)")
    }
  }
}
