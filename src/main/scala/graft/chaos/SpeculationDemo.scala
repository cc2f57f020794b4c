package graft.chaos

import java.io.File

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession

import graft.observe.{JsonFileExporter, Trace}

/** Chaos × speculation demo (SURVEY §2.11, the reference's
  * straggler-analysis semantic: attempt ids recorded per task,
  * `trace-wordcount-job/src/main/java/org/example/TraceWordCountMapper.java:70-72`):
  * run a job with one injected straggler under `spark.speculation=true`
  * and record every task attempt as a span, so a SPECULATIVE attempt
  * winning (successful span with attempt > 0 and the speculative flag)
  * is observable evidence, not an assumption.
  *
  * Two scheduler facts force the shape of this demo:
  *  - speculation never starts under `local[n]` (TaskSchedulerImpl
  *    guards its speculation thread with `!isLocal`), and
  *  - a speculative copy is only ever scheduled on a DIFFERENT HOST
  *    than the running attempt (TaskSetManager's hasAttemptOnHost
  *    gate), so `local-cluster` — both workers on `localhost` — can
  *    enable speculation but never launch a speculative task.
  * So this main spawns a miniature REAL standalone cluster: an
  * in-subprocess Master on 127.0.0.1 and two Worker subprocesses bound
  * to 127.0.0.1 and 127.0.0.2 — two scheduler-distinct hosts on one
  * machine (loopback is a /8). The straggler gates on
  * `attemptNumber == 0`, mirroring an ENVIRONMENTAL slowdown (a slow
  * host, not slow data): the speculative copy on the other host is
  * fast and wins; results must be byte-identical either way.
  *
  * args: <outDir> — writes `spans.jsonl` (task spans) and `result.txt`
  * (the job's checksum) under it. Run via ChaosSpeculationSpec (needs
  * SPARK_HOME + the build's classes on the classpath).
  */
object SpeculationDemo {

  val Partitions = 8
  val StragglerPartition = 3
  val N = 80000L
  /** sum(0 until N) — the job's expected checksum. */
  val ExpectedSum: Long = N * (N - 1) / 2

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def spawn(outDir: String, tag: String, cls: String, args: Seq[String]): Process = {
    val java = s"${sys.props("java.home")}/bin/java"
    val pb = new ProcessBuilder(
      (Seq(java, "-Xmx768m", "-cp", "/opt/spark/jars/*", cls) ++ args): _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(new File(s"$outDir/$tag.log"))
    pb.start()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SpeculationDemo <outDir>")
    val outDir = args(0)
    new File(outDir).mkdirs()

    val masterPort = freePort()
    val masterUrl = s"spark://127.0.0.1:$masterPort"
    val procs = scala.collection.mutable.ArrayBuffer[Process]()
    try {
      procs += spawn(outDir, "master", "org.apache.spark.deploy.master.Master",
        Seq("--host", "127.0.0.1", "--port", masterPort.toString,
          "--webui-port", "0"))
      Thread.sleep(4000) // master up before workers register
      Seq("127.0.0.1", "127.0.0.2").zipWithIndex.foreach { case (host, i) =>
        procs += spawn(outDir, s"worker$i", "org.apache.spark.deploy.worker.Worker",
          Seq("--host", host, "--cores", "1", "--memory", "1g",
            "--webui-port", "0", "--work-dir", s"$outDir/work$i", masterUrl))
      }

      val spark = SparkSession.builder()
        .master(masterUrl)
        .appName("graft-speculation-demo")
        // Aggressive-but-sane speculation thresholds so the demo
        // resolves in seconds: after half the tasks finish, anything
        // 1.5× over the median runtime is re-attempted on another host.
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.quantile", "0.5")
        .config("spark.speculation.multiplier", "1.5")
        // Ship this build's classes to the worker-launched executors.
        .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
        .config("spark.executor.memory", "512m")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("INFO")

      // Both hosts must be up: a speculative attempt needs a slot on a
      // host the original attempt is NOT running on.
      val deadline = System.currentTimeMillis() + 90000
      while (spark.sparkContext.statusTracker.getExecutorInfos.length < 3 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(500)
      require(spark.sparkContext.statusTracker.getExecutorInfos.length >= 3,
        "both workers' executors must register (driver + 2)")

      val exporter = new JsonFileExporter(s"$outDir/spans.jsonl")
      val handle = Trace.install(spark, exporter)
      try {
        import spark.implicits._
        val sum = spark.range(0, N, 1, Partitions).as[Long]
          .mapPartitions { it =>
            val tc = TaskContext.get()
            if (tc.partitionId() == StragglerPartition && tc.attemptNumber() == 0) {
              // The straggler: ~40 s in interrupt-aware slices (a task
              // kill after the speculative win releases the slot early).
              var slept = 0
              while (slept < 400 && !tc.isInterrupted()) {
                Thread.sleep(100); slept += 1
              }
            }
            it
          }
          .reduce(_ + _)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/result.txt"), s"$sum\n")
        require(sum == ExpectedSum, s"checksum mismatch: $sum != $ExpectedSum")
        // Listener-bus events are async; give the tail task spans (the
        // straggler's kill lands after the job ends) time to export.
        Thread.sleep(3000)
      } finally {
        Trace.uninstall(spark, handle)
        spark.stop()
      }
    } finally procs.foreach(_.destroyForcibly())
  }
}
