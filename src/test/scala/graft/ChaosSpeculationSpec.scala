package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.chaos.SpeculationDemo

/** Chaos × speculation, end to end: [[SpeculationDemo]] runs a REAL
  * multi-executor scheduler (`local-cluster[2,1,1024]` — speculation
  * never starts under `local[n]`, hence the subprocess) with one
  * injected straggler, and the recorded task spans must show a
  * successful speculative attempt (> 0) winning while the job's result
  * stays byte-identical. */
class ChaosSpeculationSpec extends AnyFunSuite {

  test("a speculative attempt wins against the injected straggler; result unchanged") {
    assume(new File("/opt/spark/bin/spark-class").exists(),
      "needs a full Spark distribution for local-cluster workers")
    val out = Files.createTempDirectory("graft-speculation").toString
    val java = s"${sys.props("java.home")}/bin/java"
    val pb = new ProcessBuilder(
      java, "-Xmx1g", "-cp", sys.props("java.class.path"),
      "graft.chaos.SpeculationDemo", out)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    // The launcher's getScalaVersion probes source-build directories
    // when this is unset (a release dist has only jars/), and executor
    // launch dies with "Cannot find any build directories".
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(new File(s"$out/demo.log"))
    val proc = pb.start()
    val finished = proc.waitFor(240, TimeUnit.SECONDS)
    def logTail = {
      val f = Paths.get(s"$out/demo.log")
      if (Files.exists(f)) Files.readAllLines(f).asScala.takeRight(40).mkString("\n")
      else "(no log)"
    }
    if (!finished) proc.destroyForcibly()
    assert(finished, s"demo timed out:\n$logTail")
    assert(proc.exitValue() == 0, s"demo failed:\n$logTail")

    // Results unchanged: the checksum the demo computed under
    // chaos + speculation equals the closed form.
    assert(Files.readString(Paths.get(s"$out/result.txt")).trim ==
      SpeculationDemo.ExpectedSum.toString)

    // A successful attempt > 0 task span, flagged speculative, was
    // recorded (the reference's straggler-analysis semantic).
    val taskSpans = Files.readAllLines(Paths.get(s"$out/spans.jsonl")).asScala
      .filter(_.contains("\"name\":\"spark.task\""))
    assert(taskSpans.nonEmpty, s"no task spans recorded:\n$logTail")
    val speculativeWin = taskSpans.exists { l =>
      l.contains("\"spark.task.speculative\":\"true\"") &&
        l.contains("\"spark.task.status\":\"SUCCESS\"") &&
        !l.contains("\"spark.task.attempt\":\"0\"")
    }
    assert(speculativeWin,
      s"no successful speculative attempt>0 span in:\n${taskSpans.mkString("\n")}")
  }
}
