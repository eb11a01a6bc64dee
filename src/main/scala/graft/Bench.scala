package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * emits ONE bare JSON line on stdout (build.sbt sets StdoutOutput so sbt
  * does not prefix it) plus a copy at BENCH_LOCAL.json for redundancy.
  *
  * Design notes (VERDICT r1 items 4/5 + warmup):
  *  - a warmup action runs first so JVM/codegen/parquet-reader startup cost
  *    is not attributed to whichever query happens to run first;
  *  - queries execute in sorted-name order (stable across JVMs — queries is
  *    an unordered Map);
  *  - the action is a `noop`-format write: the full physical plan executes
  *    on the executors (unlike count(), which lets Catalyst prune sorts and
  *    columns) and nothing funnels to the driver;
  *  - failures are recorded explicitly in a "failed" list and as -1 timings
  *    so a crashed query can never be mistaken for a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")

    // Warmup: touch codegen, shuffle machinery, and the vectorized parquet
    // reader once before any timed query.
    spark.range(1000000).selectExpr("sum(id) s").collect()
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()

    // Per-query watchdog: a runaway query (JIT/codegen storm, degenerate
    // plan) must cost at most `timeoutSec`, never the whole bench run.
    // The query executes under a job group so the watchdog can cancel
    // its in-flight Spark jobs, and the timeout is reported as a failure.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      System.err.println(s"[bench] running $name")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val t0 = System.nanoTime()
      val fut = Future {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        finally spark.sparkContext.clearJobGroup()
      }
      try {
        Await.result(fut, timeoutSec.seconds)
        ((System.nanoTime() - t0) / 1e9, true)
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          System.err.println(s"[bench] $name TIMED OUT after $timeoutSec s")
          // cancelJobGroup kills in-flight Spark jobs, but driver-side work
          // (Janino codegen, analysis) on the abandoned thread keeps
          // running and would contaminate the next query's timing — give
          // it a short grace to actually finish, and say so if it didn't.
          try Await.ready(fut, 15.seconds)
          catch { case _: java.util.concurrent.TimeoutException =>
            System.err.println(s"[bench] $name still running after cancel; next timings may be contaminated")
          }
          (-1.0, false)
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          (-1.0, false)
      }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, ok) = run(name, fn)
      // Settle between queries so one query's GC debt (heap churn from
      // heavy writes/aggregations) is not billed to the next one's timing
      // — measured up to 10x inflation on the successor without this.
      System.gc()
      Thread.sleep(200)
      (name, sec, ok)
    }
    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map(r => s""""${r._1}"""").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    try Files.writeString(Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
