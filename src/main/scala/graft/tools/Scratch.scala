package graft.tools

import graft.{Sessions, SparkEntry}

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-scratch")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      df.explain("formatted")
    }
    spark.stop()
  }
}
