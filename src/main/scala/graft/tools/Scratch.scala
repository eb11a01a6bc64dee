package graft.tools

import graft.{Sessions, SparkEntry}

/** Throwaway profiling harness (not part of the library surface).
  * Usage: Scratch <sfDir> [--clear] <query>...
  * --clear replicates the bench's inter-query isolation (cache +
  * persisted-RDD release) so suite-mode timings reproduce outside the
  * full bench run. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-scratch")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rest = args.drop(1)
    val clear = rest.contains("--clear")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    for (name <- rest.filterNot(_ == "--clear")) {
      if (clear) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      df.explain("formatted")
    }
    spark.stop()
  }
}
