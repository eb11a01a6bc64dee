package graft.tools

import graft.{Sessions, SparkEntry}

/** Dump a SUBSET of registered queries + their oracle SQL for a quick
  * local DuckDB parity check before a round's Verify gate (not part of
  * the library surface — Verify.scala is the driver's full gate; this is
  * the developer's per-query loop).
  * Usage: DumpQueries <sfDir> <outDir> <query>... */
object DumpQueries {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-dumpq")
    val dir = args(0)
    val out = args(1)
    val names = args.drop(2)
    val sqls = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _)).toMap
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out, "oracle_sql.json"),
      sqls.map { case (k, v) =>
        s""""$k": ${org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(org.json4s.JString(v)))}"""
      }.mkString("{", ",", "}"))
    names.foreach { n =>
      SparkEntry.queries(n)(spark, dir).write.mode("overwrite").parquet(s"$out/$n")
      println(s"dumped $n")
    }
    spark.stop()
  }
}
