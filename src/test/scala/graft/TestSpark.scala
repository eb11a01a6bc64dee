package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = Sessions.build("graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
