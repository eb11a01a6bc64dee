package graft.tools

import graft.{Sessions, Tables}

/** Throwaway smoke for days(ts) hidden partitioning (round 13). */
object DaysSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-days-smoke")
    val ss = spark.newSession()
    val root = java.nio.file.Files.createTempDirectory("graft-days-smoke-")
    ss.conf.set("spark.sql.catalog.smk", classOf[graft.catalog.GraftCatalog].getName)
    ss.conf.set("spark.sql.catalog.smk.root", root.toString)
    ss.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val t = "smk.ns.ev"
    Tables.events(ss, "/root/testdata/sf0.01").createOrReplaceTempView("ev_src")
    ss.sql(s"CREATE TABLE $t (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    ss.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(8) */ event_id, ts, user_id, value FROM ev_src")
    println("partitioning=" + ss.sql(s"DESCRIBE TABLE EXTENDED $t").collect().mkString("; ").take(400))
    val Array(b) = ss.sql("SELECT unix_micros(min(ts)), unix_micros(max(ts)) FROM ev_src").collect()
    val day = 86400000000L
    val (mnd, mxd) = (Math.floorDiv(b.getLong(0), day), Math.floorDiv(b.getLong(1), day))
    val loD = mnd + (mxd - mnd) / 4
    val hiD = loD + (mxd - mnd) / 8 + 1
    def fmt(d: Long): String =
      java.time.Instant.ofEpochSecond(d * 86400).toString.replace("T", " ").stripSuffix("Z")
    println(s"window days [$loD,$hiD) = [${fmt(loD)}, ${fmt(hiD)})")
    val n = ss.sql(s"SELECT count(*), sum(event_id) FROM $t " +
      s"WHERE ts >= TIMESTAMP'${fmt(loD)}' AND ts < TIMESTAMP'${fmt(hiD)}'").head()
    val (kept, total) = graft.catalog.SkipRecorder.lastFor(t).getOrElse((-1, -1))
    println(s"n=${n.getLong(0)} sum=${n.getLong(1)} kept=$kept total=$total")
    val oracle = ss.sql(s"SELECT count(*), sum(event_id) FROM ev_src " +
      s"WHERE ts >= TIMESTAMP'${fmt(loD)}' AND ts < TIMESTAMP'${fmt(hiD)}'").head()
    println(s"oracle n=${oracle.getLong(0)} sum=${oracle.getLong(1)}")
    spark.stop()
  }
}
