package graft.tools

import graft.Sessions

/** Throwaway smoke harness for merge-on-read deletion vectors (round 13,
  * not part of the library surface): a `write.row_level.mode =
  * merge-on-read` table takes DELETE/UPDATE/MERGE as delta commits
  * (zero data files rewritten, vector blobs appended), reads mask, time
  * travel sees the pre-delta state, compaction materializes. Prints the
  * manifest diff per commit so the shape is visible before MorSpec pins
  * it. */
object MorSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-mor-smoke")
    val ss = spark.newSession()
    val root = java.nio.file.Files.createTempDirectory("graft-mor-smoke-")
    ss.conf.set("spark.sql.catalog.smk", classOf[graft.catalog.GraftCatalog].getName)
    ss.conf.set("spark.sql.catalog.smk.root", root.toString)
    ss.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val t = "smk.ns.t"
    ss.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.row_level.mode'='merge-on-read')")
    (0 until 3).foreach { k =>
      ss.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(2) */ id, id * 10 AS v " +
        s"FROM range(${k * 1000}, ${k * 1000 + 1000})")
    }
    def diff(v: Int): Unit = {
      val (prev, removed, added, inherited) =
        graft.catalog.Manifests.commitFileDiff(ss, t, v)
      println(s"v${v - 1} -> v$v: prev=$prev removed=$removed added=$added inherited=$inherited")
    }
    def count(q: String): Long = ss.sql(q).head().getLong(0)

    println("--- MOR DELETE (one row) ---")
    ss.sql(s"DELETE FROM $t WHERE id = 1500")
    diff(4)
    println(s"count=${count(s"SELECT count(*) FROM $t")} expect 2999")
    println(s"gone=${count(s"SELECT count(*) FROM $t WHERE id = 1500")} expect 0")
    println(s"time travel v3 count=${count(s"SELECT count(*) FROM $t VERSION AS OF 3")} expect 3000")

    println("--- MOR UPDATE (range) ---")
    ss.sql(s"UPDATE $t SET v = v + 1 WHERE id >= 2000 AND id < 2010")
    diff(5)
    println(s"sum=${count(s"SELECT sum(v) FROM $t")} expect " +
      ((0 until 3000).map(_.toLong * 10).sum - 15000 + 10))

    println("--- MOR MERGE (update overlap + insert novel) ---")
    ss.sql("CREATE OR REPLACE TEMP VIEW delta_src AS " +
      "SELECT id, id * 100 AS v FROM range(2995, 3005)")
    ss.sql(s"MERGE INTO $t USING delta_src s ON $t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
    diff(6)
    println(s"count=${count(s"SELECT count(*) FROM $t")} expect 3004")
    println(s"merged v=${count(s"SELECT sum(v) FROM $t WHERE id >= 2995")} expect " +
      (2995 until 3005).map(_.toLong * 100).sum)

    println("--- second DELETE on an already-vectored file ---")
    ss.sql(s"DELETE FROM $t WHERE id = 1501")
    println(s"count=${count(s"SELECT count(*) FROM $t")} expect 3003")

    println("--- SELECT _file/_pos lineage ---")
    ss.sql(s"SELECT _file, _pos, id FROM $t WHERE id < 3").show(3, false)

    println("--- history (n_rows nets out tombstones) ---")
    ss.sql(s"CALL smk.system.history(table => 'ns.t')").show(20, false)

    println("--- compact materializes the vectors ---")
    ss.sql(s"CALL smk.system.compact(table => 'ns.t', target_files => 2)").show()
    println(s"count=${count(s"SELECT count(*) FROM $t")} expect 3003")
    val m = graft.catalog.Manifests.files(ss, t, graft.catalog.Manifests.latestVersion(ss, t))
    println(s"files after compact: ${m.size}")

    println("--- CDF across the delta commits ---")
    graft.catalog.ChangeFeed.tableChanges(ss, t, 4, 6, keyCols = Seq("id"))
      .groupBy("_commit_version", "_change_type").count()
      .orderBy("_commit_version", "_change_type").show(20, false)

    spark.stop()
  }
}
