package graft.tools

import graft.Sessions

/** Throwaway smoke harness for file-granular COW (round 13, not part of
  * the library surface): builds a clustered multi-file table, runs
  * targeted and untargeted row-level verbs, and prints the manifest diff
  * per commit so the strict-subset behavior is visible before the specs
  * pin it. */
object CowSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-cow-smoke")
    val ss = spark.newSession()
    val root = java.nio.file.Files.createTempDirectory("graft-cow-smoke-")
    ss.conf.set("spark.sql.catalog.smk", classOf[graft.catalog.GraftCatalog].getName)
    ss.conf.set("spark.sql.catalog.smk.root", root.toString)
    val t = "smk.ns.t"
    ss.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) PARTITIONED BY (id)")
    // 4 disjoint-range appends -> 4+ files with disjoint id bounds
    ss.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    (0 until 4).foreach { k =>
      ss.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, id * 10 AS v " +
        s"FROM range(${k * 1000}, ${k * 1000 + 1000})")
    }
    def diff(a: Int, b: Int): Unit = {
      val (prev, removed, added, inherited) =
        graft.catalog.Manifests.commitFileDiff(ss, t, b)
      println(s"v$a -> v$b: prev=$prev removed=$removed added=$added inherited=$inherited")
    }
    println("--- targeted UPDATE (one range) ---")
    ss.sql(s"UPDATE $t SET v = v + 1 WHERE id >= 1000 AND id < 2000")
    diff(4, 5)
    println("count=" + ss.sql(s"SELECT count(*) FROM $t").head().getLong(0) +
      " sum_v=" + ss.sql(s"SELECT sum(v) FROM $t").head().getLong(0) +
      " expect sum=" + ((0 until 4000).map(i => i.toLong * 10).sum + 1000))
    println("--- targeted DELETE (one id) ---")
    ss.sql(s"DELETE FROM $t WHERE id = 3500")
    diff(5, 6)
    println("count=" + ss.sql(s"SELECT count(*) FROM $t").head().getLong(0) + " expect 3999")
    println("--- untargeted UPDATE (whole table) ---")
    ss.sql(s"UPDATE $t SET v = v + 1")
    diff(6, 7)
    println("count=" + ss.sql(s"SELECT count(*) FROM $t").head().getLong(0))
    println("--- SELECT _file (metadata column) ---")
    val ftab = ss.sql(s"SELECT _file, count(*) AS n FROM $t GROUP BY _file ORDER BY _file")
      .collect()
    println("distinct files=" + ftab.length + " total=" + ftab.map(_.getLong(1)).sum)
    println("--- MERGE (source-dependent condition: runtime group filtering) ---")
    ss.sql(s"""MERGE INTO $t x USING (SELECT id, id AS v FROM range(3990, 4010)) s
               ON x.id = s.id
               WHEN MATCHED THEN UPDATE SET v = s.v
               WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    diff(7, 8)
    println("count=" + ss.sql(s"SELECT count(*) FROM $t").head().getLong(0) + " expect 4009")
    println("merge result probe: sum in [3990,4010)=" +
      ss.sql(s"SELECT sum(v) FROM $t WHERE id >= 3990 AND id < 4010").head().getLong(0) +
      " expect " + (3990 until 4010).map(_.toLong).sum)
    println("--- time travel: v5 still reads pre-delete content ---")
    println("v5 count=" + ss.sql(s"SELECT count(*) FROM $t VERSION AS OF 5").head().getLong(0) +
      " expect 4000")
    println("--- update on an UNCLUSTERED scattered table (kept=all, correct) ---")
    val u = "smk.ns.u"
    ss.sql(s"CREATE TABLE $u (id BIGINT, v BIGINT)")
    (0 until 3).foreach { k =>
      ss.sql(s"INSERT INTO $u SELECT /*+ REPARTITION(2) */ id, id FROM range(0, 3000) WHERE id % 3 = $k")
    }
    ss.sql(s"UPDATE $u SET v = 0 WHERE id < 10")
    val vu = graft.catalog.Manifests.latestVersion(ss, u)
    println("u latest files=" + graft.catalog.Manifests.files(ss, u, vu).size +
      " sum=" + ss.sql(s"SELECT sum(v) FROM $u").head().getLong(0) +
      " expect " + (10 until 3000).map(_.toLong).sum)
    spark.stop()
  }
}
