package graft.tools

import graft.Sessions

/** Throwaway smoke harness for the SPJ bucket layout (round 14, not part
  * of the library surface): replays the SpjSpec verb sequence and prints
  * per-commit file lists with their recorded bucket labels AND the
  * re-derived truth, so the write that breaks purity is visible. */
object SpjSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-spj-smoke")
    val ss = spark.newSession()
    val root = java.nio.file.Files.createTempDirectory("graft-spj-smoke-")
    ss.conf.set("spark.sql.catalog.smk", classOf[graft.catalog.GraftCatalog].getName)
    ss.conf.set("spark.sql.catalog.smk.root", root.toString)
    val t = "smk.ns.a"
    def audit(label: String): Unit = {
      val v = graft.catalog.Manifests.latestVersion(ss, t)
      val ids = graft.catalog.Manifests.bucketIds(ss, t, v)
      val perFile = ss.sql(s"SELECT _file, doc_id FROM $t").collect()
        .groupBy(_.getString(0)).view
        .mapValues(_.map(r => graft.catalog.GraftBucket.bucketOfLong(r.getLong(1), 4))
          .distinct.sorted.toSeq).toMap
      println(s"=== $label (v$v) ===")
      ids.toSeq.sortBy(_._1).foreach { case (f, b) =>
        val truth = perFile.getOrElse(f, Seq.empty)
        val flag = if (truth.size == 1 && b.contains(truth.head)) "OK " else "BAD"
        println(f"$flag label=$b truth=$truth  $f")
      }
    }
    ss.sql(s"CREATE TABLE $t (doc_id BIGINT, v BIGINT) PARTITIONED BY (bucket(4, doc_id))")
    ss.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 3000)")
    audit("insert")
    ss.sql(s"UPDATE $t SET v = v + 1 WHERE doc_id % 10 = 3")
    audit("update")
    ss.sql(s"DELETE FROM $t WHERE doc_id >= 2900")
    audit("delete")
    ss.sql(s"MERGE INTO $t t USING (SELECT id AS doc_id, id * 5 AS v " +
      "FROM range(2950, 3050)) s ON t.doc_id = s.doc_id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v WHEN NOT MATCHED THEN INSERT *")
    audit("merge")
    ss.sql(s"CALL smk.system.compact(table => 'ns.a', target_files => 4)")
    audit("compact")
    spark.stop()
  }
}
