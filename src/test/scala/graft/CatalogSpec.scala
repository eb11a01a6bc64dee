package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.GraftCatalog

/** The snapshot-versioned DSv2 catalog: SQL verbs, copy-on-write
  * semantics, time-travel immutability, commit atomicity/conflicts, and
  * the two plan-shape contracts (pushdown on plain reads; NO row-level
  * filter pushdown, which would silently drop copy-over rows — the bug
  * the smoke run caught). */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Fresh catalog + session per test — catalog state is on disk, so each
    * test gets its own root. */
  private def freshCatalog(name: String): (SparkSession, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-catspec-$name-")
    root.toFile.deleteOnExit()
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$name.root", root.toString)
    (ss, name)
  }

  private def seed(ss: SparkSession, t: String): Unit = {
    ss.sql(s"CREATE TABLE $t (id BIGINT, v STRING, x DOUBLE)")
    ss.sql(s"INSERT INTO $t VALUES (1,'a',0.5),(2,'b',1.5),(3,'c',2.5),(4,'d',3.5)")
  }

  test("verb chain: UPDATE/DELETE/MERGE preserve untouched rows (COW, not filter-scan)") {
    val (ss, c) = freshCatalog("cat_verbs")
    val t = s"$c.ns.t"
    seed(ss, t)
    ss.sql(s"UPDATE $t SET x = x * 2 WHERE id <= 2")
    // the copy-over rows 3,4 must survive the rewrite
    assert(ss.sql(s"SELECT id, x FROM $t ORDER BY id").collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0), (2L, 3.0), (3L, 2.5), (4L, 3.5)))
    ss.sql(s"DELETE FROM $t WHERE id = 3")
    assert(ss.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 3)
    ss.sql("CREATE OR REPLACE TEMP VIEW cat_verbs_delta AS " +
      "SELECT * FROM VALUES (2,'B',9.0),(9,'z',0.0) AS s(id, v, x)")
    ss.sql(s"""MERGE INTO $t t USING cat_verbs_delta s ON t.id = s.id
               WHEN MATCHED THEN UPDATE SET t.v = s.v, t.x = s.x
               WHEN NOT MATCHED THEN INSERT (id, v, x) VALUES (s.id, s.v, s.x)""")
    assert(ss.sql(s"SELECT id, v FROM $t ORDER BY id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (4L, "d"), (9L, "z")))
  }

  test("time travel: every historical version stays readable and unchanged") {
    val (ss, c) = freshCatalog("cat_tt")
    val t = s"$c.ns.t"
    seed(ss, t) // v1 = 4 rows
    ss.sql(s"INSERT INTO $t VALUES (5,'e',4.5)") // v2 = 5 rows
    ss.sql(s"DELETE FROM $t WHERE id >= 4") // v3 = 3 rows
    ss.sql(s"INSERT OVERWRITE $t VALUES (100,'zz',0.0)") // v4 = 1 row
    assert((1 to 4).map(v =>
      ss.sql(s"SELECT count(*) FROM $t VERSION AS OF $v").head().getLong(0)) ==
      Seq(4L, 5L, 3L, 1L))
    // v1's CONTENT is bit-for-bit the original (files immutable, manifest kept)
    assert(ss.sql(s"SELECT id FROM $t VERSION AS OF 1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // TIMESTAMP AS OF now() resolves to the latest version
    assert(ss.sql(s"SELECT count(*) FROM $t TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0) == 1)
    // a time-travel view is read-only
    val e = intercept[Exception](
      ss.sql(s"DELETE FROM (SELECT * FROM $t VERSION AS OF 1)"))
    assert(e != null)
  }

  test("plain reads keep parquet pushdown; row-level scans refuse it") {
    val (ss, c) = freshCatalog("cat_plan")
    val t = s"$c.ns.t"
    seed(ss, t)
    val planned = ss.sql(s"SELECT id FROM $t WHERE id > 2")
      .queryExecution.executedPlan.toString
    assert(planned.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"),
      s"plain read lost parquet filter pushdown:\n$planned")
    assert(planned.contains("ReadSchema: struct<id:bigint>"),
      s"plain read lost column pruning:\n$planned")
    // the row-level (COW) scan must NOT push the verb's condition into
    // the parquet scan: it would drop non-matching rows of the rewritten
    // group. UPDATE's plan scans with no pushed data filters.
    val upd = ss.sql(s"EXPLAIN UPDATE $t SET x = 0 WHERE id = 1")
      .head().getString(0)
    assert(!upd.contains("PushedFilters: [IsNotNull(id), EqualTo(id,1)]")
      && !upd.contains("PushedFilters: [EqualTo(id,1)"),
      s"row-level scan pushed the rewrite condition into parquet:\n$upd")
  }

  test("commit conflict: a racing writer fails instead of clobbering") {
    val (ss, c) = freshCatalog("cat_race")
    val t = s"$c.ns.t"
    seed(ss, t)
    // two appends racing from two threads against one table: both may
    // succeed (serialized by the commit lock) but the version chain must
    // record BOTH commits — no lost update
    val threads = (0 until 2).map { i =>
      new Thread(() => ss.sql(s"INSERT INTO $t VALUES (${100 + i},'r',0.0)"))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(ss.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 6)
    // version chain advanced twice past the seed's v1
    assert(ss.sql(s"SELECT count(*) FROM $t VERSION AS OF 3").head().getLong(0) == 6)
  }

  test("catalog surface: list, drop, rename, duplicate-create rejection") {
    val (ss, c) = freshCatalog("cat_surface")
    seed(ss, s"$c.ns.a")
    ss.sql(s"CREATE TABLE $c.ns.b (id BIGINT)")
    assert(ss.sql(s"SHOW TABLES IN $c.ns").collect()
      .map(_.getString(1)).toSet == Set("a", "b"))
    intercept[Exception](ss.sql(s"CREATE TABLE $c.ns.a (id BIGINT)"))
    // the RENAME target identifier is resolved within the same catalog
    ss.sql(s"ALTER TABLE $c.ns.b RENAME TO ns.b2")
    assert(ss.sql(s"SELECT count(*) FROM $c.ns.b2").head().getLong(0) == 0)
    ss.sql(s"DROP TABLE $c.ns.b2")
    assert(ss.sql(s"SHOW TABLES IN $c.ns").collect()
      .map(_.getString(1)).toSet == Set("a"))
  }

  test("CALL system.expire_versions reclaims dead files, keeps live versions readable") {
    val (ss, c) = freshCatalog("cat_expire")
    val t = s"$c.ns.t"
    seed(ss, t) // v1
    ss.sql(s"INSERT OVERWRITE $t VALUES (10,'x',0.0)") // v2: v1's files now dead-if-expired
    ss.sql(s"INSERT INTO $t VALUES (11,'y',1.0)") // v3 inherits v2's files
    val before = ss.sql(s"SELECT count(*) FROM $t VERSION AS OF 1").head().getLong(0)
    assert(before == 4)
    val res = ss.sql(s"CALL $c.system.expire_versions(table => 'ns.t', keep_last => 2)")
      .collect()
    assert(res.length == 1)
    val r = res.head
    // v0 (create) and v1 expired; v2,v3 kept; v1's seed files deleted
    assert(r.getInt(0) == 2, s"expired_versions = ${r.getInt(0)}")
    assert(r.getInt(1) == 2, s"kept_versions = ${r.getInt(1)}")
    assert(r.getInt(2) > 0, s"deleted_files = ${r.getInt(2)}")
    // kept versions unaffected, same version numbers
    assert(ss.sql(s"SELECT count(*) FROM $t VERSION AS OF 2").head().getLong(0) == 1)
    assert(ss.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 2)
    // the expired version is gone
    intercept[Exception](ss.sql(s"SELECT count(*) FROM $t VERSION AS OF 1").collect())
    // expiring everything but the latest still leaves the table readable
    ss.sql(s"CALL $c.system.expire_versions(table => 'ns.t', keep_last => 1)")
    assert(ss.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 2)
  }

  test("ALTER TABLE ADD COLUMN: old files null-fill, new writes carry it, non-additive rejected") {
    val (ss, c) = freshCatalog("cat_evolve")
    val t = s"$c.ns.t"
    seed(ss, t)
    ss.sql(s"ALTER TABLE $t ADD COLUMN tag STRING")
    // pre-evolution files read the new column as null
    assert(ss.sql(s"SELECT count(*) FROM $t WHERE tag IS NULL").head().getLong(0) == 4)
    ss.sql(s"INSERT INTO $t VALUES (5,'e',4.5,'new')")
    assert(ss.sql(s"SELECT tag FROM $t WHERE id = 5").head().getString(0) == "new")
    // the evolved column is UPDATEable across old rows (COW backfill)
    ss.sql(s"UPDATE $t SET tag = 'back' WHERE id <= 2")
    assert(ss.sql(s"SELECT count(*) FROM $t WHERE tag = 'back'").head().getLong(0) == 2)
    // destructive evolution is a rewrite, not an ALTER
    intercept[Exception](ss.sql(s"ALTER TABLE $t DROP COLUMN tag"))
    intercept[Exception](ss.sql(s"ALTER TABLE $t RENAME COLUMN tag TO label"))
  }

  test("MERGE with NOT MATCHED BY SOURCE deletes stale corpus rows") {
    val (ss, c) = freshCatalog("cat_mbs")
    val t = s"$c.ns.t"
    seed(ss, t)
    ss.sql("CREATE OR REPLACE TEMP VIEW cat_mbs_keep AS " +
      "SELECT * FROM VALUES (1,'a',0.5),(2,'b',1.5) AS s(id, v, x)")
    ss.sql(s"""MERGE INTO $t t USING cat_mbs_keep s ON t.id = s.id
               WHEN MATCHED THEN UPDATE SET t.x = s.x + 10
               WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(ss.sql(s"SELECT id, x FROM $t ORDER BY id").collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 10.5), (2L, 11.5)))
  }
}
