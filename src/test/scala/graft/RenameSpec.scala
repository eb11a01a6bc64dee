package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{GraftCatalog, Manifests}

/** Column RENAME/DROP as metadata-only commits over parquet FIELD IDS
  * (FieldIds in GraftCatalog.scala): every catalog column carries a
  * stable id from birth, every data file embeds the ids, reads resolve
  * by id — so a rename re-reads every old file (written under the old
  * parquet name) through the new name with zero data movement, a drop
  * is one metadata commit, and time travel serves each version under
  * the schema it was committed with. */
class RenameSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCatalog(name: String): (SparkSession, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-renamespec-$name-")
    root.toFile.deleteOnExit()
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$name.root", root.toString)
    (ss, name)
  }

  test("rename re-reads old files through the new name; time travel keeps the old one") {
    val (ss, c) = freshCatalog("rn_basic")
    val t = s"$c.ns.t"
    ss.sql(s"CREATE TABLE $t (id BIGINT, body STRING, n BIGINT)")
    ss.sql(s"INSERT INTO $t SELECT id, concat('doc', CAST(id AS STRING)), id * 2 " +
      "FROM range(0, 100)")
    val preRename = Manifests.latestVersion(ss, t)
    ss.sql(s"ALTER TABLE $t RENAME COLUMN body TO text")
    // metadata-only: the rename moved ZERO data files
    val v = Manifests.latestVersion(ss, t)
    assert(Manifests.files(ss, t, v) == Manifests.files(ss, t, preRename),
      "rename must be a metadata-only commit")
    // new writes land under the new name; old files resolve by field id
    ss.sql(s"INSERT INTO $t SELECT id, concat('doc', CAST(id AS STRING)), id * 2 " +
      "FROM range(100, 150)")
    val got = ss.sql(s"SELECT id, text FROM $t WHERE id IN (5, 120)").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == Seq((5L, "doc5"), (120L, "doc120")), got.mkString(","))
    assert(ss.sql(s"SELECT count(*) FROM $t WHERE text IS NOT NULL").head().getLong(0) == 150,
      "old files' column must resolve by id, not null-fill")
    // the pre-rename version reads through the OLD name
    val old = ss.sql(s"SELECT body FROM $t VERSION AS OF $preRename WHERE id = 5").head()
    assert(old.getString(0) == "doc5")
    assert(!ss.table(t).schema.fieldNames.contains("body"))
    // verbs keep working on the renamed column
    ss.sql(s"UPDATE $t SET text = 'redacted' WHERE id = 7")
    assert(ss.sql(s"SELECT text FROM $t WHERE id = 7").head().getString(0) == "redacted")
    // a session WITHOUT field-id reads must refuse the scan loudly — old
    // files would otherwise name-match and silently null-fill `text`
    ss.conf.set("spark.sql.parquet.fieldId.read.enabled", "false")
    try {
      val e = intercept[Exception](ss.sql(s"SELECT text FROM $t").collect())
      assert(e.getMessage.contains("fieldId"), e.getMessage)
    } finally ss.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
  }

  test("drop is one metadata commit; pre-drop versions still serve the column") {
    val (ss, c) = freshCatalog("rn_drop")
    val t = s"$c.ns.t"
    ss.sql(s"CREATE TABLE $t (id BIGINT, pii STRING, n BIGINT)")
    ss.sql(s"INSERT INTO $t SELECT id, concat('ssn', CAST(id AS STRING)), id FROM range(0, 50)")
    val preDrop = Manifests.latestVersion(ss, t)
    ss.sql(s"ALTER TABLE $t DROP COLUMN pii")
    assert(Manifests.files(ss, t, Manifests.latestVersion(ss, t)) ==
      Manifests.files(ss, t, preDrop), "drop must be a metadata-only commit")
    // current schema no longer carries it; selecting it fails
    assert(!ss.table(t).schema.fieldNames.contains("pii"))
    assert(scala.util.Try(ss.sql(s"SELECT pii FROM $t").collect()).isFailure)
    assert(ss.sql(s"SELECT sum(n) FROM $t").head().getLong(0) == (0L until 50L).sum)
    // forensics/time travel: the pre-drop version still serves it
    val tr = ss.sql(s"SELECT pii FROM $t VERSION AS OF $preDrop WHERE id = 3").head()
    assert(tr.getString(0) == "ssn3")
    // writes after the drop carry only the surviving columns
    ss.sql(s"INSERT INTO $t SELECT id, id FROM range(50, 60)")
    assert(ss.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 60)
    // and an ADD after a DROP never reuses the dropped column's id: the
    // new column reads NULL everywhere, not the old bytes
    ss.sql(s"ALTER TABLE $t ADD COLUMN note STRING")
    assert(ss.sql(s"SELECT count(*) FROM $t WHERE note IS NOT NULL").head().getLong(0) == 0,
      "a reused field id would resurrect the dropped column's bytes")
  }

  test("rename chains survive compaction and repeated renames") {
    val (ss, c) = freshCatalog("rn_chain")
    val t = s"$c.ns.t"
    ss.sql(s"CREATE TABLE $t (id BIGINT, a STRING)")
    ss.sql(s"INSERT INTO $t SELECT id, concat('x', CAST(id AS STRING)) FROM range(0, 30)")
    ss.sql(s"ALTER TABLE $t RENAME COLUMN a TO b")
    ss.sql(s"INSERT INTO $t SELECT id, concat('x', CAST(id AS STRING)) FROM range(30, 60)")
    ss.sql(s"ALTER TABLE $t RENAME COLUMN b TO cc")
    ss.sql(s"INSERT INTO $t SELECT id, concat('x', CAST(id AS STRING)) FROM range(60, 90)")
    // three name eras, one id: all 90 rows resolve
    assert(ss.sql(s"SELECT count(*) FROM $t WHERE cc IS NOT NULL").head().getLong(0) == 90)
    // compaction rewrites under the CURRENT name, ids preserved (the
    // commit-time id check would refuse otherwise)
    ss.sql(s"CALL $c.system.compact(table => 'ns.t', target_files => 1)")
    assert(ss.sql(s"SELECT count(*) FROM $t WHERE cc IS NOT NULL").head().getLong(0) == 90)
    assert(ss.sql(s"SELECT cc FROM $t WHERE id = 10").head().getString(0) == "x10")
  }

  test("guard rails: type changes, collisions, cluster/bloom columns, open branches") {
    val (ss, c) = freshCatalog("rn_guards")
    val t = s"$c.ns.t"
    ss.sql(s"CREATE TABLE $t (id BIGINT, v STRING, ts TIMESTAMP) PARTITIONED BY (id)")
    ss.sql(s"INSERT INTO $t VALUES (1, 'a', TIMESTAMP'2026-01-01 00:00:00')")
    // type change stays refused
    assert(scala.util.Try(
      ss.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT")).isFailure)
    // rename onto an existing name refused
    val e1 = intercept[Exception](ss.sql(s"ALTER TABLE $t RENAME COLUMN v TO id"))
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    // dropping a declared cluster key refused
    val e2 = intercept[Exception](ss.sql(s"ALTER TABLE $t DROP COLUMN id"))
    assert(e2.getMessage.contains("cluster"), e2.getMessage)
    // renaming a cluster key FOLLOWS into the declared layout
    ss.sql(s"ALTER TABLE $t RENAME COLUMN id TO doc_id")
    ss.sql(s"INSERT INTO $t VALUES (2, 'b', TIMESTAMP'2026-01-02 00:00:00')")
    assert(ss.sql(s"SELECT count(*) FROM $t WHERE doc_id >= 1").head().getLong(0) == 2)
    // schema changes refuse while a WAP branch is open
    ss.sql(s"CALL $c.system.create_branch(table => 'ns.t', branch => 'wap')")
    val e3 = intercept[Exception](ss.sql(s"ALTER TABLE $t RENAME COLUMN v TO w"))
    assert(e3.getMessage.contains("branches"), e3.getMessage)
    ss.sql(s"CALL $c.system.drop_branch(table => 'ns.t', branch => 'wap')")
    ss.sql(s"ALTER TABLE $t RENAME COLUMN v TO w")
    assert(ss.sql(s"SELECT w FROM $t WHERE doc_id = 1").head().getString(0) == "a")
  }

  test("retired names are never re-issued: DROP+ADD and rename swaps refuse") {
    // Manifest file stats are keyed by column NAME and inherited through
    // alter commits; reusing a retired name would let old files' stats
    // answer for the NEW column while field-id reads null-fill it —
    // SkipEval could prune files whose rows all read NULL (ADVICE r14).
    val (ss, c) = freshCatalog("rn_retired")
    val t = s"$c.ns.t"
    ss.sql(s"CREATE TABLE $t (id BIGINT, score BIGINT, v STRING)")
    ss.sql(s"INSERT INTO $t SELECT id, id * 3, concat('x', CAST(id AS STRING)) FROM range(0, 40)")
    ss.sql(s"ALTER TABLE $t DROP COLUMN score")
    // DROP c + ADD c: the stats hazard verbatim — refused
    val e1 = intercept[Exception](ss.sql(s"ALTER TABLE $t ADD COLUMN score BIGINT"))
    assert(e1.getMessage.contains("retired"), e1.getMessage)
    // a swap (v -> tmp, then a NEW column renamed onto v's old name)
    ss.sql(s"ALTER TABLE $t RENAME COLUMN v TO tmp")
    ss.sql(s"ALTER TABLE $t ADD COLUMN fresh STRING")
    val e2 = intercept[Exception](ss.sql(s"ALTER TABLE $t RENAME COLUMN fresh TO v"))
    assert(e2.getMessage.contains("retired"), e2.getMessage)
    // renaming a column BACK to its own former name is the same field id,
    // same stats, same column — allowed
    ss.sql(s"ALTER TABLE $t RENAME COLUMN tmp TO v")
    assert(ss.sql(s"SELECT v FROM $t WHERE id = 3").head().getString(0) == "x3")
    // and the old files' stats still prune correctly under the restored name
    assert(ss.sql(s"SELECT count(*) FROM $t WHERE v IS NOT NULL").head().getLong(0) == 40)
  }
}
