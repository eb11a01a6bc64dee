package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.GraftCatalog

/** Storage-partitioned joins over catalog `bucket(n, col)` tables
  * (Spj.scala): the write path produces bucket-pure files with recorded
  * bucket ids, the scan reports KeyGroupedPartitioning, and Spark plans
  * a co-bucketed equi-join with ZERO Exchange on either side — the one
  * remaining 100 TB shuffle of r13's verdict. Every arm also pins
  * CONTENT against a plain recompute: the join property must never cost
  * a row. */
class SpjSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshCatalog(name: String): (SparkSession, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-spjspec-$name-")
    root.toFile.deleteOnExit()
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$name.root", root.toString)
    (ss, name)
  }

  private def exchanges(plan: String): Int =
    "Exchange (hash|range)partitioning".r.findAllIn(plan).length

  test("co-bucketed catalog join plans with zero Exchange and exact content") {
    val (ss, c) = freshCatalog("spj_join")
    ss.sql(s"CREATE TABLE $c.ns.docs (doc_id BIGINT, score DOUBLE) " +
      "PARTITIONED BY (bucket(8, doc_id))")
    ss.sql(s"CREATE TABLE $c.ns.feats (doc_id BIGINT, toks BIGINT) " +
      "PARTITIONED BY (bucket(8, doc_id))")
    ss.sql(s"INSERT INTO $c.ns.docs SELECT id, id * 0.5 FROM range(0, 5000)")
    ss.sql(s"INSERT INTO $c.ns.feats SELECT id, id % 97 FROM range(0, 5000)")

    // broadcast off throughout: the claim is the SPJ plan, and at test
    // scale a broadcast join would be Exchange-free for the wrong reason
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = ss.sql(
      s"""SELECT d.doc_id, d.score, f.toks
          FROM $c.ns.docs d JOIN $c.ns.feats f ON d.doc_id = f.doc_id""")
    val plan = joined.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 0,
      s"co-bucketed join must be Exchange-free on both sides:\n${plan.take(3000)}")
    // content: every row joins, values exact
    assert(joined.count() == 5000)
    val probe = joined.filter("doc_id = 4321").head()
    assert(probe.getDouble(1) == 2160.5 && probe.getLong(2) == 4321 % 97)

    // red arm: with v2 bucketing off, the same join shuffles both sides
    ss.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val shuffled = ss.sql(
        s"""SELECT d.doc_id, f.toks FROM $c.ns.docs d
            JOIN $c.ns.feats f ON d.doc_id = f.doc_id""")
      val redPlan = shuffled.queryExecution.executedPlan.toString
      assert(exchanges(redPlan) >= 1,
        s"disabling v2 bucketing must restore the shuffle:\n${redPlan.take(2000)}")
      assert(shuffled.count() == 5000)
    } finally {
      ss.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    }
  }

  test("GROUP BY on the bucket column aggregates with zero Exchange too") {
    val (ss, c) = freshCatalog("spj_agg")
    ss.sql(s"CREATE TABLE $c.ns.t (doc_id BIGINT, v BIGINT) PARTITIONED BY (bucket(8, doc_id))")
    // repeated keys so groups are non-trivial
    ss.sql(s"INSERT INTO $c.ns.t SELECT id % 500, id FROM range(0, 5000)")
    val q = ss.sql(s"SELECT doc_id, count(*) AS n, sum(v) AS s FROM $c.ns.t GROUP BY doc_id")
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 0,
      s"bucket-column aggregation must be Exchange-free:\n${plan.take(2500)}")
    assert(rows.length == 500)
    val probe = rows.find(_.getLong(0) == 7L).get
    assert(probe.getLong(1) == 10 &&
      probe.getLong(2) == (0 until 10).map(k => 7L + 500L * k).sum)
  }

  test("every written file is bucket-pure with its id in the manifest; appends too") {
    val (ss, c) = freshCatalog("spj_pure")
    ss.sql(s"CREATE TABLE $c.ns.t (k STRING, v BIGINT) PARTITIONED BY (bucket(4, k))")
    ss.sql(s"INSERT INTO $c.ns.t SELECT concat('key', CAST(id AS STRING)), id FROM range(0, 2000)")
    ss.sql(s"INSERT INTO $c.ns.t SELECT concat('more', CAST(id AS STRING)), id FROM range(0, 500)")
    val v = graft.catalog.Manifests.latestVersion(ss, s"$c.ns.t")
    val ids = graft.catalog.Manifests.bucketIds(ss, s"$c.ns.t", v)
    assert(ids.nonEmpty)
    // every file has a recorded bucket id
    assert(ids.values.forall(_.isDefined), ids.toString)
    // purity: re-derive each row's bucket and compare to its file's id
    val perFile = ss.sql(s"SELECT _file, k FROM $c.ns.t").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
    perFile.foreach { case (file, keys) =>
      val declared = ids(file).get
      val derived = keys.map(k => graft.catalog.GraftBucket.bucketOfString(
        org.apache.spark.unsafe.types.UTF8String.fromString(k), 4)).distinct
      assert(derived == Seq(declared),
        s"$file declared bucket $declared but holds buckets $derived")
    }
    // at least two distinct buckets materialized (the mixer spreads keys)
    assert(ids.values.flatten.toSeq.distinct.size >= 2)
  }

  test("COW verbs and compaction preserve the layout; the join stays Exchange-free") {
    val (ss, c) = freshCatalog("spj_verbs")
    ss.sql(s"CREATE TABLE $c.ns.a (doc_id BIGINT, v BIGINT) PARTITIONED BY (bucket(4, doc_id))")
    ss.sql(s"CREATE TABLE $c.ns.b (doc_id BIGINT, w BIGINT) PARTITIONED BY (bucket(4, doc_id))")
    ss.sql(s"INSERT INTO $c.ns.a SELECT id, id FROM range(0, 3000)")
    ss.sql(s"INSERT INTO $c.ns.b SELECT id, id * 2 FROM range(0, 3000)")
    // churn side a: update + delete + merge (file-granular COW rewrites)
    ss.sql(s"UPDATE $c.ns.a SET v = v + 1 WHERE doc_id % 10 = 3")
    ss.sql(s"DELETE FROM $c.ns.a WHERE doc_id >= 2900")
    ss.sql(s"MERGE INTO $c.ns.a t USING (SELECT id AS doc_id, id * 5 AS v " +
      "FROM range(2950, 3050)) s ON t.doc_id = s.doc_id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v WHEN NOT MATCHED THEN INSERT *")
    // then compact side a down (bucket-pure rewrite path)
    ss.sql(s"CALL $c.system.compact(table => 'ns.a', target_files => 4)")
    val v = graft.catalog.Manifests.latestVersion(ss, s"$c.ns.a")
    val ids = graft.catalog.Manifests.bucketIds(ss, s"$c.ns.a", v)
    assert(ids.values.forall(_.isDefined),
      s"post-verb manifest lost bucket ids: ${ids.filter(_._2.isEmpty).keys}")
    // the labels must also be TRUE: re-derive each row's bucket
    val perFile = ss.sql(s"SELECT _file, doc_id FROM $c.ns.a").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    perFile.foreach { case (file, keys) =>
      val derived = keys.map(graft.catalog.GraftBucket.bucketOfLong(_, 4)).distinct
      assert(derived == Seq(ids(file).get),
        s"$file labeled bucket ${ids(file).get} but holds buckets $derived")
    }

    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = ss.sql(s"SELECT a.doc_id, a.v, b.w FROM $c.ns.a a " +
      s"JOIN $c.ns.b b ON a.doc_id = b.doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    assert(exchanges(plan) == 0, s"post-churn join regained a shuffle:\n${plan.take(3000)}")
    // content equals the same verb sequence replayed relationally
    val expect = (0L until 3000L).filterNot(_ >= 2900)
      .map(id => (id, if (id % 10 == 3) id + 1 else id)) ++
      (2950L until 3050L).map(id => (id, id * 5))
    val expectJoined = expect.filter(_._1 < 3000).map { case (id, v) => (id, v, id * 2) }.sorted
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == expectJoined, s"join content diverged (got ${got.length} rows, " +
      s"want ${expectJoined.length})")
  }

  test("guard rails: MOR refused, bucket re-layout refused on non-empty, bad types refused") {
    val (ss, c) = freshCatalog("spj_guards")
    val e1 = intercept[Exception](ss.sql(
      s"CREATE TABLE $c.ns.m (id BIGINT) PARTITIONED BY (bucket(4, id)) " +
        "TBLPROPERTIES ('write.row_level.mode'='merge-on-read')"))
    assert(e1.getMessage.contains("copy-on-write"), e1.getMessage)
    val e2 = intercept[Exception](ss.sql(
      s"CREATE TABLE $c.ns.f (x DOUBLE) PARTITIONED BY (bucket(4, x))"))
    assert(e2.getMessage.contains("bucket"), e2.getMessage)
    ss.sql(s"CREATE TABLE $c.ns.t (id BIGINT, v BIGINT) PARTITIONED BY (bucket(4, id))")
    ss.sql(s"INSERT INTO $c.ns.t SELECT id, id FROM range(0, 100)")
    val e3 = intercept[Exception](ss.sql(
      s"ALTER TABLE $c.ns.t SET TBLPROPERTIES ('write.row_level.mode'='merge-on-read')"))
    assert(e3.getMessage.contains("copy-on-write"), e3.getMessage)
    val e4 = intercept[Exception](ss.sql(
      s"CALL $c.system.set_clustering(table => 'ns.t', cluster_by => 'bucket(8,id)')"))
    assert(e4.getMessage.contains("bucket layout"), e4.getMessage)
    // dropping the bucket spec is always allowed (stale ids are ignored)
    ss.sql(s"CALL $c.system.set_clustering(table => 'ns.t', cluster_by => 'id')")
    assert(ss.sql(s"SELECT count(*) FROM $c.ns.t").head().getLong(0) == 100)
  }

  test("a bucket present on one side only still joins right (pushPartValues)") {
    val (ss, c) = freshCatalog("spj_lopsided")
    ss.sql(s"CREATE TABLE $c.ns.big (id BIGINT, v BIGINT) PARTITIONED BY (bucket(8, id))")
    ss.sql(s"CREATE TABLE $c.ns.small (id BIGINT, w BIGINT) PARTITIONED BY (bucket(8, id))")
    ss.sql(s"INSERT INTO $c.ns.big SELECT id, id FROM range(0, 4000)")
    // the small side holds a handful of ids — most buckets empty
    ss.sql(s"INSERT INTO $c.ns.small VALUES (3, 30), (17, 170), (3999, 39990)")
    // disable broadcast so the SPJ path (not a broadcast join) is exercised
    val saved = ss.conf.get("spark.sql.autoBroadcastJoinThreshold")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = ss.sql(s"SELECT b.id, b.v, s.w FROM $c.ns.big b " +
        s"JOIN $c.ns.small s ON b.id = s.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(exchanges(plan) == 0, s"lopsided SPJ join shuffled:\n${plan.take(3000)}")
      assert(j.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq ==
        Seq((3L, 30L), (17L, 170L), (3999L, 39990L)))
    } finally ss.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
