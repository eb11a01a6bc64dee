package graft.tools

import graft.Sessions

/** Interactive smoke drive of the GraftCatalog SQL verbs (development
  * tool; the registered queries + CatalogSpec are the durable checks). */
object CatalogSmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-catalog-smoke")
    val root = java.nio.file.Files.createTempDirectory("graft-cat-smoke-")
    spark.conf.set("spark.sql.catalog.gcat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", root.toString)

    def sql(q: String): Unit = {
      System.err.println(s"\n>>> $q")
      spark.sql(q).show(20, truncate = false)
    }

    sql("CREATE TABLE gcat.ns.docs (id BIGINT, text STRING, score DOUBLE) ")
    sql("INSERT INTO gcat.ns.docs VALUES (1,'a',0.1),(2,'b',0.2),(3,'c',0.3)")
    sql("SELECT * FROM gcat.ns.docs ORDER BY id")
    sql("INSERT INTO gcat.ns.docs VALUES (4,'d',0.4)")
    sql("SELECT count(*) AS n FROM gcat.ns.docs")
    sql("SELECT * FROM gcat.ns.docs VERSION AS OF 1 ORDER BY id")
    sql("UPDATE gcat.ns.docs SET score = score * 10 WHERE id <= 2")
    sql("SELECT * FROM gcat.ns.docs ORDER BY id")
    sql("DELETE FROM gcat.ns.docs WHERE id = 3")
    sql("SELECT * FROM gcat.ns.docs ORDER BY id")
    spark.sql("CREATE OR REPLACE TEMP VIEW delta AS " +
      "SELECT * FROM VALUES (1,'a2',9.0),(9,'i',0.9) AS t(id, text, score)")
    sql("""MERGE INTO gcat.ns.docs t USING delta s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET t.text = s.text, t.score = s.score
           WHEN NOT MATCHED THEN INSERT (id, text, score) VALUES (s.id, s.text, s.score)""")
    sql("SELECT * FROM gcat.ns.docs ORDER BY id")
    sql("SELECT * FROM gcat.ns.docs VERSION AS OF 2 ORDER BY id")
    sql("INSERT OVERWRITE gcat.ns.docs VALUES (100,'fresh',1.0)")
    sql("SELECT * FROM gcat.ns.docs ORDER BY id")
    sql("SELECT * FROM gcat.ns.docs VERSION AS OF 5 ORDER BY id")
    // plan audit: pushdown must reach the delegate parquet scan
    System.err.println("\n>>> explain SELECT id FROM gcat.ns.docs VERSION AS OF 2 WHERE id > 1")
    spark.sql("SELECT id FROM gcat.ns.docs VERSION AS OF 2 WHERE id > 1").explain(true)
    spark.stop()
  }
}
