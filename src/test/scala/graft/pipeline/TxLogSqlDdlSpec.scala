package graft.pipeline

import graft.SparkTestBase
import graft.sql.TxLogSql
import org.apache.spark.sql.functions._

/** SQL DDL face: a TxLog table's WHOLE LIFE driven purely by SQL
  * strings — create, insert, merge, update, delete, time travel,
  * history, optimize, z-order, vacuum — with zero library calls in
  * the driving code (the r7/r8 verdict item: tables must not need
  * Scala registration to exist in SQL). */
class TxLogSqlDdlSpec extends SparkTestBase {
  import spark.implicits._

  test("full SQL lifecycle: CREATE … USING graft → DML → history → OPTIMIZE → VACUUM") {
    val loc = tmpDir("sqlddl_life")
    spark.sql(s"""
      CREATE TABLE sqlddl_life (id BIGINT, v STRING, bal DECIMAL(18,2))
      USING graft TBLPROPERTIES ('keys'='id') LOCATION '$loc'""")
    // v0 is the empty seed with the declared schema
    assert(spark.sql("SELECT * FROM sqlddl_life").columns.toSeq ===
      Seq("id", "v", "bal"))
    assert(spark.sql("SELECT count(*) FROM sqlddl_life").head().getLong(0) === 0L)
    spark.sql("INSERT INTO sqlddl_life VALUES (1, 'a', 10.00), (2, 'b', 20.00)")
    Seq((2L, "B", BigDecimal("21.00")), (3L, "c", BigDecimal("30.00")))
      .toDF("id", "v", "bal").createOrReplaceTempView("sqlddl_src")
    spark.sql("""
      MERGE INTO sqlddl_life AS t USING sqlddl_src AS s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    spark.sql("UPDATE sqlddl_life SET bal = bal + 1 WHERE id = 1")
    spark.sql("DELETE FROM sqlddl_life WHERE id = 3")
    val now = spark.sql("SELECT id, v, CAST(bal AS DOUBLE) FROM sqlddl_life")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(now === Set((1L, "a", 11.0), (2L, "B", 21.0)))
    // time travel + CDF through the same registration
    assert(spark.sql("SELECT count(*) FROM sqlddl_life VERSION AS OF 1")
      .head().getLong(0) === 2L)
    assert(spark.sql(
      "SELECT count(*) FROM table_changes('sqlddl_life', 0, 1)")
      .head().getLong(0) === 2L) // empty seed + 2 inserts
    // DESCRIBE HISTORY: 5 commits, newest first, operations recorded
    val hist = spark.sql("DESCRIBE HISTORY sqlddl_life")
      .select("version", "operation").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist.map(_._1) === Seq(4L, 3L, 2L, 1L, 0L))
    assert(hist.map(_._2) ===
      Seq("DELETE", "UPDATE", "MERGE", "APPEND", "OVERWRITE"))
    // OPTIMIZE bin-packs the small dirs into a new version
    val ov = spark.sql("OPTIMIZE sqlddl_life").head().getLong(0)
    assert(ov === 5L)
    assert(spark.sql("SELECT count(*) FROM sqlddl_life").head().getLong(0) === 2L)
    // VACUUM RETAIN 1 VERSIONS: only the optimized head survives
    assert(spark.sql("VACUUM sqlddl_life RETAIN 1 VERSIONS")
      .head().getString(0) === loc)
    intercept[Exception] {
      spark.sql("SELECT * FROM sqlddl_life VERSION AS OF 0").collect()
    }
    assert(spark.sql("SELECT count(*) FROM sqlddl_life").head().getLong(0) === 2L)
    TxLogSql.unregister("sqlddl_life")
  }

  test("CREATE TABLE attaches an existing table; schema mismatch and double-create are refused") {
    val loc = tmpDir("sqlddl_attach")
    TxLog(spark, loc).overwrite(Seq((1L, "x")).toDF("id", "v"))
    // attach WITHOUT a column list: schema comes from the log
    spark.sql(s"CREATE TABLE sqlddl_att USING graft LOCATION '$loc'")
    assert(spark.sql("SELECT id, v FROM sqlddl_att").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "x")))
    // re-create over the same location without IF NOT EXISTS + schema: refused
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE sqlddl_att2 (id BIGINT, v STRING) USING graft LOCATION '$loc'")
    }
    assert(e.getMessage.contains("already exists"))
    // IF NOT EXISTS with a MATCHING schema attaches quietly
    spark.sql(s"CREATE TABLE IF NOT EXISTS sqlddl_att3 (id BIGINT, v STRING) USING graft LOCATION '$loc'")
    assert(spark.sql("SELECT count(*) FROM sqlddl_att3").head().getLong(0) === 1L)
    // IF NOT EXISTS with a WRONG schema is still refused (silent
    // mis-attachment would corrupt later INSERT alignment)
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE IF NOT EXISTS sqlddl_att4 (id INT) USING graft LOCATION '$loc'")
    }
    assert(e2.getMessage.contains("does not match"))
    Seq("sqlddl_att", "sqlddl_att3").foreach(TxLogSql.unregister)
  }

  test("OPTIMIZE … ZORDER BY rewrites the layout and stats-prunes on both columns") {
    val loc = tmpDir("sqlddl_zorder")
    spark.sql(s"CREATE TABLE sqlddl_z (a BIGINT, b BIGINT, p STRING) USING graft LOCATION '$loc'")
    val rows = (0L until 1024L).map(i => (i % 32, i / 32, s"r$i"))
    rows.toDF("a", "b", "p").createOrReplaceTempView("sqlddl_z_src")
    spark.sql("INSERT INTO sqlddl_z SELECT * FROM sqlddl_z_src")
    val v = spark.sql("OPTIMIZE sqlddl_z ZORDER BY (a, b)").head().getLong(0)
    assert(v === 2L)
    assert(spark.sql("SELECT count(*) FROM sqlddl_z").head().getLong(0) === 1024L)
    // the z-ordered table range-prunes on BOTH columns: a point read
    // opens fewer dirs than the table has
    val t = TxLog(spark, loc, statsCols = Seq("a", "b"))
    val all = new java.io.File(s"$loc/data").listFiles().count(_.isDirectory)
    assert(t.pointDirs("a", "3").size < all)
    assert(t.pointDirs("b", "3").size < all)
    TxLogSql.unregister("sqlddl_z")
  }

  test("managed location: CREATE TABLE without LOCATION lands under the warehouse dir") {
    val name = "sqlddl_managed"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripSuffix("/")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$wh/graft/$name"))
    spark.sql(s"CREATE TABLE $name (k INT) USING graft")
    spark.sql(s"INSERT INTO $name VALUES (7)")
    assert(spark.sql(s"SELECT k FROM $name").head().getInt(0) === 7)
    assert(new java.io.File(s"$wh/graft/$name/_txlog").exists())
    TxLogSql.unregister(name)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT: validates existing data, binds later writers, metadata-only") {
    val loc = tmpDir("sqlddl_constraint")
    spark.sql(s"CREATE TABLE sqlddl_chk (id BIGINT, bal DECIMAL(18,2)) USING graft LOCATION '$loc'")
    spark.sql("INSERT INTO sqlddl_chk VALUES (1, 10.00), (2, 20.00)")
    val v = spark.sql(
      "ALTER TABLE sqlddl_chk ADD CONSTRAINT bal_pos CHECK (bal >= 0)")
      .head().getLong(0)
    assert(v === 2L) // metadata-only commit
    assert(spark.sql("SELECT count(*) FROM sqlddl_chk").head().getLong(0) === 2L)
    // the constraint binds every later writer — violating INSERT refused
    intercept[Exception](spark.sql("INSERT INTO sqlddl_chk VALUES (3, -1.00)"))
    assert(spark.sql("SELECT count(*) FROM sqlddl_chk").head().getLong(0) === 2L)
    // idempotent re-add; different predicate under the same name refused
    assert(spark.sql(
      "ALTER TABLE sqlddl_chk ADD CONSTRAINT bal_pos CHECK (bal >= 0)")
      .head().getLong(0) === 2L)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE sqlddl_chk ADD CONSTRAINT bal_pos CHECK (bal > 5)"))
    assert(e.getMessage.contains("different predicate"))
    // a constraint EXISTING data violates is refused, nothing committed
    intercept[Exception](spark.sql(
      "ALTER TABLE sqlddl_chk ADD CONSTRAINT bal_big CHECK (bal > 15)"))
    assert(TxLog(spark, loc).currentVersion() === 2L)
    // DROP releases it: the same insert now commits
    spark.sql("ALTER TABLE sqlddl_chk DROP CONSTRAINT bal_pos")
    spark.sql("INSERT INTO sqlddl_chk VALUES (3, -1.00)")
    assert(spark.sql("SELECT count(*) FROM sqlddl_chk").head().getLong(0) === 3L)
    // dropping a missing name is refused loudly
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE sqlddl_chk DROP CONSTRAINT no_such"))
    assert(e2.getMessage.contains("no CHECK constraint"))
    // the audit trail records both metadata commits
    val ops = spark.sql("DESCRIBE HISTORY sqlddl_chk")
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("ADD CONSTRAINT bal_pos") &&
      ops.contains("DROP CONSTRAINT bal_pos"))
    TxLogSql.unregister("sqlddl_chk")
  }

  test("non-graft statements and unregistered names pass through to Spark untouched") {
    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) === 2)
    // VACUUM / OPTIMIZE / DESCRIBE HISTORY on an unregistered name
    // fail with the registry's clear error, not a parse crash
    val e = intercept[Exception](spark.sql("VACUUM not_registered"))
    assert(e.getMessage.contains("not a registered TxLog table"))
    val e2 = intercept[Exception](spark.sql("DESCRIBE HISTORY not_registered"))
    assert(e2.getMessage.contains("not a registered TxLog table"))
    // CREATE TABLE USING anything-else is Spark's own statement
    spark.sql("CREATE TABLE IF NOT EXISTS sqlddl_parquet_tbl (k INT) USING parquet")
    spark.sql("DROP TABLE IF EXISTS sqlddl_parquet_tbl")
  }
}
