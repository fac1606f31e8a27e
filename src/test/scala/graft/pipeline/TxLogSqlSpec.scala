package graft.pipeline

import graft.SparkTestBase
import graft.sql.TxLogSql
import org.apache.spark.sql.functions._

/** SQL DML face of TxLog: MERGE INTO / UPDATE / DELETE strings routed
  * through GraftExtensions' resolution rule into the library calls. */
class TxLogSqlSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(name: String) = TxLog(spark, tmpDir(s"txsql_$name"))

  test("MERGE INTO string performs the SCD1 upsert, equal to the library merge") {
    val t = fresh("merge")
    t.overwrite(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "v", "x"))
    Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("id", "v", "x")
      .createOrReplaceTempView("txsql_merge_src")
    TxLogSql.register("txsql_merge_tgt", t)
    val out = spark.sql("""
      MERGE INTO txsql_merge_tgt AS t USING txsql_merge_src AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L)) // committed version
    val rows = t.snapshot().collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(rows === Map(1L -> ("a", 10.0), 2L -> ("B", 99.0), 3L -> ("c", 30.0)))
  }

  test("MERGE source can be an arbitrary subquery") {
    val t = fresh("merge_subq")
    t.overwrite(Seq((1L, 1.0)).toDF("id", "x"))
    Seq((1L, 5.0), (1L, 7.0), (2L, 4.0)).toDF("id", "x")
      .createOrReplaceTempView("txsql_subq_src")
    TxLogSql.register("txsql_subq_tgt", t)
    spark.sql("""
      MERGE INTO txsql_subq_tgt t
      USING (SELECT id, sum(x) AS x FROM txsql_subq_src GROUP BY id) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = t.snapshot().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows === Map(1L -> 12.0, 2L -> 4.0))
  }

  test("UPDATE evaluates every RHS against the pre-update row (swap works)") {
    val t = fresh("update_swap")
    t.overwrite(Seq((1L, 10.0, 20.0), (2L, 1.0, 2.0)).toDF("id", "a", "b"))
    TxLogSql.register("txsql_swap_tgt", t)
    spark.sql("UPDATE txsql_swap_tgt SET a = b, b = a WHERE id = 1")
    val rows = t.snapshot().collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rows === Seq((1L, 20.0, 10.0), (2L, 1.0, 2.0)))
  }

  test("UPDATE without WHERE touches every row; unknown column is refused") {
    val t = fresh("update_all")
    t.overwrite(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x"))
    TxLogSql.register("txsql_updall_tgt", t)
    spark.sql("UPDATE txsql_updall_tgt SET x = x * 10")
    assert(t.snapshot().agg(sum($"x")).head().getDouble(0) === 30.0)
    intercept[Exception] {
      spark.sql("UPDATE txsql_updall_tgt SET nope = 1")
    }
  }

  test("DELETE FROM string rides the merge-on-read deletion-vector path") {
    val t = fresh("delete")
    t.overwrite(Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("id", "v"))
    TxLogSql.register("txsql_del_tgt", t)
    val dirsBefore = t.snapshotDataDirs().toSet
    spark.sql("DELETE FROM txsql_del_tgt WHERE v = 'drop'")
    assert(t.snapshot().collect().map(_.getLong(0)).sorted === Seq(1L, 3L))
    // MOR: the data dirs were NOT rewritten (tombstones only)
    assert(t.snapshotDataDirs().toSet === dirsBefore)
    // time travel still sees the deleted row
    assert(t.snapshot(0).count() === 3)
  }

  test("unsupported MERGE shapes fail analysis with the supported surface spelled out") {
    val t = fresh("merge_bad")
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    Seq((1L, "b")).toDF("id", "v").createOrReplaceTempView("txsql_bad_src")
    TxLogSql.register("txsql_bad_tgt", t)
    val e1 = intercept[Exception] {
      spark.sql("""
        MERGE INTO txsql_bad_tgt t USING txsql_bad_src s ON t.id = s.id
        WHEN MATCHED THEN DELETE""")
    }
    assert(e1.getMessage.contains("unsupported MERGE shape"))
    val e2 = intercept[Exception] {
      spark.sql("""
        MERGE INTO txsql_bad_tgt t USING txsql_bad_src s ON t.id < s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(e2.getMessage.contains("unsupported MERGE condition"))
  }

  test("DML against an unregistered name falls through to Spark's own resolution error") {
    val e = intercept[Exception] {
      spark.sql("DELETE FROM txsql_never_registered WHERE 1 = 1")
    }
    assert(!e.getMessage.contains("TxLog"))
  }
}
