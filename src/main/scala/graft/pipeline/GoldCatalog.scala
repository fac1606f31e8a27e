package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Catalog layer (S7–S9): maps the reference's 3-level Unity Catalog
  * namespace `cars_catalog.gold.<table>` onto Spark's 2-level session
  * catalog as database `gold` (SURVEY §4.3), with parquet-dir-backed
  * external tables under a warehouse root.
  *
  * `CREATE CATALOG cars_catalog` / `CREATE SCHEMA …` in the reference
  * (`db_notebook.ipynb:39,78,101`) become `CREATE DATABASE IF NOT
  * EXISTS`; `spark.catalog.tableExists('cars_catalog.gold.dim_branch')`
  * (`gold_dim_branch.ipynb:43065`) keeps its exact role as the
  * initial-vs-incremental gate (S8).
  */
final case class GoldCatalog(spark: SparkSession, warehouse: String) {

  def ensureDatabases(): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS silver")
    spark.sql("CREATE DATABASE IF NOT EXISTS gold")
  }

  def tablePath(db: String, table: String): String = s"$warehouse/$db/$table"

  /** S8 — existence probe: a parquet dir with a _SUCCESS commit marker.
    * (Catalog registration is session-scoped; the filesystem is the
    * durable truth, as with the reference's external-location tables.) */
  def tableExists(db: String, table: String): Boolean = {
    val p = new Path(tablePath(db, table), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** S6 — managed-table sink with external path: write parquet +
    * register in the session catalog so SQL sees `gold.dim_branch`. */
  def saveAsTable(df: DataFrame, db: String, table: String): Unit = {
    val path = tablePath(db, table)
    df.write.mode("overwrite").parquet(path)
    register(db, table)
  }

  def register(db: String, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    spark.sql(
      s"CREATE TABLE $db.$table USING parquet LOCATION '${tablePath(db, table)}'")
  }

  /** S9 — catalog table scan. */
  def table(db: String, table: String): DataFrame =
    spark.read.parquet(tablePath(db, table))

  def refresh(db: String, table: String): Unit =
    if (spark.catalog.tableExists(s"$db.$table"))
      spark.sql(s"REFRESH TABLE $db.$table")

  /** S7 — DROP TABLE IF EXISTS (reference `drop table.ipynb:24-32`). */
  def dropTable(db: String, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    val p = new Path(tablePath(db, table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
