package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL
  * the driver hash-compares against (`Verify.scala` contract).
  *
  * Column names are aligned on both sides — the driver sorts columns by
  * name before hashing, so every computed column is aliased identically
  * in the Spark plan and the oracle SQL.
  */
final case class Q(name: String,
                   run: (SparkSession, String) => DataFrame,
                   oracle: Option[String] = None,
                   bench: Boolean = false)
