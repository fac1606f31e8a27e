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

object Q {
  /** Scoped session confs for a query body: set `pairs`, run `f`,
    * restore every key to its PREVIOUS value (previously-unset keys
    * are unset again) even when `f` throws. Queries run inside one
    * shared bench/verify session — a hand-rolled save/set/restore
    * that forgets a key (or unsets one that had a prior value) leaks
    * configuration into every query that follows. */
  def withConf[T](spark: SparkSession, pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
