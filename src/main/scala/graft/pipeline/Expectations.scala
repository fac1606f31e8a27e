package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectation-gated ingest — the quarantine pattern (Delta Live
  * Tables' `expect_or_drop` + quarantine table, re-expressed on
  * [[TxLog]]): rows meeting every expectation commit to the main
  * table; failing rows commit to a SIBLING quarantine table tagged
  * with the names of the rules they broke, instead of poisoning the
  * batch or being silently dropped. Contrast [[TxLog.checkConstraints]]
  * (hard CHECK: the whole commit is refused) — expectations are the
  * soft gate a production feed runs in front of it.
  *
  * Scale: one narrow pass tags rows (`array`/`filter` over the rule
  * predicates — codegen, no UDFs), checkpointed once so the good/bad
  * split doesn't recompute the input; both commits are ordinary
  * TxLog appends (ACID, partition-pruned variants compose).
  */
object Expectations {

  /** A row VIOLATES a rule when its predicate is FALSE — null passes,
    * same convention as SQL CHECK and [[TxLog.checkConstraints]]. */
  def violations(rules: Seq[(String, Column)]): Column =
    array_sort(filter(
      array(rules.map { case (n, c) =>
        when(!coalesce(c, lit(true)), lit(n)) }: _*),
      x => x.isNotNull))

  /** Tag `df` with a `_violations` string column (sorted
    * `;`-joined rule names, empty = clean). */
  def tag(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("_violations", array_join(violations(rules), ";"))

  /** Split-commit: clean rows append to `table`, violating rows (with
    * `_violations`) append to `quarantine`. Returns the committed
    * versions; `None` for a side that had no rows (no empty commits —
    * a clean batch leaves the quarantine table's version alone).
    * `txn` gives both commits the same exactly-once batch identity. */
  def appendWithQuarantine(table: TxLog, quarantine: TxLog,
                           df: DataFrame, rules: Seq[(String, Column)],
                           txn: Option[(String, Long)] = None): (Option[Long], Option[Long]) = {
    require(rules.nonEmpty, "appendWithQuarantine needs at least one rule")
    require(!df.columns.contains("_violations"),
      "batch already carries a _violations column — it is reserved for the quarantine reason tag")
    // materialize the tagging once: the good/bad split must observe
    // the SAME evaluation of a possibly-nondeterministic input
    val tagged = tag(df, rules).localCheckpoint(true)
    val good = tagged.filter(col("_violations") === "").drop("_violations")
    val bad = tagged.filter(col("_violations") =!= "")
    val vGood = if (good.isEmpty) None else Some(table.append(good, txn))
    val vBad = if (bad.isEmpty) None else Some(quarantine.append(bad, txn))
    (vGood, vBad)
  }
}
