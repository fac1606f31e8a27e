package graft.pipeline

/** Clause model for the full conditional MERGE ([[TxLog.mergeInto]]) —
  * Delta's complete `MERGE INTO` surface beyond the SCD1 upsert shape
  * [[TxLog.merge]] covers:
  *
  * {{{
  * WHEN MATCHED [AND cond] THEN UPDATE SET c = e, ... | UPDATE SET * | DELETE
  * WHEN NOT MATCHED [AND cond] THEN INSERT (c, ...) VALUES (e, ...) | INSERT *
  * WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... | DELETE
  * }}}
  *
  * Conditions and assignment right-hand sides are SQL expression
  * strings over the two row halves, referenced through the statement's
  * aliases (`t.price`, `s.price` by default) — the library API takes
  * the same strings the SQL face extracts from a parsed statement, so
  * both faces share one evaluation path. The reference's merge usage
  * is the unconditional upsert (`gold_dim_branch.ipynb:88166`,
  * `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`);
  * the conditional clauses are the lakehouse-standard extension of it.
  */
object MergeInto {
  sealed trait Action

  /** `UPDATE SET c1 = e1, ...` — each RHS a SQL expression over both
    * aliases, cast to the target column's type on write. */
  final case class Update(sets: Seq[(String, String)]) extends Action

  /** `UPDATE SET *` — every target column takes the same-named source
    * column (all must exist on the source). */
  case object UpdateAll extends Action

  /** `DELETE` — the matched (or source-less) target row is removed. */
  case object Delete extends Action

  /** `INSERT (c1, ...) VALUES (e1, ...)` — unlisted target columns
    * become NULL. */
  final case class Insert(values: Seq[(String, String)]) extends Action

  /** `INSERT *` — every target column from the same-named source
    * column (all must exist on the source). */
  case object InsertAll extends Action

  /** One `WHEN ... [AND cond] THEN action` clause; clauses fire in
    * declaration order, first passing condition wins (the SQL MERGE
    * contract). A clause list may omit the condition only on its last
    * clause. */
  final case class When(cond: Option[String], action: Action)
}
