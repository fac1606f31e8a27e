package graft.sql

import graft.pipeline.TxLog
import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType, TimestampType}

/** SQL DDL face of [[TxLog]] tables — the statements Delta adds beyond
  * ANSI, routed through an injected parser (the DeltaSqlParser
  * pattern: intercept the scoped statement forms, delegate everything
  * else untouched):
  *
  *   - `CREATE TABLE [IF NOT EXISTS] name (cols) USING graft
  *      [TBLPROPERTIES|OPTIONS ('keys'='k1,k2', 'statsCols'='c1,c2')]
  *      [LOCATION 'path']` — creates the transaction log (an empty v0
  *      snapshot carrying the declared schema) and [[TxLogSql.register]]s
  *      the name for DML/SELECT/TVF use. Omitting the column list
  *      ATTACHES an existing table at LOCATION (Delta's external-table
  *      create).
  *   - `DESCRIBE HISTORY name` — [[TxLog.history]] as a statement.
  *   - `VACUUM name [RETAIN n VERSIONS]` — [[TxLog.vacuum]]. The
  *      retention unit is VERSIONS, not Delta's HOURS: TxLog retention
  *      is version-count-based (documented divergence; the time-based
  *      knob is a deployment's vacuum scheduler).
  *   - `OPTIMIZE name [ZORDER BY (c1, c2, ...)]` —
  *      [[TxLog.compactSmallFiles]] (bin-packing, Delta's OPTIMIZE) or
  *      [[TxLog.compactZOrder]].
  *   - `ALTER TABLE name ADD CONSTRAINT n CHECK (p)` /
  *      `ALTER TABLE name DROP CONSTRAINT n` —
  *      [[TxLog.addConstraint]] (existing data validated, then a
  *      metadata-only commit) / [[TxLog.dropConstraint]]. Intercepted
  *      ONLY for registered names: ALTER TABLE is real Spark grammar
  *      and must keep working for catalog tables.
  *
  * Only statements whose shape matches exactly are intercepted —
  * `VACUUM`/`OPTIMIZE`/`DESCRIBE HISTORY` are not ANSI SQL and do not
  * collide with built-in statements; `CREATE TABLE` is intercepted
  * ONLY for `USING graft`. Anything else (including malformed graft
  * DDL) falls through to Spark's parser and its error messages.
  *
  * Reference: `db_notebook.ipynb:39,78,101` (the reference manages its
  * lakehouse tables through SQL DDL; this face is the TxLog parity).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case HistoryRe(name) => TxLogHistoryCommand(name)
    case VacuumRe(name, retain) =>
      TxLogVacuumCommand(name, Option(retain).map(_.toInt).getOrElse(3))
    case OptimizeRe(name, zcols) =>
      TxLogOptimizeCommand(name, Option(zcols).toSeq.flatMap(
        _.split(',').map(_.trim).filter(_.nonEmpty)))
    case CreateRe(ifNot, name, cols, tail) =>
      TxLogCreateTableCommand(name, Option(cols),
        LocationRe.findFirstMatchIn(tail).map(_.group(1)),
        propList(tail, "keys"), propList(tail, "statsCols"),
        ifNotExists = ifNot != null)
    // ALTER TABLE exists in Spark's own grammar, so these two forms
    // intercept ONLY for names this registry knows — everything else
    // (including ALTER on catalog tables) parses through the delegate
    case AlterAddCheckRe(name, cname, predicate)
        if TxLogSql.lookupMeta(name).isDefined =>
      TxLogAddConstraintCommand(name, cname, predicate.trim)
    case AlterDropCheckRe(name, cname)
        if TxLogSql.lookupMeta(name).isDefined =>
      TxLogDropConstraintCommand(name, cname)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // identifiers: dotted bare names (backticked names fall through to
  // the delegate — out of this face's scope)
  private val Id = """([\w.]+)"""
  private[sql] val HistoryRe =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Id\\s*;?\\s*""".r
  private[sql] val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$Id(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?\\s*;?\\s*""".r
  private[sql] val OptimizeRe =
    s"""(?is)\\s*OPTIMIZE\\s+$Id(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*""".r
  // greedy (.*) captures the full column list including nested parens
  // (DECIMAL(18,2)) because USING graft always follows the LAST paren
  private[sql] val CreateRe =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+(?:(IF\\s+NOT\\s+EXISTS)\\s+)?$Id\\s*(?:\\((.*)\\))?\\s*USING\\s+graft\\b(.*)""".r
  private[sql] val LocationRe = """(?is)LOCATION\s+'([^']+)'""".r
  // greedy (.*) takes the predicate to the LAST closing paren
  private[sql] val AlterAddCheckRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Id\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.*)\\)\\s*;?\\s*""".r
  private[sql] val AlterDropCheckRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Id\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*""".r

  /** Comma-split value of `'key'='v1,v2'` inside the statement tail's
    * TBLPROPERTIES/OPTIONS clause (either quoting style). */
  private def propList(tail: String, key: String): Seq[String] =
    s"""(?is)'$key'\\s*(?:=\\s*)?'([^']*)'""".r.findFirstMatchIn(tail)
      .toSeq.flatMap(_.group(1).split(',').map(_.trim).filter(_.nonEmpty))
}

private object TxLogDdl {
  def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> s"TxLog SQL DDL: $msg"))

  def rootOf(name: String): String =
    TxLogSql.lookupMeta(name).map(_._1).getOrElse(fail(
      s"'$name' is not a registered TxLog table"))
}

/** `CREATE TABLE … USING graft`: create-or-attach + register. The
  * schema (when given) parses at run time with the session's own
  * parser, so every Spark column type works. */
case class TxLogCreateTableCommand(name: String, colsDdl: Option[String],
                                   location: Option[String],
                                   keys: Seq[String], statsCols: Seq[String],
                                   ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(session: SparkSession): Seq[Row] = {
    val root = location.getOrElse {
      val wh = session.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:").stripSuffix("/")
      s"$wh/graft/${name.toLowerCase(java.util.Locale.ROOT).replace('.', '/')}"
    }
    val t = TxLog(session, root, statsCols = statsCols)
    if (t.exists()) {
      // attach semantics (Delta's external create over existing data):
      // a bare name attaches; a DECLARED schema over an existing table
      // needs IF NOT EXISTS and must match the stored one
      if (!ifNotExists && colsDdl.nonEmpty)
        TxLogDdl.fail(s"table at $root already exists — attach with CREATE " +
          "TABLE IF NOT EXISTS, or omit the column list")
      colsDdl.map(session.sessionState.sqlParser.parseTableSchema).foreach { s =>
        val stored = t.snapshot().schema
        if (s.map(f => (f.name, f.dataType)) !=
            stored.map(f => (f.name, f.dataType)))
          TxLogDdl.fail(s"declared schema ${s.simpleString} does not match " +
            s"the stored schema ${stored.simpleString} at $root")
      }
    } else {
      val schema = colsDdl.map(session.sessionState.sqlParser.parseTableSchema)
        .getOrElse(TxLogDdl.fail(
          s"no TxLog table at $root — creating one requires a column list"))
      t.overwrite(session.createDataFrame(
        session.sparkContext.emptyRDD[Row], schema))
    }
    TxLogSql.register(name, t, keys)
    Seq.empty
  }
}

/** `ALTER TABLE t ADD CONSTRAINT n CHECK (p)` →
  * [[TxLog.addConstraint]]: existing data validated, then a
  * metadata-only commit binds every later writer. */
case class TxLogAddConstraintCommand(name: String, constraint: String,
                                     predicate: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxLog(session, TxLogDdl.rootOf(name))
      .addConstraint(constraint, predicate)))
}

/** `ALTER TABLE t DROP CONSTRAINT n` → [[TxLog.dropConstraint]]. */
case class TxLogDropConstraintCommand(name: String, constraint: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(TxLog(session, TxLogDdl.rootOf(name))
      .dropConstraint(constraint)))
}

/** `DESCRIBE HISTORY t` → [[TxLog.history]] rows, newest first. */
case class TxLogHistoryCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("n_dirs", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    TxLog(session, TxLogDdl.rootOf(name)).history().collect().toSeq
}

/** `VACUUM t [RETAIN n VERSIONS]` → [[TxLog.vacuum]]; returns the
  * table path like Delta's VACUUM. */
case class TxLogVacuumCommand(name: String, keepVersions: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val root = TxLogDdl.rootOf(name)
    TxLog(session, root).vacuum(keepVersions = keepVersions)
    Seq(Row(root))
  }
}

/** `OPTIMIZE t [ZORDER BY (…)]` → bin-packing compaction
  * ([[TxLog.compactSmallFiles]], Delta's OPTIMIZE) or a z-order
  * rewrite; returns the committed version. */
case class TxLogOptimizeCommand(name: String, zorderCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val root = TxLogDdl.rootOf(name)
    val v =
      if (zorderCols.nonEmpty)
        TxLog(session, root, statsCols = zorderCols)
          .compactZOrder(zorderCols, nBuckets = 32)
      else TxLog(session, root).compactSmallFiles(128L << 20)
    TxLogSql.committed(root)
    Seq(Row(v))
  }
}
