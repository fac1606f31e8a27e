package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Conservative per-column bound extraction from a predicate — the
  * shared front half of data skipping, used by the optimizer's scan
  * rule ([[TxLogSkipScans]], resolved attributes) and the DML paths
  * ([[graft.pipeline.TxLog.deleteWhere]]/`updateWhere`, parsed-but-
  * unresolved predicate strings). Only shapes whose exclusion is
  * provably safe contribute: conjuncts of equality/comparison against
  * a literal, and IN over literals. Everything else contributes
  * nothing — the caller keeps the dir. */
object PredicateBounds {

  /** (column, inclusive lo, inclusive hi, literal type) — strict
    * bounds are widened to inclusive, so an endpoint-touching dir is
    * kept. The literal's TYPE rides along because the DML face hands
    * this extractor parsed-but-unresolved predicates whose literals
    * were never coerced to the column type: the consumer must decide
    * per stats-column type whether the canonical string is comparable
    * (and re-render it for exact Bloom probes) — see
    * [[graft.pipeline.TxLog]]'s normalization. */
  type Bound = (String, Option[String], Option[String], DataType)

  /** CAST-to-STRING canonical form of a literal, matching how
    * [[graft.pipeline.TxLog]] commits range stats; None for types
    * whose rendering is not trivially canonical. */
  def canon(v: Any, dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(v.toString)
    case FloatType | DoubleType => Some(v.toString)
    case StringType => Some(v.toString)
    // DATE stats are committed as CAST-to-STRING ISO dates (which sort
    // chronologically); a date literal is days-since-epoch
    case DateType => Some(java.time.LocalDate
      .ofEpochDay(v.asInstanceOf[Int].toLong).toString)
    case _ => None
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.nameParts.head)
    case _ => None
  }

  /** The conjuncts skipping understands: per-column bounds, Bloom
    * point probes, and IN-lists (returned separately — a dir survives
    * an IN if ANY value may match, so they cannot fold into the
    * conjunctive bound set). */
  def extract(cond: Expression)
      : (Seq[Bound], Seq[(String, String, DataType)],
         Seq[(String, Seq[String], DataType)]) = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    val bounds = Seq.newBuilder[Bound]
    val points = Seq.newBuilder[(String, String, DataType)]
    val ins = Seq.newBuilder[(String, Seq[String], DataType)]
    split(cond).foreach {
      case EqualTo(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach { s =>
          bounds += ((n, Some(s), Some(s), dt)); points += ((n, s, dt)) })
      case EqualTo(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach { s =>
          bounds += ((n, Some(s), Some(s), dt)); points += ((n, s, dt)) })
      case GreaterThan(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, Some(s), None, dt))))
      case GreaterThanOrEqual(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, Some(s), None, dt))))
      case LessThan(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, None, Some(s), dt))))
      case LessThanOrEqual(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, None, Some(s), dt))))
      case GreaterThan(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, None, Some(s), dt))))
      case GreaterThanOrEqual(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, None, Some(s), dt))))
      case LessThan(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, Some(s), None, dt))))
      case LessThanOrEqual(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, Some(s), None, dt))))
      case In(a, list)
          if list.nonEmpty && list.forall {
            case Literal(v, _) => v != null; case _ => false } &&
            list.map(_.dataType).distinct.length == 1 =>
        attrName(a).foreach { n =>
          val dt = list.head.dataType
          val vs = list.flatMap { case Literal(v, dt0) => canon(v, dt0) }
          if (vs.length == list.length) ins += ((n, vs, dt))
        }
      case _ => () // unsupported shape: contributes no pruning
    }
    (bounds.result(), points.result(), ins.result())
  }
}
