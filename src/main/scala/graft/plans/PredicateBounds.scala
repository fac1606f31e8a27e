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

  /** (column, inclusive lo, inclusive hi) — strict bounds are widened
    * to inclusive, so an endpoint-touching dir is kept. */
  type Bound = (String, Option[String], Option[String])

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
      : (Seq[Bound], Seq[(String, String)], Seq[(String, Seq[String])]) = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    val bounds = Seq.newBuilder[Bound]
    val points = Seq.newBuilder[(String, String)]
    val ins = Seq.newBuilder[(String, Seq[String])]
    split(cond).foreach {
      case EqualTo(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach { s => bounds += ((n, Some(s), Some(s))); points += ((n, s)) })
      case EqualTo(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach { s => bounds += ((n, Some(s), Some(s))); points += ((n, s)) })
      case GreaterThan(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, Some(s), None))))
      case GreaterThanOrEqual(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, Some(s), None))))
      case LessThan(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, None, Some(s)))))
      case LessThanOrEqual(a, Literal(v, dt)) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, None, Some(s)))))
      case GreaterThan(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, None, Some(s)))))
      case GreaterThanOrEqual(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, None, Some(s)))))
      case LessThan(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, Some(s), None))))
      case LessThanOrEqual(Literal(v, dt), a) if v != null => attrName(a).foreach(n =>
        canon(v, dt).foreach(s => bounds += ((n, Some(s), None))))
      case In(a, list)
          if list.nonEmpty && list.forall {
            case Literal(v, _) => v != null; case _ => false } =>
        attrName(a).foreach { n =>
          val vs = list.flatMap { case Literal(v, dt) => canon(v, dt) }
          if (vs.length == list.length) ins += ((n, vs))
        }
      case _ => () // unsupported shape: contributes no pruning
    }
    (bounds.result(), points.result(), ins.result())
  }
}
