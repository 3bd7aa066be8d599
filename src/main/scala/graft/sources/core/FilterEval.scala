package graft.sources.core

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Reader-side evaluation of pushed-down v1 Filters over full-schema
  * Catalyst value arrays.
  *
  * Contract: this is an early-skip optimization only — Spark re-applies
  * every filter above the scan (GraftScanBuilder.pushFilters returns all
  * of them), so the only correctness requirement here is "never drop a
  * row that matches". Anything not confidently evaluable keeps the row.
  */
object FilterEval {

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: EqualNullSafe | _: GreaterThan | _: GreaterThanOrEqual |
        _: LessThan | _: LessThanOrEqual | _: IsNull | _: IsNotNull | _: In |
        _: StringStartsWith | _: StringEndsWith | _: StringContains => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r)  => supported(l) && supported(r)
    case Not(c)    => supported(c)
    case _         => false
  }

  def build(filters: Array[Filter], schema: StructType): Array[Any] => Boolean = {
    if (filters.isEmpty) return _ => true
    val evals = filters.filter(supported).map(one(_, schema))
    vals => evals.forall(e => e(vals) != Some(false))
  }

  /** Three-valued: Some(true)/Some(false)/None (unknown -> keep). */
  private def one(f: Filter, schema: StructType): Array[Any] => Option[Boolean] = f match {
    case EqualTo(a, v)            => cmp(a, v, schema, c => c == 0)
    case EqualNullSafe(a, v) =>
      col(a, schema) match {
        case Some(i) => vals =>
          if (v == null) Some(vals(i) == null)
          else if (vals(i) == null) Some(false)
          else compare(norm(vals(i)), norm(v)).map(_ == 0)
        case None => _ => None
      }
    case GreaterThan(a, v)        => cmp(a, v, schema, c => c > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, v, schema, c => c >= 0)
    case LessThan(a, v)           => cmp(a, v, schema, c => c < 0)
    case LessThanOrEqual(a, v)    => cmp(a, v, schema, c => c <= 0)
    case IsNull(a) =>
      col(a, schema) match {
        case Some(i) => vals => Some(vals(i) == null)
        case None    => _ => None
      }
    case IsNotNull(a) =>
      col(a, schema) match {
        case Some(i) => vals => Some(vals(i) != null)
        case None    => _ => None
      }
    case In(a, vs) =>
      col(a, schema) match {
        case Some(i) =>
          val set = vs.map(norm).toSet
          vals => if (vals(i) == null) Some(false) else Some(set.contains(norm(vals(i))))
        case None => _ => None
      }
    case StringStartsWith(a, p) => strPred(a, schema, _.startsWith(p))
    case StringEndsWith(a, p)   => strPred(a, schema, _.endsWith(p))
    case StringContains(a, p)   => strPred(a, schema, _.contains(p))
    case And(l, r) =>
      val (le, re) = (one(l, schema), one(r, schema))
      vals => (le(vals), re(vals)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
    case Or(l, r) =>
      val (le, re) = (one(l, schema), one(r, schema))
      vals => (le(vals), re(vals)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
    case Not(c) =>
      val ce = one(c, schema)
      vals => ce(vals).map(!_)
    case _ => _ => None
  }

  private def col(name: String, schema: StructType): Option[Int] =
    if (schema.fieldNames.contains(name)) Some(schema.fieldIndex(name)) else None

  private def strPred(a: String, schema: StructType,
                      p: String => Boolean): Array[Any] => Option[Boolean] =
    col(a, schema) match {
      case Some(i) =>
        vals => vals(i) match {
          case null            => Some(false)
          case u: UTF8String   => Some(p(u.toString))
          case s: String       => Some(p(s))
          case _               => None
        }
      case None => _ => None
    }

  private def norm(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case other         => other
  }

  private def cmp(a: String, v: Any, schema: StructType,
                  test: Int => Boolean): Array[Any] => Option[Boolean] =
    col(a, schema) match {
      case Some(i) =>
        vals => {
          val x = vals(i)
          if (x == null || v == null) Some(false)
          else compare(norm(x), norm(v)).map(test)
        }
      case None => _ => None
    }

  /** None when types aren't confidently comparable. */
  private def compare(x: Any, y: Any): Option[Int] = (x, y) match {
    case (a: String, b: String)   => Some(a.compareTo(b))
    case (a: Number, b: Number) if integral(a) && integral(b) =>
      Some(java.lang.Long.compare(a.longValue(), b.longValue()))
    case (a: Number, b: Number)   => Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
    case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
    case _                        => None
  }

  private def integral(n: Number): Boolean = n match {
    case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }
}
