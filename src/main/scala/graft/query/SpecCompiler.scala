package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** QuerySpec → DataFrame. The output is a declarative Catalyst plan, so
  * every reference "optimization" (WHERE/LIMIT pushdown, column pruning,
  * table routing — SURVEY §4) falls out of the optimizer: filters built
  * here reach the parquet scan as PushedFilters, projections prune the
  * read schema, and order+limit compiles to TakeOrderedAndProject.
  */
object SpecCompiler {

  case class InvalidSpec(problems: Seq[String])
      extends IllegalArgumentException(problems.mkString("; "))

  /** Schema validation: unknown columns produce a friendly error listing
    * every problem at once (vs the analyzer's first-failure). */
  def validate(spec: QuerySpec, df: DataFrame): Unit = {
    val known = df.schema.fieldNames.toSet
    val missing = spec.referencedColumns.filterNot(known.contains)
    val badAgg = spec.aggregations.filter(a =>
      a.column == "*" && a.fn != AggFn.Count)
    val problems =
      missing.map(c => s"unknown column '$c' (table '${spec.table}')") ++
        badAgg.map(a => s"aggregate ${a.fn} requires a column, got '*'")
    if (problems.nonEmpty) throw InvalidSpec(problems)
  }

  def predicate(p: Predicate): Column = p match {
    case Predicate.Eq(c, v) => col(c) === lit(v)
    case Predicate.EqCI(c, v) => upper(col(c)) === upper(lit(v))
    case Predicate.Cmp(c, ">", v) => col(c) > lit(v)
    case Predicate.Cmp(c, ">=", v) => col(c) >= lit(v)
    case Predicate.Cmp(c, "<", v) => col(c) < lit(v)
    case Predicate.Cmp(c, "<=", v) => col(c) <= lit(v)
    case Predicate.Cmp(c, "!=", v) => col(c) =!= lit(v)
    case Predicate.Cmp(_, op, _) =>
      throw InvalidSpec(Seq(s"unknown comparison operator '$op'"))
    case Predicate.Between(c, lo, hi) => col(c).between(lit(lo), lit(hi))
    case Predicate.In(c, vs) => col(c).isin(vs: _*)
    case Predicate.Prefix(c, pre) => col(c).startsWith(pre)
    case Predicate.And(ps) => ps.map(predicate).reduceOption(_ && _).getOrElse(lit(true))
    case Predicate.Or(ps) => ps.map(predicate).reduceOption(_ || _).getOrElse(lit(false))
  }

  private def aggregate(a: Aggregation): Column = {
    val c = a.fn match {
      case AggFn.Sum => sum(col(a.column))
      case AggFn.Avg => avg(col(a.column))
      case AggFn.Min => min(col(a.column))
      case AggFn.Max => max(col(a.column))
      case AggFn.Count => if (a.column == "*") count(lit(1)) else count(col(a.column))
      case AggFn.CountDistinct => countDistinct(col(a.column))
    }
    c.as(a.alias)
  }

  /** Compile against a resolver from table name to DataFrame (a catalog
    * lookup, a Tables(...) closure, or a test fixture map). */
  def compile(spec: QuerySpec, resolve: String => DataFrame): DataFrame = {
    val base = resolve(spec.table)
    validate(spec, base)
    val filtered = spec.where.map(predicate).reduceOption(_ && _)
      .map(base.filter).getOrElse(base)

    val shaped =
      if (spec.aggregations.nonEmpty) {
        val aggs = spec.aggregations.map(aggregate)
        if (spec.groupBy.nonEmpty)
          filtered.groupBy(spec.groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
        else filtered.agg(aggs.head, aggs.tail: _*)
      } else if (spec.select.nonEmpty) filtered.select(spec.select.map(col): _*)
      else filtered

    val dist = if (spec.distinct) shaped.distinct() else shaped
    val sorted =
      if (spec.orderBy.nonEmpty)
        dist.orderBy(spec.orderBy.map(s => if (s.ascending) col(s.column).asc else col(s.column).desc): _*)
      else dist
    spec.limit.map(sorted.limit).getOrElse(sorted)
  }
}
