package graft.query

/** Declarative intermediate representation between the NL planner and the
  * DataFrame compiler — the typed replacement for every reference
  * `generate_query`/`advanced_query` SQL-string builder (SURVEY §3). A
  * QuerySpec is data: the planner builds one from parsed filters/metrics,
  * [[SpecCompiler]] turns it into a Catalyst plan, and validation happens
  * against the actual table schema (the reference's filter-key whitelist,
  * `Disaster dollar/server.py:57-70`, generalized).
  */
sealed trait Predicate
object Predicate {
  case class Eq(column: String, value: Any) extends Predicate
  /** Case-insensitive equality (`UPPER(City) = UPPER(?)`). */
  case class EqCI(column: String, value: String) extends Predicate
  /** op ∈ {">", ">=", "<", "<=", "!="} */
  case class Cmp(column: String, op: String, value: Any) extends Predicate
  case class Between(column: String, lo: Any, hi: Any) extends Predicate
  case class In(column: String, values: Seq[Any]) extends Predicate
  /** String prefix match (the ERA5 `date LIKE 'YYYY-MM%'` pattern). */
  case class Prefix(column: String, prefix: String) extends Predicate
  case class And(ps: Seq[Predicate]) extends Predicate
  case class Or(ps: Seq[Predicate]) extends Predicate
}

sealed trait AggFn
object AggFn {
  case object Sum extends AggFn
  case object Avg extends AggFn
  case object Min extends AggFn
  case object Max extends AggFn
  case object Count extends AggFn
  case object CountDistinct extends AggFn
}

case class Aggregation(fn: AggFn, column: String, alias: String)

case class Sort(column: String, ascending: Boolean = true)

/** table: registered table name; select: projection (empty = all);
  * aggregations with optional groupBy; distinct; sort; limit. */
case class QuerySpec(
    table: String,
    select: Seq[String] = Nil,
    where: Seq[Predicate] = Nil,
    groupBy: Seq[String] = Nil,
    aggregations: Seq[Aggregation] = Nil,
    distinct: Boolean = false,
    orderBy: Seq[Sort] = Nil,
    limit: Option[Int] = None) {

  /** Every column the spec references (for schema validation). */
  def referencedColumns: Seq[String] = {
    def predCols(p: Predicate): Seq[String] = p match {
      case Predicate.Eq(c, _) => Seq(c)
      case Predicate.EqCI(c, _) => Seq(c)
      case Predicate.Cmp(c, _, _) => Seq(c)
      case Predicate.Between(c, _, _) => Seq(c)
      case Predicate.In(c, _) => Seq(c)
      case Predicate.Prefix(c, _) => Seq(c)
      case Predicate.And(ps) => ps.flatMap(predCols)
      case Predicate.Or(ps) => ps.flatMap(predCols)
    }
    (select ++ where.flatMap(predCols) ++ groupBy ++
      aggregations.map(_.column).filter(_ != "*") ++ orderBy.map(_.column)).distinct
  }
}
