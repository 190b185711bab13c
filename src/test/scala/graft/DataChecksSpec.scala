package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataChecks
import graft.operators.DataChecks._

class DataChecksSpec extends AnyFunSuite {
  import SparkTestSession._

  private def table = {
    import spark.implicits._
    Seq(
      (1L, Some("click"), 10.0, "{}"),
      (2L, Some("view"), -5.0, "{}"),       // range violation
      (3L, None, 20.0, "{}"),               // null violation
      (2L, Some("hover"), 30.0, "{}"),      // dup id + set violation
      (5L, Some("click"), 40.0, "x")        // satisfies violation
    ).toDF("id", "etype", "v", "props")
  }

  test("report counts each violation class and flags pass/fail") {
    val got = DataChecks.report(table, Seq(
        NotNull("etype"),
        InRange("v", 0.0, 100.0),
        InSet("etype", Seq("click", "view")),
        Satisfies("props", "length(props) >= 2", "props_shape"),
        Unique("id")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(("not_null", "etype")) == ((1L, false)), got.toString)
    assert(got(("in_range", "v")) == ((1L, false)), got.toString)
    // NULL etype does not violate the set check; 'hover' does
    assert(got(("in_set", "etype")) == ((1L, false)), got.toString)
    assert(got(("satisfies_props_shape", "props")) == ((1L, false)), got.toString)
    assert(got(("unique", "id")) == ((1L, false)), got.toString)
  }

  test("a clean table passes every check") {
    import spark.implicits._
    val clean = Seq((1L, "click", 1.0, "{}"), (2L, "view", 2.0, "{}"))
      .toDF("id", "etype", "v", "props")
    val rep = DataChecks.report(clean, Seq(
      NotNull("etype"), InRange("v", 0.0, 10.0), Unique("id")))
    assert(rep.collect().forall(_.getBoolean(3)), rep.collect().mkString(","))
  }

  test("unique-only and scan-only check lists both work (agg split edge paths)") {
    val uniqueOnly = DataChecks.report(table, Seq(Unique("id"))).collect()
    assert(uniqueOnly.length == 1 && uniqueOnly(0).getLong(2) == 1L)
    val scanOnly = DataChecks.report(table, Seq(NotNull("etype"))).collect()
    assert(scanOnly.length == 1 && scanOnly(0).getLong(2) == 1L)
  }

  test("NULL values do not violate range or set checks (nullability is NotNull's job)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String], Option.empty[java.lang.Double]))
      .toDF("id", "etype", "v")
    val rep = DataChecks.report(df, Seq(
        InRange("v", 0.0, 1.0), InSet("etype", Seq("click"))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep == Map("in_range" -> 0L, "in_set" -> 0L), rep.toString)
  }
}
