package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared SparkSession for all specs (one JVM-wide session; suites are run
  * in the forked test JVM). sf0.001 keeps every suite sub-second-ish. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class GraftSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a callable plan and nonempty schema on sf0.001", SlowTier) {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name has empty schema")
      // force execution
      df.count()
    }
  }

  test("queries and oracles are in 1:1 correspondence") {
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty, s"oracle entries without queries: $orphanOracles")
    // every query here is SQL-expressible; a missing oracle would
    // silently downgrade it to the driver's weaker rows-only check
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries without oracle coverage: $unchecked")
  }

  test("q1_agg groups are the lineitem flag/status domain") {
    val rows = SparkEntry.queries("q1_agg")(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(0)).toSet == Set("A", "N", "R"))
  }

  test("q2_topn returns at most 100 rows in descending price order") {
    val prices = SparkEntry.queries("q2_topn")(spark, sfDir)
      .collect().map(_.getDouble(3))
    assert(prices.length <= 100)
    assert(prices.sameElements(prices.sortBy(-_)), "not sorted desc")
  }

  test("q9_window_topk keeps at most 3 rows per segment") {
    val byseg = SparkEntry.queries("q9_window_topk")(spark, sfDir)
      .collect().groupBy(_.getString(0))
    assert(byseg.values.forall(_.length <= 3))
  }

  test("q19_fuzzy_match resolves misspelled region names") {
    val m = SparkEntry.queries("q19_fuzzy_match")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("AMERIC") == "AMERICA")
    assert(m("EUROP") == "EUROPE")
    assert(m("MIDLE EAST") == "MIDDLE EAST")
    assert(!m.contains("ATLANTIS"), "no match should survive the 0.6 cutoff")
  }
}
