package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** Backward as-of join semantics on crafted data plus agreement with a
  * brute-force range-join argmax over the events table (the independent
  * oracle for e8 is DuckDB's native ASOF JOIN; this pins the same
  * semantics in-process). */
class AsofJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofBackward matches the latest right row at or before each left row") {
    import spark.implicits._
    val trades = Seq(
      (1L, t("2024-01-01 10:00:10"), "T1"),
      (1L, t("2024-01-01 10:00:00"), "T0"), // exactly at Q1's timestamp
      (2L, t("2024-01-01 09:00:00"), "T2")) // before any quote
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, t("2024-01-01 09:59:00"), 100.0, 10L),
      (1L, t("2024-01-01 10:00:00"), 101.0, 11L),
      (2L, t("2024-01-01 09:30:00"), 200.0, 20L))
      .toDF("k", "ts", "px", "qid")
    val got = AsofJoin.asofBackward(trades, quotes, "k", "ts", Seq("px", "qid"))
      .select("trade", "asof_px", "asof_qid").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getLong(2))))).toMap
    assert(got("T1") == Some((101.0, 11L)))
    assert(got("T0") == Some((101.0, 11L)), "at-or-before: equal timestamps must match")
    assert(got("T2") == None, "left rows before any right row must get NULLs")
  }

  test("tolerance nulls out stale matches (merge_asof parity)") {
    import spark.implicits._
    val left = Seq(
      (1L, t("2024-01-01 10:00:30"), "fresh"),   // 30 s after the quote
      (1L, t("2024-01-01 10:02:00"), "stale"))   // 120 s after the quote
      .toDF("k", "ts", "tag")
    val right = Seq((1L, t("2024-01-01 10:00:00"), 7L)).toDF("k", "ts", "qid")
    val got = AsofJoin.asofBackward(left, right, "k", "ts", Seq("qid"),
        toleranceUs = Some(60L * 1000000L))
      .select("tag", "asof_qid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("fresh") == Some(7L))
    assert(got("stale") == None, "match older than the tolerance must null out")
  }

  test("carried payload is atomic: NULL right columns never mix matched rows") {
    import spark.implicits._
    val left = Seq((1L, t("2024-01-01 10:00:03"), "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 10:00:01"), Some(1.0), 10L),
      (1L, t("2024-01-01 10:00:02"), None, 20L)) // latest row has a NULL px
      .toDF("k", "ts", "px", "qid")
    val r = AsofJoin.asofBackward(left, right, "k", "ts", Seq("px", "qid")).collect()(0)
    // per-column last(ignoreNulls) would resurrect px=1.0 from the older
    // row; the struct carrier must deliver the latest row as-is
    assert(r.getAs[Long]("asof_qid") == 20L)
    assert(r.isNullAt(r.fieldIndex("asof_px")),
      s"px leaked from an older matched row: $r")
  }

  test("duplicate right timestamps resolve to the largest payload tuple") {
    import spark.implicits._
    val left = Seq((1L, t("2024-01-01 10:01:00"), "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 10:00:00"), 5.0, 10L),
      (1L, t("2024-01-01 10:00:00"), 6.0, 11L))
      .toDF("k", "ts", "px", "qid")
    val r = AsofJoin.asofBackward(left, right, "k", "ts", Seq("px", "qid")).collect()(0)
    assert((r.getAs[Double]("asof_px"), r.getAs[Long]("asof_qid")) == ((6.0, 11L)))
  }

  test("asofForward matches the earliest right row at or after each left row") {
    import spark.implicits._
    val trades = Seq(
      (1L, t("2024-01-01 10:00:00"), "T0"), // exactly at a quote's timestamp
      (1L, t("2024-01-01 10:00:10"), "T1"),
      (2L, t("2024-01-01 09:00:00"), "T2")) // all of k2's quotes are earlier
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 11L),
      (1L, t("2024-01-01 10:05:00"), 12L),
      (2L, t("2024-01-01 08:00:00"), 20L))
      .toDF("k", "ts", "qid")
    val got = AsofJoin.asofForward(trades, quotes, "k", "ts", Seq("qid"))
      .select("trade", "asof_qid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("T0") == Some(11L), "at-or-after: equal timestamps must match")
    assert(got("T1") == Some(12L))
    assert(got("T2") == None, "no right row at or after -> NULL")
  }

  test("asofNearest picks the closer side; backward wins exact ties") {
    import spark.implicits._
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), "closerAfter"),  // 120 s back vs 60 s fwd
      (2L, t("2024-01-01 10:00:30"), "tie"))          // 30 s back vs 30 s fwd
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-01 09:58:00"), 1L),
      (1L, t("2024-01-01 10:01:00"), 2L),
      (2L, t("2024-01-01 10:00:00"), 3L),
      (2L, t("2024-01-01 10:01:00"), 4L))
      .toDF("k", "ts", "qid")
    val got = AsofJoin.asofNearest(left, right, "k", "ts", Seq("qid"))
      .select("tag", "asof_qid").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("closerAfter") == 2L)
    assert(got("tie") == 3L, "equal distances must resolve backward")
  }

  test("e8 as-of equals the brute-force range-join argmax on testdata") {
    val ev = Tables(spark, sfDir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_event"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"), col("ts").as("pts"))
    val w = Window.partitionBy(col("click_event"))
      .orderBy(col("pts").desc_nulls_last, col("pid").desc_nulls_last)
    val brute = c.join(p, col("user_id") === col("pu") && col("pts") <= col("cts"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("click_event"), col("pid"),
        (unix_micros(col("cts")) - unix_micros(col("pts"))).as("us"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val got = queries.EventOps.e8AsofJoin(spark, sfDir)
      .select("click_event", "last_purchase", "us_since_purchase").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == brute,
      s"asof-only=${(got -- brute).take(3)}, brute-only=${(brute -- got).take(3)}")
  }

  test("input columns colliding with internal working names are rejected") {
    import spark.implicits._
    val right = Seq((1L, t("2024-01-01 10:00:00"), 1.0)).toDF("k", "ts", "px")
    // _side on the left would be silently replaced by withColumn and
    // corrupt the tagged union; same for the _r_<valueCol> carry slots
    val badLeft = Seq((1L, t("2024-01-01 10:00:05"), 9))
      .toDF("k", "ts", "_side")
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(badLeft, right, "k", "ts", Seq("px"))
    }
    assert(e1.getMessage.contains("_side"))
    val badRight = Seq((1L, t("2024-01-01 10:00:00"), 1.0, 2.0))
      .toDF("k", "ts", "px", "_r_px")
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofNearest(Seq((1L, t("2024-01-01 10:00:05"))).toDF("k", "ts"),
        badRight, "k", "ts", Seq("px"))
    }
    assert(e2.getMessage.contains("_r_px"))
  }
}
