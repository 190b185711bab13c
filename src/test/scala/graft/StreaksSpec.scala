package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side replays for the gaps-and-islands streak query (e26) and
  * the interval-join→percentile composition (e27). */
class StreaksSpec extends AnyFunSuite {
  import SparkTestSession._

  test("e26_streaks equals a naive longest-run scan per user") {
    val got = SparkEntry.queries("e26_streaks")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Tables(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 as day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val days = rs.map(_._2).sorted
      // walk the sorted day list; a gap > 1 closes the current run
      var bestLen = 0L; var bestStart = Long.MaxValue
      var curLen = 0L; var curStart = 0L
      days.foreach { d =>
        if (curLen == 0L || d == curStart + curLen) {
          if (curLen == 0L) curStart = d
          curLen += 1
        } else { curStart = d; curLen = 1 }
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
      }
      assert(got(uid) === ((bestLen, bestStart)), s"user $uid days=${days.toList}")
    }
  }

  test("e27_convert_time: deltas positive, capped at 30 min, p50 <= p90") {
    val got = SparkEntry.queries("e27_convert_time")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (hour, n, p50, p90) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(hour >= 0 && hour < 24)
      assert(n > 0)
      assert(p50 > 0 && p90 <= 1800000000.0, s"hour $hour: p90 $p90")
      assert(p50 <= p90, s"hour $hour")
    }
    // cross-check one group against the exact percentile() builtin
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    val deltas = clicks.join(purchases, Seq("user_id"))
      .filter(col("p_us") > col("c_us") &&
        col("p_us") <= col("c_us") + lit(1800000000L))
      .groupBy(col("click_id"), col("c_us")).agg(min(col("p_us")).as("fp"))
      .select(expr("(c_us div 3600000000) % 24").as("h"),
        (col("fp") - col("c_us")).cast("double").as("d"))
    val ref = deltas.groupBy(col("h"))
      .agg(expr("percentile(d, array(0.5, 0.9))").as("ps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    got.foreach { r =>
      val ps = ref(r.getLong(0))
      assert(r.getDouble(2) === ps(0), s"hour ${r.getLong(0)} p50")
      assert(r.getDouble(3) === ps(1), s"hour ${r.getLong(0)} p90")
    }
  }
}
