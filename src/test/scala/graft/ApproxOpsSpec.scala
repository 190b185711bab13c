package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ApproxOps

/** Accuracy envelopes for the approximate sketch surface — these cannot
  * be oracle-checked (sketch internals are engine-private), so the
  * contract pinned here is bounded error against the exact answers. */
class ApproxOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("approx_count_distinct lands within 3x its target rsd of exact") {
    val ev = Tables(spark, sfDir, "events")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ApproxOps.approxDistinct(ev, Seq("event_type"), "user_id", rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val rel = math.abs(approx(k) - n).toDouble / n
      assert(rel <= 0.15, s"type $k: exact $n approx ${approx(k)} rel $rel")
    }
  }

  test("heavyHitters finds every true hitter, never underestimates, bounds overestimate") {
    import spark.implicits._
    // 80% "hot", 10% "warm", 10% long tail of uniques: hot and warm are
    // the only true 5%-share hitters
    val n = 20000
    val df = spark.range(n).select(
      col("id"),
      when(col("id") % 10 < 8, lit("hot"))
        .when(col("id") % 10 === 8, lit("warm"))
        .otherwise(concat(lit("tail_"), col("id"))).as("v"))
    val exact = df.groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = ApproxOps.heavyHitters(df, "v", minShare = 0.05, idCol = Some("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set("hot", "warm"),
      s"expected exactly the two true hitters, got ${got.keySet}")
    got.foreach { case (v, est) =>
      assert(est >= exact(v), s"$v: CMS must never underestimate")
      // eps=0.001 -> overestimate bounded by eps*N = 20; allow 3x slack
      assert(est <= exact(v) + 3 * (0.001 * n).toLong, s"$v: est $est exact ${exact(v)}")
    }
  }

  test("heavyHitters nomination is independent of partition layout") {
    val n = 20000
    val df = spark.range(n).select(
      col("id"),
      when(col("id") % 10 < 8, lit("hot"))
        .when(col("id") % 10 === 8, lit("warm"))
        .otherwise(concat(lit("tail_"), col("id"))).as("v"))
    // same multiset of rows, three very different layouts: the content-hash
    // nomination must return identical hitters (DataFrame.sample would not —
    // its seed is applied per-partition)
    val layouts = Seq(df.repartition(3), df.repartition(17, col("v")), df.coalesce(1))
    val results = layouts.map { d =>
      ApproxOps.heavyHitters(d, "v", minShare = 0.05, idCol = Some("id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(results.distinct.size === 1,
      s"layout-dependent heavy hitters: ${results.mkString(" vs ")}")
  }

  test("heavyHitters on an empty column returns an empty typed frame") {
    import spark.implicits._
    val empty = spark.range(0).select(concat(lit("x"), col("id")).as("v"))
    val got = ApproxOps.heavyHitters(empty, "v")
    assert(got.schema.fieldNames.toSeq === Seq("item", "est_count"))
    assert(got.count() === 0)
  }

  test("approx_percentile brackets the exact percentiles") {
    val li = Tables(spark, sfDir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.5, 0.9))").as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = ApproxOps.approxPercentiles(
        li, Seq("l_returnflag"), "l_quantity", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, ps) =>
      ps.zip(approx(k)).foreach { case (e, a) =>
        // l_quantity spans 1..50; a high-accuracy sketch must land within
        // one integer step of the exact interpolated value
        assert(math.abs(a - e) <= 1.0, s"group $k: exact $e approx $a")
      }
    }
  }
}
