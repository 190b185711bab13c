package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewAgg

class SkewAggSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted sum/count/avg equal the direct aggregate on skewed data") {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val rows = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), avg("v").as("a"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val salted = SkewAgg.saltedSumCount(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(math.abs(s - direct(k)._1) < 1e-6 && n == direct(k)._2, s"key $k")
    }
    val savg = SkewAgg.saltedAvg(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    savg.foreach { case (k, a) => assert(math.abs(a - direct(k)._3) < 1e-9, s"avg $k") }
  }

  test("phase-1 output spreads a hot key across multiple salt groups") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("hot", 1.0)).toDF("k", "v").repartition(8)
    // reach into phase 1 by replicating its salt expression cardinality:
    // the final result being correct while |phase1 rows| > 1 for the hot
    // key is what breaks the single-reducer bottleneck
    val phase1Rows = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .groupBy("k", "_salt").agg(sum("v")).count()
    assert(phase1Rows > 1, "hot key must split into multiple salt groups")
  }

  test("keyHistogram surfaces the hot key first") {
    import spark.implicits._
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i")).toDF("k")
    val top = SkewAgg.keyHistogram(df, Seq("k"), 3).collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 900)
  }
}
