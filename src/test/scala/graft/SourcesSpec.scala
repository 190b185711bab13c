package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("csv reader: explicit schema + comment prefix (NOAA raw shape)") {
    val dir = Files.createTempDirectory("csv_src")
    val f = dir.resolve("noaa.csv")
    Files.writeString(f,
      """# NOAA billion-dollar disasters
        |# source: NCEI
        |Year,Drought_Count,Drought_Cost
        |1980,1,177.1
        |1983,1,10.6
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("Year", IntegerType),
      StructField("Drought_Count", IntegerType),
      StructField("Drought_Cost", DoubleType)))
    val df = Sources.csv(spark, f.toString, schema, commentPrefix = Some("#"))
    assert(df.schema == schema)
    assert(df.count() == 2)
    assert(df.filter(org.apache.spark.sql.functions.col("Year") === 1980)
      .collect()(0).getDouble(2) == 177.1)
  }

  test("json reader: explicit schema, drift surfaces as null not type change") {
    val dir = Files.createTempDirectory("json_src")
    val f = dir.resolve("events.jsonl")
    Files.writeString(f,
      """{"event_id": 1, "event_type": "click", "value": 1.5}
        |{"event_id": 2, "event_type": "view", "value": "not-a-number"}
        |{"event_id": 3, "event_type": "click"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val df = Sources.json(spark, f.toString, schema)
    assert(df.schema == schema)
    assert(df.count() == 3)
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(2) == 1.5)
    assert(byId(2L).isNullAt(2), "type drift must surface as null")
    assert(byId(3L).isNullAt(2), "missing field must surface as null")
  }

  test("parquet sink round-trips with partition pruning layout") {
    val dir = Files.createTempDirectory("pq_sink").resolve("era5")
    Sources.saveParquet(graft.model.Fixtures.era5(spark), dir.toString,
      partitionBy = Seq("country"))
    // partitioned directories exist → reads prune by country
    assert(Files.exists(dir.resolve("country=india")))
    val back = Sources.parquet(spark, dir.toString)
    assert(back.count() == 10)
    assert(back.filter(org.apache.spark.sql.functions.col("country") === "india").count() == 5)
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    import org.apache.spark.sql.functions._
    val o = Tables(spark, sfDir, "orders")
    val c = Tables(spark, sfDir, "customer")
    Sources.saveBucketedTable(o, "orders_b", Seq("o_custkey"), 4)
    Sources.saveBucketedTable(c.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", Seq("o_custkey"), 4)
    // disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1200)}")
      // and it is still correct
      val expect = o.join(c, o("o_custkey") === c("c_custkey")).count()
      assert(joined.count() == expect)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("catalog introspection mirrors sqlite_master/PRAGMA probes") {
    graft.model.Fixtures.fema(spark).createOrReplaceTempView("fema_cat")
    assert(Sources.listTables(spark).contains("fema_cat"))
    val cols = Sources.describeTable(spark, "fema_cat")
    assert(cols.exists { case (n, t) => n == "ihp_total" && t == "double" })
    assert(Sources.tableDdl(spark, "fema_cat").contains("ihp_total DOUBLE"))
    assert(Sources.sample(spark, "fema_cat", 3).count() == 3)
  }
}
