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

  test("catalog introspection mirrors sqlite_master/PRAGMA probes") {
    graft.model.Fixtures.fema(spark).createOrReplaceTempView("fema_cat")
    assert(Sources.listTables(spark).contains("fema_cat"))
    val cols = Sources.describeTable(spark, "fema_cat")
    assert(cols.exists { case (n, t) => n == "ihp_total" && t == "double" })
    assert(Sources.tableDdl(spark, "fema_cat").contains("ihp_total DOUBLE"))
    assert(Sources.sample(spark, "fema_cat", 3).count() == 3)
  }
}
