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
    assert(back.count() == 17)
    assert(back.filter(org.apache.spark.sql.functions.col("country") === "india").count() == 8)
  }

  test("compactParquet: many small files become few, data and layout survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // unpartitioned: 20 shards of a small table -> 1 file
    val flat = Files.createTempDirectory("cmp_flat").resolve("t").toString
    val df = (0 until 1000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
    df.repartition(20).write.parquet(flat)
    val (b1, a1) = Sources.compactParquet(spark, flat)
    assert(b1 == 20 && a1 == 1, s"$b1 -> $a1")
    assert(spark.read.parquet(flat).orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // partitioned: each partition directory compacts independently,
    // so partition pruning still works on the rewritten layout
    val part = Files.createTempDirectory("cmp_part").resolve("t").toString
    df.withColumn("p", col("id") % 2)
      .repartition(10).write.partitionBy("p").parquet(part)
    val (b2, a2) = Sources.compactParquet(spark, part)
    assert(b2 > 2 && a2 == 2, s"$b2 -> $a2")
    assert(Files.exists(java.nio.file.Paths.get(part, "p=0")))
    assert(spark.read.parquet(part).filter(col("p") === 1).count() == 500)
    assert(spark.read.parquet(part).count() == 1000)
    // sizing: a tiny targetBytes keeps multiple files (derived from the
    // on-disk footprint, not row counts)
    val multi = Files.createTempDirectory("cmp_multi").resolve("t").toString
    df.repartition(20).write.parquet(multi)
    val (_, a3) = Sources.compactParquet(spark, multi, targetBytes = 4096)
    assert(a3 > 1, s"expected multiple output files, got $a3")
    assert(spark.read.parquet(multi).count() == 1000)
  }

  test("compactParquet crash recovery: marker gates the delete-root path") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
    def mkData(): (java.nio.file.Path, java.nio.file.Path, java.nio.file.Path) = {
      val root = Files.createTempDirectory("cmp_rec").resolve("t")
      df.repartition(4).write.parquet(root.toString)
      (root, java.nio.file.Paths.get(root.toString + "__compact_old"),
        java.nio.file.Paths.get(root.toString + "__compact_staged"))
    }
    // 1) marker present: the stage rename finished before the crash —
    //    back is complete, root holds rewrite debris; recovery restores
    //    the original, deletes the debris, and the compaction proceeds
    val (r1, b1, m1) = mkData()
    Files.move(r1, b1)
    Files.createFile(m1)
    Files.createDirectories(r1)
    Files.write(r1.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    val (before1, after1) = Sources.compactParquet(spark, r1.toString)
    assert(before1 == 4 && after1 == 1, s"$before1 -> $after1")
    assert(spark.read.parquet(r1.toString).count() == 100)
    assert(!Files.exists(b1) && !Files.exists(m1))
    // 2) no marker, root missing: crashed in the window between the
    //    completed rename and the marker write — back renames home
    val (r2, b2, m2) = mkData()
    Files.move(r2, b2)
    val (before2, after2) = Sources.compactParquet(spark, r2.toString)
    assert(before2 == 4 && after2 == 1, s"$before2 -> $after2")
    assert(spark.read.parquet(r2.toString).count() == 100)
    assert(!Files.exists(b2) && !Files.exists(m2))
    // 3) no marker, BOTH populated: a non-atomic (copy-per-file) stage
    //    rename died mid-copy — neither side is safely deletable, so the
    //    helper must fail fast instead of destroying the unmoved half
    val (r3, b3, _) = mkData()
    Files.createDirectories(b3)
    Files.copy(r3.resolve(
      Files.list(r3).filter(_.toString.endsWith(".parquet")).findFirst.get.getFileName.toString),
      b3.resolve("part-half-moved.parquet"))
    val e = intercept[java.io.IOException](Sources.compactParquet(spark, r3.toString))
    assert(e.getMessage.contains("without a completion marker"), e.getMessage)
    assert(Files.exists(r3) && Files.exists(b3), "fail-fast must not delete either side")
  }

  test("orc sink round-trips with partitioning and pushes filters to the scan") {
    val dir = Files.createTempDirectory("orc_sink").resolve("era5")
    Sources.saveOrc(graft.model.Fixtures.era5(spark), dir.toString,
      partitionBy = Seq("country"))
    assert(Files.exists(dir.resolve("country=india")))
    val back = Sources.orc(spark, dir.toString)
    assert(back.count() == 17)
    val filtered = back.filter(org.apache.spark.sql.functions.col("value") > 1.0)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,1.0)]"),
      "ORC scan must receive the pushed predicate: " + plan.take(1200))
  }

  test("avro: distributed sink/source round-trip preserves schema, nulls, arrays, binary") {
    import org.apache.spark.sql.Row
    val dir = Files.createTempDirectory("avro_rt").resolve("events").toString
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flags", ArrayType(IntegerType, containsNull = false), nullable = true),
      StructField("payload", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, Seq(1, 2, 3), Array[Byte](1, 2)),
      Row(2L, null, null, null, null),
      Row(3L, "gamma", -0.25, Seq.empty[Int], Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    graft.sources.Avro.write(df, dir)
    val back = graft.sources.Avro.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length === 3)
    assert(got(0).getString(1) === "alpha")
    assert(got(0).getSeq[Int](3) === Seq(1, 2, 3))
    assert(got(0).getAs[Array[Byte]](4).toSeq === Seq[Byte](1, 2))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    assert(got(2).getDouble(2) === -0.25)
  }

  test("avro: reads a container written by the raw Avro API (foreign fixture)") {
    import org.apache.avro.{Schema => ASchema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = Files.createTempDirectory("avro_fix")
    val s: ASchema = SchemaBuilder.record("evt").namespace("t").fields()
      .requiredLong("event_id")
      .optionalString("kind")
      .requiredDouble("v")
      .endRecord()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
    w.create(s, dir.resolve("part-0.avro").toFile)
    (1 to 5).foreach { i =>
      val r = new GenericData.Record(s)
      r.put("event_id", i.toLong)
      r.put("kind", if (i % 2 == 0) null else s"k$i")
      r.put("v", i * 0.5)
      w.append(r)
    }
    w.close()
    val back = graft.sources.Avro.read(spark, dir.toString)
    assert(back.schema("event_id").dataType === LongType)
    assert(!back.schema("event_id").nullable)
    assert(back.schema("kind").nullable)
    assert(back.count() === 5)
    assert(back.where("kind is null").count() === 2)
    import org.apache.spark.sql.functions._
    assert(back.agg(sum(col("v"))).head.getDouble(0) === 7.5)
  }

  test("avro: schema-evolved files resolve by field NAME, not position") {
    import org.apache.avro.{Schema => ASchema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = Files.createTempDirectory("avro_evo")
    def writeOne(file: String, s: ASchema, puts: GenericData.Record => Unit): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
      w.create(s, dir.resolve(file).toFile)
      val r = new GenericData.Record(s); puts(r); w.append(r); w.close()
    }
    // probe file (alphabetically first): (id long, label string)
    val v1: ASchema = SchemaBuilder.record("evt").namespace("t").fields()
      .requiredLong("id").requiredString("label").endRecord()
    // evolved file: same fields REORDERED — positional decode would bind
    // label bytes into id; name-based resolution must realign
    val v2: ASchema = SchemaBuilder.record("evt").namespace("t").fields()
      .requiredString("label").requiredLong("id").endRecord()
    writeOne("a_first.avro", v1, r => { r.put("id", 1L); r.put("label", "one") })
    writeOne("b_evolved.avro", v2, r => { r.put("label", "two"); r.put("id", 2L) })
    val back = graft.sources.Avro.read(spark, dir.toString)
      .collect().map(r => (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("label")))).sortBy(_._1)
    assert(back.toSeq === Seq((1L, "one"), (2L, "two")))
  }

  test("avro: null-tolerant array elements ride a [null, T] union both ways") {
    import org.apache.spark.sql.Row
    val dir = Files.createTempDirectory("avro_nul").resolve("t").toString
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("xs", ArrayType(StringType, containsNull = true), nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("a", null, "c")), Row(2L, null)), 1), schema)
    graft.sources.Avro.write(df, dir)
    val back = graft.sources.Avro.read(spark, dir)
    assert(back.schema("xs").dataType ===
      ArrayType(StringType, containsNull = true))
    val got = back.collect().sortBy(_.getLong(0))
    assert(got(0).getSeq[String](1) === Seq("a", null, "c"))
    assert(got(1).isNullAt(1))
  }

  test("avro: unsupported shapes fail fast with the field named") {
    import org.apache.avro.SchemaBuilder
    val nested = SchemaBuilder.record("outer").fields()
      .name("inner").`type`(SchemaBuilder.record("inner_r").fields()
        .requiredInt("x").endRecord()).noDefault()
      .endRecord()
    val e = intercept[IllegalArgumentException] {
      graft.sources.Avro.toSparkSchema(nested)
    }
    assert(e.getMessage.contains("inner"))
    val badSpark = StructType(Seq(StructField("m",
      MapType(StringType, StringType), nullable = true)))
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.Avro.toAvroSchema(badSpark)
    }
    assert(e2.getMessage.contains("m"))
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

  /** Minimal-but-valid .xlsx built with the JDK zip writer: shared and
    * inline strings, sparse row (missing B3), long/double/string columns. */
  private def writeXlsxFixture(): String = {
    val dir = Files.createTempDirectory("xlsx_src")
    val f = dir.resolve("noaa.xlsx")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/></Types>""".stripMargin)
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>name</t></si><si><t>Year</t></si><si><t>Cost</t></si>
        |<si><r><t>Al</t></r><r><t>pha</t></r></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>1980</v></c><c r="C2"><v>3.5</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><r><t>Be</t></r><r><t>ta</t></r></is></c><c r="C3"><v>4.25</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    f.toString
  }

  test("xlsx reader: shared/inline strings, sparse cells, pandas-style inference") {
    val df = graft.sources.Xlsx.read(spark, writeXlsxFixture())
    assert(df.schema == StructType(Seq(
      StructField("name", StringType), StructField("Year", LongType),
      StructField("Cost", DoubleType))))
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("Alpha").getLong(1) == 1980L, "rich-text shared string must concatenate")
    assert(rows("Alpha").getDouble(2) == 3.5)
    assert(rows.contains("Beta"),
      "rich-text INLINE string must concatenate runs, not keep the last one")
    assert(rows("Beta").isNullAt(1), "missing cell must surface as NULL")
    assert(rows("Beta").getDouble(2) == 4.25)
  }

  test("xlsx column reference arithmetic") {
    import graft.sources.Xlsx.colIndex
    assert(colIndex("A1") == 0 && colIndex("Z9") == 25 &&
      colIndex("AA3") == 26 && colIndex("BC23") == 54)
  }

  /** NetCDF-3 classic fixture hand-assembled from the public CDF-1 spec:
    * unlimited time dim with 2 records, lat(2) x lon(3), coordinate
    * variables, and a CF-packed short t2m (scale 0.1, offset 200,
    * fill -32767). Two record variables, so the record stride is the
    * padded sum of slices (4 + 12 = 16). */
  private def writeNetCdfFixture(): String = {
    val dir = Files.createTempDirectory("nc_src")
    val f = dir.resolve("era5.nc")
    val bb = java.nio.ByteBuffer.allocate(1080)
    def name(s: String): Unit = {
      bb.putInt(s.length); bb.put(s.getBytes("UTF-8"))
      (0 until (4 - s.length % 4) % 4).foreach(_ => bb.put(0.toByte))
    }
    bb.put("CDF".getBytes("UTF-8")).put(1.toByte)
    bb.putInt(2) // numrecs
    bb.putInt(10); bb.putInt(3) // NC_DIMENSION, 3 dims
    name("time"); bb.putInt(0) // unlimited
    name("lat"); bb.putInt(2)
    name("lon"); bb.putInt(3)
    bb.putInt(0); bb.putInt(0) // no global attrs
    bb.putInt(11); bb.putInt(4) // NC_VARIABLE, 4 vars
    name("time"); bb.putInt(1); bb.putInt(0) // dims: (time)
    bb.putInt(0); bb.putInt(0) // no attrs
    bb.putInt(4); bb.putInt(4); bb.putInt(1044) // NC_INT, vsize, begin
    name("lat"); bb.putInt(1); bb.putInt(1)
    bb.putInt(0); bb.putInt(0)
    bb.putInt(5); bb.putInt(8); bb.putInt(1024) // NC_FLOAT
    name("lon"); bb.putInt(1); bb.putInt(2)
    bb.putInt(0); bb.putInt(0)
    bb.putInt(5); bb.putInt(12); bb.putInt(1032)
    name("t2m"); bb.putInt(3); bb.putInt(0); bb.putInt(1); bb.putInt(2)
    bb.putInt(12); bb.putInt(3) // NC_ATTRIBUTE, 3 attrs
    name("scale_factor"); bb.putInt(6); bb.putInt(1); bb.putDouble(0.1)
    name("add_offset"); bb.putInt(6); bb.putInt(1); bb.putDouble(200.0)
    name("_FillValue"); bb.putInt(3); bb.putInt(1)
    bb.putShort((-32767).toShort); bb.putShort(0.toShort) // value + pad
    bb.putInt(3); bb.putInt(12); bb.putInt(1048) // NC_SHORT, vsize, begin
    // fixed data
    bb.position(1024)
    bb.putFloat(10.0f).putFloat(20.0f) // lat
    bb.putFloat(0.0f).putFloat(0.5f).putFloat(1.0f) // lon
    // record section: rec = [time int][t2m 6 shorts], stride 16
    bb.putInt(100)
    Seq(1, 2, 3, 4, 5, -32767).foreach(v => bb.putShort(v.toShort))
    bb.putInt(101)
    Seq(10, 20, 30, 40, 50, 60).foreach(v => bb.putShort(v.toShort))
    Files.write(f, java.util.Arrays.copyOf(bb.array(), bb.position()))
    f.toString
  }

  test("netcdf reader: header introspection, coordinates, packing, fill masking") {
    val path = writeNetCdfFixture()
    val h = graft.sources.NetCdf.readHeader(path)
    assert(h.numRecs == 2 && h.dims.map(_.name) == Seq("time", "lat", "lon"))
    assert(h.vars.map(_.name) == Seq("time", "lat", "lon", "t2m"))
    val df = graft.sources.NetCdf.readVars(spark, path, Seq("t2m"))
    assert(df.columns.toSeq == Seq("time", "lat", "lon", "t2m"))
    assert(df.count() == 12)
    val byKey = df.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // raw 1 * 0.1 + 200 at (time=100, lat=10, lon=0)
    assert(byKey((100.0, 10.0, 0.0)) == Some(200.1))
    // second record, last cell: raw 60
    assert(byKey((101.0, 20.0, 1.0)) == Some(206.0))
    // filled cell masks to NULL
    assert(byKey((100.0, 20.0, 1.0)) == None, s"fill must mask: $byKey")
  }

  test("netcdf: readHeader on an HDF5/NetCDF-4 payload still names the conversion script") {
    // readVars dispatches HDF5 containers to the native Hdf5 reader
    // (Hdf5Spec pins that); the CDF-shaped readHeader introspection has
    // no HDF5 twin, so its targeted message must keep naming the script
    val dir = Files.createTempDirectory("nc4")
    val f = dir.resolve("era5_nc4.nc")
    Files.write(f, Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte,
      '\r'.toByte, '\n'.toByte, 0x1a.toByte, '\n'.toByte) ++ new Array[Byte](64))
    val e = intercept[IllegalArgumentException] {
      graft.sources.NetCdf.readHeader(f.toString)
    }
    assert(e.getMessage.contains("NetCDF-4/HDF5 container detected"), e.getMessage)
    assert(e.getMessage.contains("tools/convert_netcdf4.sh"), e.getMessage)
    assert(e.getMessage.contains("nccopy -k classic"), e.getMessage)
    // and the script the message names actually exists and is executable
    val script = java.nio.file.Paths.get("tools/convert_netcdf4.sh")
    assert(Files.isExecutable(script), s"$script must exist and be executable")
  }

  test("netcdf long output feeds the engine's grid pipeline shape") {
    // coordinate columns + value column == the ClimateEngine long ingest
    // layout: a bbox filter + mean works directly on the frame
    val df = graft.sources.NetCdf.readVars(spark, writeNetCdfFixture(), Seq("t2m"))
    val mean = df.filter(org.apache.spark.sql.functions.col("lat") === 10.0)
      .agg(org.apache.spark.sql.functions.avg("t2m")).collect()(0).getDouble(0)
    // lat=10 row values: recs (1,2,3)*0.1+200 and (10,20,30)*0.1+200
    assert(math.abs(mean - (Seq(1, 2, 3, 10, 20, 30).map(_ * 0.1 + 200).sum / 6)) < 1e-9)
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
