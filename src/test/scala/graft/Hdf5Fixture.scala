package graft

import java.io.ByteArrayOutputStream

/** Byte-level HDF5 fixture writers for [[graft.sources.Hdf5]] — the same
  * testing posture as the Xlsx fixture: no HDF5 library exists in this
  * container, so spec-conformant bytes are emitted directly from the
  * public HDF5 File Format Specification. Fixture 1 is the libhdf5-1.8
  * netCDF-4 shape (superblock v0, v1 object headers with a continuation
  * block, symbol-table root group, chunked+shuffle+deflate packed
  * variable, DIMENSION_LIST via global-heap object references).
  * Fixture 2 is the new-style shape (superblock v2, OHDR v2 headers,
  * compact Link-message group) plus a phony (coordinate-less) dimension.
  */
object Hdf5Fixture {

  /** Growable little-endian buffer with label-based backpatching. */
  final class Buf {
    private val out = new ByteArrayOutputStream()
    private var patches = List.empty[(Int, String)]
    private var labels = Map.empty[String, Long]

    def pos: Int = out.size()
    def mark(label: String): Unit = labels += (label -> pos.toLong)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): Unit = { u32(v); u32(v >> 32) }
    def f32(v: Float): Unit = u32(java.lang.Float.floatToIntBits(v) & 0xffffffffL)
    def f64(v: Double): Unit = u64(java.lang.Double.doubleToLongBits(v))
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def ascii(s: String): Unit = bytes(s.getBytes("US-ASCII"))
    def zeros(n: Int): Unit = (0 until n).foreach(_ => u8(0))
    def padTo8(): Unit = if (pos % 8 != 0) zeros(8 - pos % 8)
    /** 8-byte placeholder resolved to `label`'s address at the end. */
    def ref(label: String): Unit = { patches ::= (pos, label); u64(0L) }

    def result(): Array[Byte] = {
      val arr = out.toByteArray
      patches.foreach { case (p, label) =>
        val v = labels.getOrElse(label, sys.error(s"unresolved label $label"))
        var i = 0
        while (i < 8) { arr(p + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
      }
      arr
    }
  }

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  /** One header message: declared body size, writer that must emit
    * exactly that many bytes (padding added here). */
  case class Msg(tpe: Int, bodySize: Int, write: Buf => Unit) {
    def paddedSize: Int = pad8(bodySize)
    def totalV1: Int = 8 + paddedSize
    def emitV1(b: Buf): Unit = {
      b.u16(tpe); b.u16(paddedSize); b.u8(0); b.zeros(3)
      val start = b.pos
      write(b)
      require(b.pos - start == bodySize,
        s"msg type $tpe wrote ${b.pos - start}, declared $bodySize")
      b.zeros(paddedSize - bodySize)
    }
    def totalV2: Int = 4 + bodySize
    def emitV2(b: Buf): Unit = {
      b.u8(tpe); b.u16(bodySize); b.u8(0)
      val start = b.pos
      write(b)
      require(b.pos - start == bodySize,
        s"msg type $tpe wrote ${b.pos - start}, declared $bodySize")
    }
  }

  /** v1 object header: 12-byte prefix + 4 pad + message block(s). The
    * optional second message list lands in a continuation block at
    * `contLabel`. */
  private def headerV1(b: Buf, label: String, block1: Seq[Msg],
                       cont: Seq[Msg] = Nil, contLabel: String = ""): Unit = {
    b.padTo8(); b.mark(label)
    val contMsg = if (cont.isEmpty) Nil
      else Seq(Msg(0x0010, 16, bb => { bb.ref(contLabel)
        bb.u64(cont.map(_.totalV1).sum.toLong) }))
    val all = block1 ++ contMsg
    b.u8(1); b.u8(0); b.u16(all.size + cont.size); b.u32(1L)
    b.u32(all.map(_.totalV1).sum.toLong); b.zeros(4)
    all.foreach(_.emitV1(b))
  }

  private def contBlockV1(b: Buf, label: String, msgs: Seq[Msg]): Unit = {
    b.padTo8(); b.mark(label)
    msgs.foreach(_.emitV1(b))
  }

  // ---- datatype / dataspace encodings ---------------------------------

  private def dataspace(dims: Seq[Long]): Array[Byte] = {
    val t = new Buf
    t.u8(1); t.u8(dims.size); t.u8(0); t.u8(0); t.zeros(4)
    dims.foreach(t.u64)
    t.result()
  }

  private val dataspaceScalar: Array[Byte] = dataspace(Nil)

  private def dtFixed(size: Int, signed: Boolean): Array[Byte] = {
    val t = new Buf
    t.u8(0x10); t.u8(if (signed) 0x08 else 0x00); t.u8(0); t.u8(0)
    t.u32(size.toLong)
    t.u16(0); t.u16(size * 8)
    t.result()
  }

  private def dtFloat(size: Int): Array[Byte] = {
    val t = new Buf
    t.u8(0x11); t.u8(0x20) // LE, IEEE normalization
    t.u8(if (size == 4) 31 else 63); t.u8(0)
    t.u32(size.toLong)
    t.u16(0); t.u16(size * 8)
    if (size == 4) { t.u8(23); t.u8(8); t.u8(0); t.u8(23); t.u32(127L) }
    else { t.u8(52); t.u8(11); t.u8(0); t.u8(52); t.u32(1023L) }
    t.result()
  }

  private def dtString(size: Int): Array[Byte] = {
    val t = new Buf
    t.u8(0x13); t.u8(0); t.u8(0); t.u8(0); t.u32(size.toLong)
    t.result()
  }

  private def dtReference(): Array[Byte] = {
    val t = new Buf
    t.u8(0x17); t.u8(0); t.u8(0); t.u8(0); t.u32(8L)
    t.result()
  }

  private def dtVlenRef(): Array[Byte] = {
    val t = new Buf
    t.u8(0x19); t.u8(0); t.u8(0); t.u8(0); t.u32(16L)
    t.bytes(dtReference())
    t.result()
  }

  // ---- message builders ------------------------------------------------

  private def dataspaceMsg(dims: Seq[Long]): Msg = {
    val body = dataspace(dims)
    Msg(0x0001, body.length, _.bytes(body))
  }

  private def datatypeMsg(dt: Array[Byte]): Msg =
    Msg(0x0003, dt.length, _.bytes(dt))

  private def contiguousMsg(dataLabel: String, size: Long): Msg =
    Msg(0x0008, 18, b => { b.u8(3); b.u8(1); b.ref(dataLabel); b.u64(size) })

  private def chunkedMsg(btreeLabel: String, chunkDims: Seq[Int],
                         elemSize: Int): Msg =
    Msg(0x0008, 3 + 8 + 4 * (chunkDims.size + 1), b => {
      b.u8(3); b.u8(2); b.u8(chunkDims.size + 1)
      b.ref(btreeLabel)
      chunkDims.foreach(d => b.u32(d.toLong))
      b.u32(elemSize.toLong)
    })

  /** shuffle(elemSize) then deflate(level) — the netCDF-4 default. */
  private def filtersMsg(elemSize: Int): Msg =
    Msg(0x000B, 8 + 16 + 16, b => {
      b.u8(1); b.u8(2); b.zeros(6)
      b.u16(2); b.u16(0); b.u16(0); b.u16(1); b.u32(elemSize.toLong); b.u32(0L)
      b.u16(1); b.u16(0); b.u16(0); b.u16(1); b.u32(6L); b.u32(0L)
    })

  /** v1 attribute with plain (ref-free) data. */
  private def attrMsg(name: String, dt: Array[Byte], ds: Array[Byte],
                      dataSize: Int)(data: Buf => Unit): Msg = {
    val nb = name.length + 1
    val body = 8 + pad8(nb) + pad8(dt.length) + pad8(ds.length) + dataSize
    Msg(0x000C, body, b => {
      b.u8(1); b.u8(0)
      b.u16(nb); b.u16(dt.length); b.u16(ds.length)
      b.ascii(name); b.u8(0); b.zeros(pad8(nb) - nb)
      b.bytes(dt); b.zeros(pad8(dt.length) - dt.length)
      b.bytes(ds); b.zeros(pad8(ds.length) - ds.length)
      val s = b.pos
      data(b)
      require(b.pos - s == dataSize, s"attr $name data mismatch")
    })
  }

  private def strAttr(name: String, value: String): Msg =
    attrMsg(name, dtString(value.length + 1), dataspaceScalar, value.length + 1) {
      b => b.ascii(value); b.u8(0)
    }

  private def dblAttr(name: String, value: Double): Msg =
    attrMsg(name, dtFloat(8), dataspaceScalar, 8)(_.f64(value))

  private def shortAttr(name: String, value: Short): Msg =
    attrMsg(name, dtFixed(2, signed = true), dataspaceScalar, 2)(_.u16(value & 0xffff))

  /** DIMENSION_LIST: one single-ref vlen per axis, resolved through the
    * global heap collection at `gcolLabel` (object indexes 1-based). */
  private def dimListAttr(gcolLabel: String, gcolIndexes: Seq[Int]): Msg =
    attrMsg("DIMENSION_LIST", dtVlenRef(),
      dataspace(Seq(gcolIndexes.size.toLong)), 16 * gcolIndexes.size) { b =>
      gcolIndexes.foreach { gi =>
        b.u32(1L); b.ref(gcolLabel); b.u32(gi.toLong)
      }
    }

  // ---- shared data content --------------------------------------------

  val TimeVals: Seq[Double] = Seq(0.0, 1.0, 2.0)
  val LatVals: Seq[Double] = Seq(50.0, 49.75)
  val LonVals: Seq[Double] = Seq(10.0, 10.25, 10.5, 10.75)
  val T2mFill: Short = -32767
  val T2mScale = 0.01
  val T2mOffset = 250.0

  /** Raw packed shorts for t2m, row-major over (3,2,4); index 14 holds
    * the fill value. */
  val T2mRaw: Array[Short] = Array.tabulate(24) { i =>
    if (i == 14) T2mFill else (i * 10).toShort
  }

  val TpVals: Array[Float] = Array.tabulate(24)(i => i * 0.5f)

  private def shuffleDeflate(vals: Array[Short]): Array[Byte] = {
    val raw = new Array[Byte](vals.length * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      raw(i * 2) = (v & 0xff).toByte; raw(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val n = vals.length
    val shuf = new Array[Byte](raw.length)
    var j = 0
    while (j < 2) {
      var k = 0
      while (k < n) { shuf(j * n + k) = raw(k * 2 + j); k += 1 }
      j += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(shuf); d.finish()
    val outB = new ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!d.finished()) outB.write(tmp, 0, d.deflate(tmp))
    d.end()
    outB.toByteArray
  }

  // ---- fixture 1: classic netCDF-4 shape -------------------------------

  /** time(3) × latitude(2) × longitude(4); t2m short chunked (2,2,3) +
    * shuffle + deflate with CF packing and one fill hole; tp float32
    * contiguous. Both carry DIMENSION_LIST; dims are coordinate-bearing
    * dimension scales. */
  def fixture1(): Array[Byte] = {
    val b = new Buf

    // superblock v0
    b.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.u8(0); b.u8(0); b.u8(0); b.u8(0)
    b.u8(0); b.u8(8); b.u8(8); b.u8(0)
    b.u16(4); b.u16(16)
    b.u32(0L)
    b.u64(0L); b.u64(-1L); b.ref("eof"); b.u64(-1L)
    b.u64(0L); b.ref("rootHeader"); b.u32(0L); b.u32(0L); b.zeros(16)

    // root group header: symbol table message
    headerV1(b, "rootHeader", Seq(
      Msg(0x0011, 16, bb => { bb.ref("rootBtree"); bb.ref("rootHeap") })))

    // local heap with link names
    b.padTo8(); b.mark("rootHeap")
    val names = Seq("latitude", "longitude", "t2m", "time", "tp")
    val nameOffsets = scala.collection.mutable.Map[String, Long]()
    val heapData = {
      val t = new Buf
      t.u64(0L)
      names.foreach { n =>
        nameOffsets(n) = t.pos.toLong
        t.ascii(n); t.u8(0); t.padTo8()
      }
      t.result()
    }
    b.ascii("HEAP"); b.u8(0); b.zeros(3)
    b.u64(heapData.length.toLong); b.u64(-1L); b.ref("rootHeapData")
    b.padTo8(); b.mark("rootHeapData"); b.bytes(heapData)

    // group B-tree: one leaf → one SNOD
    b.padTo8(); b.mark("rootBtree")
    b.ascii("TREE"); b.u8(0); b.u8(0); b.u16(1)
    b.u64(-1L); b.u64(-1L)
    b.u64(0L); b.ref("snod"); b.u64(nameOffsets("tp"))

    b.padTo8(); b.mark("snod")
    b.ascii("SNOD"); b.u8(1); b.u8(0); b.u16(names.size)
    names.foreach { n =>
      b.u64(nameOffsets(n)); b.ref(s"hdr:$n")
      b.u32(0L); b.u32(0L); b.zeros(16)
    }

    // raw data blocks
    b.padTo8(); b.mark("data:time"); TimeVals.foreach(b.f64)
    b.padTo8(); b.mark("data:latitude"); LatVals.foreach(b.f64)
    b.padTo8(); b.mark("data:longitude"); LonVals.foreach(b.f64)
    b.padTo8(); b.mark("data:tp"); TpVals.foreach(b.f32)

    // t2m chunks: (2,2,3) over (3,2,4) → origins at time {0,2} × lon {0,3}
    def chunkShorts(o0: Int, o1: Int, o2: Int): Array[Short] = {
      val c = new Array[Short](12)
      var k = 0
      for (i0 <- 0 until 2; i1 <- 0 until 2; i2 <- 0 until 3) {
        val (g0, g1, g2) = (o0 + i0, o1 + i1, o2 + i2)
        c(k) = if (g0 < 3 && g1 < 2 && g2 < 4) T2mRaw(g0 * 8 + g1 * 4 + g2)
               else 0
        k += 1
      }
      c
    }
    val chunkOrigins = Seq((0, 0, 0), (0, 0, 3), (2, 0, 0), (2, 0, 3))
    val chunks = chunkOrigins.map { case (o0, o1, o2) =>
      (o0, o1, o2, shuffleDeflate(chunkShorts(o0, o1, o2)))
    }
    chunks.zipWithIndex.foreach { case ((_, _, _, data), i) =>
      b.padTo8(); b.mark(s"chunk:$i"); b.bytes(data)
    }
    b.padTo8(); b.mark("t2mBtree")
    b.ascii("TREE"); b.u8(1); b.u8(0); b.u16(chunks.size)
    b.u64(-1L); b.u64(-1L)
    chunks.zipWithIndex.foreach { case ((o0, o1, o2, data), i) =>
      b.u32(data.length.toLong); b.u32(0L)
      b.u64(o0.toLong); b.u64(o1.toLong); b.u64(o2.toLong); b.u64(0L)
      b.ref(s"chunk:$i")
    }
    b.u32(0L); b.u32(0L); b.u64(3L); b.u64(2L); b.u64(4L); b.u64(0L)

    // global heap: object refs 1..3 = time/latitude/longitude headers
    b.padTo8(); b.mark("gcol")
    val gcolObjs = Seq("hdr:time", "hdr:latitude", "hdr:longitude")
    b.ascii("GCOL"); b.u8(1); b.zeros(3)
    b.u64((16 + gcolObjs.size * 24).toLong)
    gcolObjs.zipWithIndex.foreach { case (label, i) =>
      b.u16(i + 1); b.u16(1); b.zeros(4); b.u64(8L); b.ref(label)
    }

    // dimension-scale headers (coordinate-bearing)
    def dimScale(name: String, len: Int): Unit =
      headerV1(b, s"hdr:$name", Seq(
        dataspaceMsg(Seq(len.toLong)),
        datatypeMsg(dtFloat(8)),
        contiguousMsg(s"data:$name", len * 8L),
        strAttr("CLASS", "DIMENSION_SCALE"),
        strAttr("NAME", name)))
    dimScale("time", 3)
    dimScale("latitude", 2)
    dimScale("longitude", 4)

    // t2m: header split across a continuation block (attrs in block 2)
    headerV1(b, "hdr:t2m",
      Seq(
        dataspaceMsg(Seq(3L, 2L, 4L)),
        datatypeMsg(dtFixed(2, signed = true)),
        chunkedMsg("t2mBtree", Seq(2, 2, 3), elemSize = 2),
        filtersMsg(elemSize = 2)),
      cont = Seq(
        dblAttr("scale_factor", T2mScale),
        dblAttr("add_offset", T2mOffset),
        shortAttr("_FillValue", T2mFill),
        strAttr("units", "K"),
        dimListAttr("gcol", Seq(1, 2, 3))),
      contLabel = "cont:t2m")
    contBlockV1(b, "cont:t2m", Seq(
      dblAttr("scale_factor", T2mScale),
      dblAttr("add_offset", T2mOffset),
      shortAttr("_FillValue", T2mFill),
      strAttr("units", "K"),
      dimListAttr("gcol", Seq(1, 2, 3))))

    // tp: contiguous float32, same dims; REFERENCE_LIST stands in for the
    // compound-typed auxiliary attributes real netCDF-4 files carry — the
    // reader must skip it without failing the dataset parse
    val dtCompound: Array[Byte] = {
      val t = new Buf
      t.u8(0x16); t.u8(1); t.u8(0); t.u8(0); t.u32(12L)
      t.result()
    }
    headerV1(b, "hdr:tp", Seq(
      dataspaceMsg(Seq(3L, 2L, 4L)),
      datatypeMsg(dtFloat(4)),
      contiguousMsg("data:tp", 24 * 4L),
      strAttr("units", "m"),
      attrMsg("REFERENCE_LIST", dtCompound, dataspace(Seq(1L)), 12)(_.zeros(12)),
      dimListAttr("gcol", Seq(1, 2, 3))))

    b.mark("eof")
    b.result()
  }

  // ---- fixture 2: new-style (superblock v2, OHDR, link messages) -------

  /** level(2, phony — no coordinate variable) × obs(3): one int32
    * contiguous variable `count` with DIMENSION_LIST, dims as pure
    * dimension scales (sentinel NAME). Exercises superblock v2, OHDR v2
    * headers, and compact link-message groups. */
  def fixture2(): Array[Byte] = {
    val b = new Buf

    // superblock v2: sig, version, sizeof off/len, flags, base, ext, eof,
    // root header, checksum
    b.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.u8(2); b.u8(8); b.u8(8); b.u8(0)
    b.u64(0L); b.u64(-1L); b.ref("eof"); b.ref("rootHeader")
    b.u32(0L) // checksum (unchecked by the reader)

    def linkMsg(name: String, target: String): Msg = {
      val nb = name.getBytes("US-ASCII")
      Msg(0x0006, 2 + 1 + nb.length + 8, bb => {
        bb.u8(1); bb.u8(0) // version, flags: 1-byte name length, hard link
        bb.u8(nb.length)
        bb.bytes(nb)
        bb.ref(s"hdr2:$target")
      })
    }

    def headerV2(label: String, msgs: Seq[Msg]): Unit = {
      b.padTo8(); b.mark(label)
      val size = msgs.map(_.totalV2).sum // message bytes only, no checksum
      b.ascii("OHDR"); b.u8(2); b.u8(1) // flags: 2-byte chunk0-size field
      b.u16(size)
      msgs.foreach(_.emitV2(b))
      b.u32(0L) // trailing gateway checksum (unchecked by the reader)
    }

    // raw data first (marks consumed by refs inside headers)
    b.padTo8(); b.mark("data2:count")
    Seq(7L, 8L, 9L, 10L, 11L, 12L).foreach(v => b.u32(v))

    // global heap for DIMENSION_LIST refs
    b.padTo8(); b.mark("gcol2")
    val objs = Seq("hdr2:level", "hdr2:obs")
    b.ascii("GCOL"); b.u8(1); b.zeros(3)
    b.u64((16 + objs.size * 24).toLong)
    objs.zipWithIndex.foreach { case (label, i) =>
      b.u16(i + 1); b.u16(1); b.zeros(4); b.u64(8L); b.ref(label)
    }

    // phony dims: dimension scales with the sentinel NAME, no real data
    def phonyDim(name: String, len: Int): Unit =
      headerV2(s"hdr2:$name", Seq(
        dataspaceMsg(Seq(len.toLong)),
        datatypeMsg(dtFloat(4)),
        Msg(0x0008, 18, bb => { bb.u8(3); bb.u8(1); bb.u64(-1L); bb.u64(0L) }),
        strAttr2("CLASS", "DIMENSION_SCALE"),
        strAttr2("NAME",
          s"This is a netCDF dimension but not a netCDF variable.  $len")))
    phonyDim("level", 2)
    phonyDim("obs", 3)

    headerV2("hdr2:count", Seq(
      dataspaceMsg(Seq(2L, 3L)),
      datatypeMsg(dtFixed(4, signed = true)),
      Msg(0x0008, 18, bb => { bb.u8(3); bb.u8(1); bb.ref("data2:count")
        bb.u64(24L) }),
      dimListAttr2("gcol2", Seq(1, 2))))

    headerV2("rootHeader", Seq(
      linkMsg("level", "level"),
      linkMsg("obs", "obs"),
      linkMsg("count", "count")))

    b.mark("eof")
    b.result()
  }

  // ---- fixture 3: dense (fractal heap) links and attributes -----------

  /** The many-variable layout: libhdf5 switches a group to DENSE link
    * storage past ~8 links, so this fixture's root group carries 12
    * links (v0..v9, a non-ASCII name, and `va`) in a fractal heap (one
    * root direct block) indexed by a depth-0 v2 B-tree; `va`
    * additionally stores its attributes densely through a second
    * heap+B-tree pair (Attribute Info message). All numbers below follow
    * the public format spec: heap IDs are 1 flag byte + 4-byte offset
    * (max heap size 32 bits) + 3-byte length (max direct block 64 KiB). */
  def fixture3(): Array[Byte] = {
    val b = new Buf
    val offsetBytes = 4 // ceil(32 bits / 8)
    val lengthBytes = 3 // min bytes for max direct block size 65536
    val heapIdLen = 1 + offsetBytes + lengthBytes

    // superblock v2
    b.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.u8(2); b.u8(8); b.u8(8); b.u8(0)
    b.u64(0L); b.u64(-1L); b.ref("eof"); b.ref("rootHeader3")
    b.u32(0L)

    def headerV2(label: String, msgs: Seq[Msg]): Unit = {
      b.padTo8(); b.mark(label)
      val size = msgs.map(_.totalV2).sum
      b.ascii("OHDR"); b.u8(2); b.u8(1) // flags: 2-byte chunk0-size field
      b.u16(size)
      msgs.foreach(_.emitV2(b))
      b.u32(0L) // trailing gateway checksum (unchecked by the reader)
    }

    // 10 ASCII-named vars + one UTF-8 name + the dense-attr var
    val varNames = (0 until 10).map(i => s"v$i") :+ "tempé" :+ "va"
    def varVals(n: String): Seq[Double] = n match {
      case "tempé" => Seq(250.5, 251.5)
      case "va" => Seq(7.0, 8.0)
      case v => val i = v.drop(1).toInt; Seq(i.toDouble, i + 0.5)
    }
    varNames.foreach { n =>
      b.padTo8(); b.mark(s"data3:$n"); varVals(n).foreach(b.f64)
    }

    // dense-attribute heap for `va`: one root direct block holding two
    // serialized v3 Attribute messages
    b.padTo8(); b.mark("ablock")
    val ablockStart = b.pos
    b.ascii("FHDB"); b.u8(0); b.ref("afrhp"); b.u32(0L) // block offset 0
    def attrBody(name: String, dt: Array[Byte], ds: Array[Byte],
                 data: Buf => Unit): Long = {
      val off = (b.pos - ablockStart).toLong
      b.u8(3); b.u8(0)
      b.u16(name.length + 1); b.u16(dt.length); b.u16(ds.length)
      b.u8(0) // name charset
      b.ascii(name); b.u8(0)
      b.bytes(dt); b.bytes(ds)
      data(b)
      off
    }
    val unitsOff = attrBody("units", dtString(2), dataspaceScalar,
      bb => { bb.ascii("K"); bb.u8(0) })
    val scaleOff = attrBody("scale_factor", dtFloat(8), dataspaceScalar,
      _.f64(0.01))
    val aBlockSize = 512L
    b.zeros((ablockStart + aBlockSize.toInt) - b.pos)

    def frhpHeader(label: String, blockLabel: String, nObj: Long,
                   blockSize: Long): Unit = {
      b.padTo8(); b.mark(label)
      b.ascii("FRHP"); b.u8(0)
      b.u16(heapIdLen); b.u16(0) // no I/O filters
      b.u8(0) // flags: no checksummed blocks
      b.u32(4096L) // max managed object size
      b.u64(0L); b.u64(-1L) // next huge id, huge btree
      b.u64(0L); b.u64(-1L) // free space, free-space manager
      b.u64(blockSize); b.u64(blockSize); b.u64(blockSize) // managed/alloc/iter
      b.u64(nObj)
      b.u64(0L); b.u64(0L); b.u64(0L); b.u64(0L) // huge/tiny sizes+counts
      b.u16(4) // table width
      b.u64(blockSize) // starting block size
      b.u64(65536L) // max direct block size
      b.u16(32) // max heap size (bits)
      b.u16(1) // starting rows in root indirect block
      b.ref(blockLabel)
      b.u16(0) // current rows: 0 → root IS a direct block
      b.u32(0L) // checksum (unchecked)
    }
    frhpHeader("afrhp", "ablock", nObj = 2L, blockSize = aBlockSize)

    def heapId(bb: Buf, off: Long): Unit = {
      bb.u8(0) // version 0, type 0 (managed)
      bb.u32(off)
      bb.u8(0); bb.u8(0); bb.u8(0) // length (unread)
    }

    // attribute-name B-tree: type 8, record = heapId + flags + corder + hash
    b.padTo8(); b.mark("abthd")
    b.ascii("BTHD"); b.u8(0); b.u8(8)
    b.u32(2048L); b.u16(heapIdLen + 1 + 4 + 4); b.u16(0) // node, record, depth
    b.u8(100); b.u8(40)
    b.ref("abtlf"); b.u16(2); b.u64(2L); b.u32(0L)
    b.padTo8(); b.mark("abtlf")
    b.ascii("BTLF"); b.u8(0); b.u8(8)
    Seq(unitsOff, scaleOff).foreach { off =>
      heapId(b, off); b.u8(0); b.u32(0L); b.u32(0L)
    }
    b.u32(0L) // checksum

    // per-var object headers (va carries the Attribute Info message)
    varNames.foreach { n =>
      val base = Seq(
        dataspaceMsg(Seq(2L)),
        datatypeMsg(dtFloat(8)),
        Msg(0x0008, 18, bb => { bb.u8(3); bb.u8(1); bb.ref(s"data3:$n")
          bb.u64(16L) }))
      val extra = if (n == "va")
        Seq(Msg(0x0015, 18, bb => { bb.u8(0); bb.u8(0)
          bb.ref("afrhp"); bb.ref("abthd") }))
      else Nil
      headerV2(s"hdr3:$n", base ++ extra)
    }

    // dense-link heap: one root direct block of serialized Link messages
    b.padTo8(); b.mark("lblock")
    val lblockStart = b.pos
    b.ascii("FHDB"); b.u8(0); b.ref("lfrhp"); b.u32(0L)
    val linkOffsets = varNames.map { n =>
      val off = (b.pos - lblockStart).toLong
      val nb = n.getBytes("UTF-8")
      b.u8(1); b.u8(0) // version, flags: 1-byte name length, hard link
      b.u8(nb.length); b.bytes(nb)
      b.ref(s"hdr3:$n")
      off
    }
    val lBlockSize = 512L
    b.zeros((lblockStart + lBlockSize.toInt) - b.pos)
    frhpHeader("lfrhp", "lblock", nObj = varNames.size.toLong,
      blockSize = lBlockSize)

    // link-name B-tree: type 5, record = hash + heapId
    b.padTo8(); b.mark("lbthd")
    b.ascii("BTHD"); b.u8(0); b.u8(5)
    b.u32(2048L); b.u16(4 + heapIdLen); b.u16(0)
    b.u8(100); b.u8(40)
    b.ref("lbtlf"); b.u16(varNames.size); b.u64(varNames.size.toLong); b.u32(0L)
    b.padTo8(); b.mark("lbtlf")
    b.ascii("BTLF"); b.u8(0); b.u8(5)
    linkOffsets.foreach { off => b.u32(0L); heapId(b, off) }
    b.u32(0L) // checksum

    // root group: Link Info message pointing at the dense storage
    headerV2("rootHeader3", Seq(
      Msg(0x0002, 18, bb => { bb.u8(0); bb.u8(0)
        bb.ref("lfrhp"); bb.ref("lbthd") })))

    b.mark("eof")
    b.result()
  }

  // ---- fixture 4: dense links through a root INDIRECT heap block --------

  /** The larger-heap variant of fixture3: the fractal heap has outgrown
    * a single direct block, so the root is an INDIRECT block (FHIB)
    * whose doubling table holds four 64-byte direct children (2 rows ×
    * width 2), and the 12 link messages spread 3-per-block — offset
    * resolution must walk the table, not assume block 0. */
  def fixture4(): Array[Byte] = {
    val b = new Buf
    val blockSize = 64L
    val nBlocks = 4

    b.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.u8(2); b.u8(8); b.u8(8); b.u8(0)
    b.u64(0L); b.u64(-1L); b.ref("eof"); b.ref("rootHeader4")
    b.u32(0L)

    def headerV2(label: String, msgs: Seq[Msg]): Unit = {
      b.padTo8(); b.mark(label)
      b.ascii("OHDR"); b.u8(2); b.u8(1)
      b.u16(msgs.map(_.totalV2).sum)
      msgs.foreach(_.emitV2(b))
      b.u32(0L)
    }

    val varNames = (0 until 12).map(i => s"w$i")
    varNames.zipWithIndex.foreach { case (n, i) =>
      b.padTo8(); b.mark(s"data4:$n"); b.f64(i * 1.5)
      headerV2(s"hdr4:$n", Seq(
        dataspaceMsg(Seq(1L)),
        datatypeMsg(dtFloat(8)),
        Msg(0x0008, 18, bb => { bb.u8(3); bb.u8(1); bb.ref(s"data4:$n")
          bb.u64(8L) })))
    }

    // four direct blocks, 3 links each; heap offsets include each
    // block's own 17-byte header (sig+ver+heapHdrAddr+4-byte offset)
    val linkOffsets = scala.collection.mutable.ArrayBuffer[Long]()
    (0 until nBlocks).foreach { blk =>
      b.padTo8(); b.mark(s"dblock:$blk")
      val start = b.pos
      val heapBase = blk * blockSize
      b.ascii("FHDB"); b.u8(0); b.ref("ifrhp"); b.u32(heapBase)
      varNames.slice(blk * 3, blk * 3 + 3).foreach { n =>
        linkOffsets += heapBase + (b.pos - start)
        val nb = n.getBytes("US-ASCII")
        b.u8(1); b.u8(0); b.u8(nb.length); b.bytes(nb)
        b.ref(s"hdr4:$n")
      }
      b.zeros((start + blockSize.toInt) - b.pos)
    }

    // root indirect block: 2 rows × width 2 of direct children
    b.padTo8(); b.mark("fhib")
    b.ascii("FHIB"); b.u8(0); b.ref("ifrhp"); b.u32(0L)
    (0 until nBlocks).foreach(blk => b.ref(s"dblock:$blk"))
    b.u32(0L) // checksum

    b.padTo8(); b.mark("ifrhp")
    b.ascii("FRHP"); b.u8(0)
    b.u16(8); b.u16(0); b.u8(0)
    b.u32(4096L)
    b.u64(0L); b.u64(-1L); b.u64(0L); b.u64(-1L)
    b.u64(blockSize * nBlocks); b.u64(blockSize * nBlocks)
    b.u64(blockSize * nBlocks); b.u64(varNames.size.toLong)
    b.u64(0L); b.u64(0L); b.u64(0L); b.u64(0L)
    b.u16(2) // table width
    b.u64(blockSize) // starting block size
    b.u64(65536L) // max direct block size
    b.u16(32); b.u16(2)
    b.ref("fhib")
    b.u16(2) // current rows: root is an indirect block
    b.u32(0L)

    b.padTo8(); b.mark("bthd4")
    b.ascii("BTHD"); b.u8(0); b.u8(5)
    b.u32(2048L); b.u16(4 + 8); b.u16(0)
    b.u8(100); b.u8(40)
    b.ref("btlf4"); b.u16(varNames.size); b.u64(varNames.size.toLong); b.u32(0L)
    b.padTo8(); b.mark("btlf4")
    b.ascii("BTLF"); b.u8(0); b.u8(5)
    linkOffsets.foreach { off =>
      b.u32(0L)
      b.u8(0); b.u32(off); b.u8(0); b.u8(0); b.u8(0)
    }
    b.u32(0L)

    headerV2("rootHeader4", Seq(
      Msg(0x0002, 18, bb => { bb.u8(0); bb.u8(0)
        bb.ref("ifrhp"); bb.ref("bthd4") })))

    b.mark("eof")
    b.result()
  }

  // ---- fixture 5: depth-1 v2 B-tree name index --------------------------

  /** The deeper-index variant: the 12 dense links' name index has
    * outgrown one leaf, so the root is an INTERNAL node (BTIN) holding
    * 2 records and 3 leaf children (3+3+4 records) — child pointers
    * carry (address, record count) with the count width derived from
    * the leaf capacity. Heap side stays a single direct block. */
  def fixture5(): Array[Byte] = {
    val b = new Buf

    b.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.u8(2); b.u8(8); b.u8(8); b.u8(0)
    b.u64(0L); b.u64(-1L); b.ref("eof"); b.ref("rootHeader5")
    b.u32(0L)

    def headerV2(label: String, msgs: Seq[Msg]): Unit = {
      b.padTo8(); b.mark(label)
      b.ascii("OHDR"); b.u8(2); b.u8(1)
      b.u16(msgs.map(_.totalV2).sum)
      msgs.foreach(_.emitV2(b))
      b.u32(0L)
    }

    val varNames = (0 until 12).map(i => s"u$i")
    varNames.zipWithIndex.foreach { case (n, i) =>
      b.padTo8(); b.mark(s"data5:$n"); b.f64(i * 2.5)
      headerV2(s"hdr5:$n", Seq(
        dataspaceMsg(Seq(1L)),
        datatypeMsg(dtFloat(8)),
        Msg(0x0008, 18, bb => { bb.u8(3); bb.u8(1); bb.ref(s"data5:$n")
          bb.u64(8L) })))
    }

    // one 512-byte direct heap block with all 12 link messages
    b.padTo8(); b.mark("hblock5")
    val hStart = b.pos
    b.ascii("FHDB"); b.u8(0); b.ref("frhp5"); b.u32(0L)
    val offs = varNames.map { n =>
      val off = (b.pos - hStart).toLong
      val nb = n.getBytes("US-ASCII")
      b.u8(1); b.u8(0); b.u8(nb.length); b.bytes(nb)
      b.ref(s"hdr5:$n")
      off
    }
    b.zeros((hStart + 512) - b.pos)
    b.padTo8(); b.mark("frhp5")
    b.ascii("FRHP"); b.u8(0)
    b.u16(8); b.u16(0); b.u8(0)
    b.u32(4096L)
    b.u64(0L); b.u64(-1L); b.u64(0L); b.u64(-1L)
    b.u64(512L); b.u64(512L); b.u64(512L); b.u64(12L)
    b.u64(0L); b.u64(0L); b.u64(0L); b.u64(0L)
    b.u16(4); b.u64(512L); b.u64(65536L)
    b.u16(32); b.u16(1); b.ref("hblock5"); b.u16(0)
    b.u32(0L)

    def record(off: Long): Unit = {
      b.u32(0L) // name hash (unread)
      b.u8(0); b.u32(off); b.u8(0); b.u8(0); b.u8(0) // managed heap ID
    }

    // leaves: [0..2], [4..6], [8..11]; internal root records: 3, 7
    val leaves = Seq(Seq(0, 1, 2), Seq(4, 5, 6), Seq(8, 9, 10, 11))
    leaves.zipWithIndex.foreach { case (idxs, li) =>
      b.padTo8(); b.mark(s"btlf5:$li")
      b.ascii("BTLF"); b.u8(0); b.u8(5)
      idxs.foreach(i => record(offs(i)))
      b.u32(0L) // checksum
    }
    b.padTo8(); b.mark("btin5")
    b.ascii("BTIN"); b.u8(0); b.u8(5)
    Seq(3, 7).foreach(i => record(offs(i)))
    // child pointers: address + 1-byte record count (leaf capacity
    // (2048-10)/12 = 169 fits one byte)
    leaves.zipWithIndex.foreach { case (idxs, li) =>
      b.ref(s"btlf5:$li"); b.u8(idxs.size)
    }
    b.u32(0L) // checksum

    b.padTo8(); b.mark("bthd5")
    b.ascii("BTHD"); b.u8(0); b.u8(5)
    b.u32(2048L); b.u16(12); b.u16(1) // node size, record size, DEPTH 1
    b.u8(100); b.u8(40)
    b.ref("btin5"); b.u16(2); b.u64(12L); b.u32(0L)

    headerV2("rootHeader5", Seq(
      Msg(0x0002, 18, bb => { bb.u8(0); bb.u8(0)
        bb.ref("frhp5"); bb.ref("bthd5") })))

    b.mark("eof")
    b.result()
  }

  // ---- fixture 6: v4 data layouts (1.10+ Single Chunk / Implicit) -------

  /** One variable `y` of shape (3,4) under a v4 chunked data-layout
    * message. Kinds: "single2" = Single Chunk index with rank-only chunk
    * dims; "single3" = the same with the v3-style rank+1 (element-size)
    * dims — the reader must accept either convention; "singleFiltered" =
    * Single Chunk of shuffled+deflated int16; "implicit" = Implicit
    * index, four unfiltered (2,3)-chunks back-to-back in row-major grid
    * order (overhang clipped). */
  def fixture6(kind: String): Array[Byte] = {
    val b = new Buf
    val shape = (3, 4)
    val useShort = kind == "singleFiltered" || kind == "fixedArrayFiltered"
    val vals = (0 until 12).map(i => if (useShort) (i * 3 - 5).toDouble
                                     else i * 1.25)

    b.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.u8(2); b.u8(8); b.u8(8); b.u8(0)
    b.u64(0L); b.u64(-1L); b.ref("eof"); b.ref("rootHeader6")
    b.u32(0L)

    def headerV2(label: String, msgs: Seq[Msg]): Unit = {
      b.padTo8(); b.mark(label)
      b.ascii("OHDR"); b.u8(2); b.u8(1)
      b.u16(msgs.map(_.totalV2).sum)
      msgs.foreach(_.emitV2(b))
      b.u32(0L)
    }

    // chunk data first (filtered size must be known before the message)
    var filteredLen = -1
    // (2,3) chunks over (3,4): grid origins row-major (0,0)(0,3)(2,0)(2,3)
    def chunkElems(g0: Int, g1: Int): Seq[Double] =
      for (i0 <- 0 until 2; i1 <- 0 until 3) yield {
        val (r, c) = (g0 * 2 + i0, g1 * 3 + i1)
        if (r < 3 && c < 4) vals(r * 4 + c) else 0.0
      }
    var faSizes = Seq.empty[Int]
    kind match {
      case "implicit" =>
        b.padTo8(); b.mark("chunks6")
        for (g0 <- 0 until 2; g1 <- 0 until 2) chunkElems(g0, g1).foreach(b.f64)
      case "singleFiltered" =>
        val raw = shuffleDeflate(vals.map(_.toInt.toShort).toArray)
        filteredLen = raw.length
        b.padTo8(); b.mark("chunks6"); b.bytes(raw)
      case "fixedArray" =>
        // REVERSED file order: the reader must follow the array's
        // addresses, not file position
        for ((g0, g1) <- Seq((1, 1), (1, 0), (0, 1), (0, 0))) {
          b.padTo8(); b.mark(s"fa6:$g0$g1")
          chunkElems(g0, g1).foreach(b.f64)
        }
      case "fixedArrayFiltered" =>
        faSizes = (for ((g0, g1) <- Seq((0, 0), (0, 1), (1, 0), (1, 1))) yield {
          val raw = shuffleDeflate(chunkElems(g0, g1).map(_.toInt.toShort).toArray)
          b.padTo8(); b.mark(s"fa6:$g0$g1"); b.bytes(raw)
          raw.length
        })
      case _ =>
        b.padTo8(); b.mark("chunks6"); vals.foreach(b.f64)
    }

    if (kind.startsWith("fixedArray")) {
      val filtered = kind == "fixedArrayFiltered"
      val entrySize = if (filtered) 16 else 8 // addr [+ size(4) + mask(4)]
      b.padTo8(); b.mark("fadb6")
      b.ascii("FADB"); b.u8(0); b.u8(if (filtered) 1 else 0); b.ref("fahd6")
      Seq((0, 0), (0, 1), (1, 0), (1, 1)).zipWithIndex.foreach { case ((g0, g1), i) =>
        b.ref(s"fa6:$g0$g1")
        if (filtered) { b.u32(faSizes(i).toLong); b.u32(0L) }
      }
      b.u32(0L) // checksum
      b.padTo8(); b.mark("fahd6")
      b.ascii("FAHD"); b.u8(0); b.u8(if (filtered) 1 else 0)
      b.u8(entrySize); b.u8(10) // page bits: 1024 entries/page → unpaged
      b.u64(4L); b.ref("fadb6"); b.u32(0L)
    }

    val dt = if (useShort) dtFixed(2, signed = true) else dtFloat(8)
    val layoutMsg = kind match {
      case "single2" => // rank-only dims, unfiltered single chunk
        Msg(0x0008, 2 + 3 + 2 + 1 + 8, bb => {
          bb.u8(4); bb.u8(2); bb.u8(0); bb.u8(2); bb.u8(1)
          bb.u8(3); bb.u8(4)
          bb.u8(1); bb.ref("chunks6")
        })
      case "single3" => // v3-style rank+1 dims (trailing element size)
        Msg(0x0008, 2 + 3 + 3 + 1 + 8, bb => {
          bb.u8(4); bb.u8(2); bb.u8(0); bb.u8(3); bb.u8(1)
          bb.u8(3); bb.u8(4); bb.u8(8)
          bb.u8(1); bb.ref("chunks6")
        })
      case "singleFiltered" => // flags bit1: filtered size + mask present
        Msg(0x0008, 2 + 3 + 2 + 1 + 12 + 8, bb => {
          bb.u8(4); bb.u8(2); bb.u8(2); bb.u8(2); bb.u8(1)
          bb.u8(3); bb.u8(4)
          bb.u8(1); bb.u64(filteredLen.toLong); bb.u32(0L)
          bb.ref("chunks6")
        })
      case "implicit" =>
        Msg(0x0008, 2 + 3 + 2 + 1 + 8, bb => {
          bb.u8(4); bb.u8(2); bb.u8(0); bb.u8(2); bb.u8(1)
          bb.u8(2); bb.u8(3)
          bb.u8(2); bb.ref("chunks6")
        })
      case "fixedArray" | "fixedArrayFiltered" =>
        Msg(0x0008, 2 + 3 + 2 + 2 + 8, bb => {
          bb.u8(4); bb.u8(2); bb.u8(0); bb.u8(2); bb.u8(1)
          bb.u8(2); bb.u8(3)
          bb.u8(3); bb.u8(10) // index type 3, page bits
          bb.ref("fahd6")
        })
      case k => sys.error(s"unknown fixture6 kind $k")
    }
    val msgs = Seq(
      dataspaceMsg(Seq(shape._1.toLong, shape._2.toLong)),
      datatypeMsg(dt), layoutMsg) ++
      (if (useShort) Seq(filtersMsg(elemSize = 2)) else Nil)
    headerV2("hdr6:y", msgs)

    headerV2("rootHeader6", Seq(
      Msg(0x0006, 2 + 1 + 1 + 8, bb => { bb.u8(1); bb.u8(0); bb.u8(1)
        bb.ascii("y"); bb.ref("hdr6:y") })))

    b.mark("eof")
    b.result()
  }

  // ---- parameterized fixture: the property-fuzz surface ----------------

  /** One 2-D variable `x`, emitted across the reader's layout grid:
    * `groupStyle` 0 = old symbol-table group under a v0 superblock
    * (v1 object headers), 1 = compact link-message group under a v2
    * superblock (OHDR), 2 = dense fractal-heap links under a v2
    * superblock; `chunk` None = contiguous, Some = chunked over that
    * grid (overhang clipped); `filtered` shuffle+deflate (int16 chunked
    * only — the netCDF pairing); `useShort` int16 vs float64 elements.
    * Values land row-major; PropertySpec asserts the parse-decode
    * round-trip returns them bit-exactly for every combination. */
  def fixtureCustom(groupStyle: Int, shape: (Int, Int),
                    chunk: Option[(Int, Int)], filtered: Boolean,
                    useShort: Boolean, vals: Seq[Double]): Array[Byte] = {
    require(vals.size == shape._1 * shape._2, "vals must fill the shape")
    require(!filtered || (useShort && chunk.isDefined),
      "filters are emitted only for chunked int16 (the netCDF pairing)")
    val b = new Buf
    val elemSize = if (useShort) 2 else 8

    // superblock (must be the first bytes)
    if (groupStyle == 0) {
      b.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.u8(0); b.u8(0); b.u8(0); b.u8(0)
      b.u8(0); b.u8(8); b.u8(8); b.u8(0)
      b.u16(4); b.u16(16)
      b.u32(0L)
      b.u64(0L); b.u64(-1L); b.ref("eof"); b.u64(-1L)
      b.u64(0L); b.ref("rootHeader"); b.u32(0L); b.u32(0L); b.zeros(16)
    } else {
      b.bytes(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.u8(2); b.u8(8); b.u8(8); b.u8(0)
      b.u64(0L); b.u64(-1L); b.ref("eof"); b.ref("rootHeader")
      b.u32(0L)
    }

    def writeElems(t: Buf, elems: Seq[Double]): Unit =
      elems.foreach(v => if (useShort) t.u16(v.toInt & 0xffff) else t.f64(v))

    // raw data: contiguous block or chunk blocks + v1 chunk B-tree
    chunk match {
      case None =>
        b.padTo8(); b.mark("data"); writeElems(b, vals)
      case Some((c0, c1)) =>
        val origins = for {
          o0 <- 0 until shape._1 by c0
          o1 <- 0 until shape._2 by c1
        } yield (o0, o1)
        val payloads = origins.zipWithIndex.map { case ((o0, o1), i) =>
          val elems = for (i0 <- 0 until c0; i1 <- 0 until c1) yield {
            val (g0, g1) = (o0 + i0, o1 + i1)
            if (g0 < shape._1 && g1 < shape._2) vals(g0 * shape._2 + g1)
            else 0.0
          }
          val raw =
            if (filtered) shuffleDeflate(elems.map(_.toInt.toShort).toArray)
            else { val t = new Buf; writeElems(t, elems); t.result() }
          b.padTo8(); b.mark(s"chunk:$i"); b.bytes(raw)
          (o0, o1, raw.length)
        }
        b.padTo8(); b.mark("chunkBtree")
        b.ascii("TREE"); b.u8(1); b.u8(0); b.u16(payloads.size)
        b.u64(-1L); b.u64(-1L)
        payloads.zipWithIndex.foreach { case ((o0, o1, len), i) =>
          b.u32(len.toLong); b.u32(0L)
          b.u64(o0.toLong); b.u64(o1.toLong); b.u64(0L)
          b.ref(s"chunk:$i")
        }
        b.u32(0L); b.u32(0L)
        b.u64(shape._1.toLong); b.u64(shape._2.toLong); b.u64(0L)
    }

    val dt = if (useShort) dtFixed(2, signed = true) else dtFloat(8)
    val layoutMsg = chunk match {
      case None => contiguousMsg("data", vals.size.toLong * elemSize)
      case Some((c0, c1)) => chunkedMsg("chunkBtree", Seq(c0, c1), elemSize)
    }
    val msgs = Seq(
      dataspaceMsg(Seq(shape._1.toLong, shape._2.toLong)),
      datatypeMsg(dt), layoutMsg) ++
      (if (filtered) Seq(filtersMsg(elemSize = 2)) else Nil)

    def headerV2(label: String, hm: Seq[Msg]): Unit = {
      b.padTo8(); b.mark(label)
      b.ascii("OHDR"); b.u8(2); b.u8(1)
      b.u16(hm.map(_.totalV2).sum)
      hm.foreach(_.emitV2(b))
      b.u32(0L)
    }

    groupStyle match {
      case 0 =>
        headerV1(b, "hdr:x", msgs)
        // root: symbol-table message → local heap + v1 B-tree + SNOD
        headerV1(b, "rootHeader", Seq(
          Msg(0x0011, 16, bb => { bb.ref("rootBtree"); bb.ref("rootHeap") })))
        val heapData = { val t = new Buf; t.u64(0L); t.ascii("x"); t.u8(0)
          t.padTo8(); t.result() }
        val nameOff = 8L
        b.padTo8(); b.mark("rootHeap")
        b.ascii("HEAP"); b.u8(0); b.zeros(3)
        b.u64(heapData.length.toLong); b.u64(-1L); b.ref("rootHeapData")
        b.padTo8(); b.mark("rootHeapData"); b.bytes(heapData)
        b.padTo8(); b.mark("rootBtree")
        b.ascii("TREE"); b.u8(0); b.u8(0); b.u16(1)
        b.u64(-1L); b.u64(-1L)
        b.u64(0L); b.ref("snod"); b.u64(nameOff)
        b.padTo8(); b.mark("snod")
        b.ascii("SNOD"); b.u8(1); b.u8(0); b.u16(1)
        b.u64(nameOff); b.ref("hdr:x"); b.u32(0L); b.u32(0L); b.zeros(16)
      case 1 =>
        headerV2("hdr:x", msgs)
        headerV2("rootHeader", Seq(
          Msg(0x0006, 2 + 1 + 1 + 8, bb => { bb.u8(1); bb.u8(0); bb.u8(1)
            bb.ascii("x"); bb.ref("hdr:x") })))
      case 2 =>
        headerV2("hdr:x", msgs)
        // dense storage: 1 link message in a root direct block + a
        // depth-0 type-5 B-tree (same parameters as fixture3)
        b.padTo8(); b.mark("lblock")
        val lblockStart = b.pos
        b.ascii("FHDB"); b.u8(0); b.ref("lfrhp"); b.u32(0L)
        val linkOff = (b.pos - lblockStart).toLong
        b.u8(1); b.u8(0); b.u8(1); b.ascii("x"); b.ref("hdr:x")
        b.zeros((lblockStart + 256) - b.pos)
        b.padTo8(); b.mark("lfrhp")
        b.ascii("FRHP"); b.u8(0)
        b.u16(8); b.u16(0); b.u8(0)
        b.u32(4096L)
        b.u64(0L); b.u64(-1L); b.u64(0L); b.u64(-1L)
        b.u64(256L); b.u64(256L); b.u64(256L); b.u64(1L)
        b.u64(0L); b.u64(0L); b.u64(0L); b.u64(0L)
        b.u16(4); b.u64(256L); b.u64(65536L)
        b.u16(32); b.u16(1); b.ref("lblock"); b.u16(0)
        b.u32(0L)
        b.padTo8(); b.mark("lbthd")
        b.ascii("BTHD"); b.u8(0); b.u8(5)
        b.u32(2048L); b.u16(4 + 8); b.u16(0)
        b.u8(100); b.u8(40)
        b.ref("lbtlf"); b.u16(1); b.u64(1L); b.u32(0L)
        b.padTo8(); b.mark("lbtlf")
        b.ascii("BTLF"); b.u8(0); b.u8(5)
        b.u32(0L); b.u8(0); b.u32(linkOff); b.u8(0); b.u8(0); b.u8(0)
        b.u32(0L)
        headerV2("rootHeader", Seq(
          Msg(0x0002, 18, bb => { bb.u8(0); bb.u8(0)
            bb.ref("lfrhp"); bb.ref("lbthd") })))
      case s => sys.error(s"unknown group style $s")
    }

    b.mark("eof")
    b.result()
  }

  /** v3 attribute (unpadded name/dt/ds) for the OHDR fixture. */
  private def attr2(name: String, dt: Array[Byte], ds: Array[Byte],
                    dataSize: Int)(data: Buf => Unit): Msg = {
    val nb = name.length + 1
    Msg(0x000C, 9 + nb + dt.length + ds.length + dataSize, b => {
      b.u8(3); b.u8(0)
      b.u16(nb); b.u16(dt.length); b.u16(ds.length)
      b.u8(0) // name charset: ASCII
      b.ascii(name); b.u8(0)
      b.bytes(dt); b.bytes(ds)
      val s = b.pos
      data(b)
      require(b.pos - s == dataSize, s"attr $name data mismatch")
    })
  }

  private def strAttr2(name: String, value: String): Msg =
    attr2(name, dtString(value.length + 1), dataspaceScalar, value.length + 1) {
      b => b.ascii(value); b.u8(0)
    }

  private def dimListAttr2(gcolLabel: String, gcolIndexes: Seq[Int]): Msg =
    attr2("DIMENSION_LIST", dtVlenRef(),
      dataspace(Seq(gcolIndexes.size.toLong)), 16 * gcolIndexes.size) { b =>
      gcolIndexes.foreach { gi =>
        b.u32(1L); b.ref(gcolLabel); b.u32(gi.toLong)
      }
    }
}
