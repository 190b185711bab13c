package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._

  test("zAddress matches a scalar Morton-interleave reference") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (14L, 81L), (255L, 255L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zAddress(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0))
    val want = cases.map { case (a, b) => ref(a, b, 8) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    // the canonical small values: (1,0)->1, (0,1)->2, (3,3)->15
    assert(ref(1, 0, 8) == 1L && ref(0, 1, 8) == 2L && ref(3, 3, 8) == 15L)
  }

  test("writeZOrdered clusters files into narrow rectangles on BOTH dimensions") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir, "events").select(col("user_id"), col("value"))
    // balanced 4-bit quantizers: user 0-14 raw; value 0-327 -> /22 -> 0-14.
    // Matching bit widths is what makes the interleave split BOTH dims —
    // with unbalanced widths the curve's high bits all come from one dim
    // and z-order degenerates to a single-column sort.
    val qa = col("user_id")
    val qb = floor(col("value") / 22.0).cast("long")
    val zDir = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    val rrDir = Files.createTempDirectory("rr").toFile.getAbsolutePath
    ZOrder.writeZOrdered(events, qa, qb, s"$zDir/t", files = 8, bits = 4)
    events.repartition(8).write.mode("overwrite").parquet(s"$rrDir/t")

    def avgUserSpread(path: String): Double = {
      val parts = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == 8, s"expected 8 files, got ${parts.length}")
      parts.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("user_id"), max("user_id")).collect()(0)
        (r.getLong(1) - r.getLong(0)).toDouble
      }.sum / parts.length
    }
    val globalSpread = 14.0
    val zSpread = avgUserSpread(s"$zDir/t")
    val rrSpread = avgUserSpread(s"$rrDir/t")
    // round-robin files each see ~all users; z-ordered files see a band
    assert(rrSpread > 0.8 * globalSpread, s"round-robin spread $rrSpread")
    assert(zSpread < 0.6 * globalSpread, s"z-ordered user spread $zSpread not narrow")
    // and the value dimension must ALSO be clustered (the point of z-order
    // vs sorting on user_id alone)
    val parts = new java.io.File(s"$zDir/t").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val valueSpread = parts.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("value"), max("value")).collect()(0)
      r.getDouble(1) - r.getDouble(0)
    }.sum / parts.length
    assert(valueSpread < 0.6 * 327.5, s"z-ordered value spread $valueSpread not narrow")
  }
}
