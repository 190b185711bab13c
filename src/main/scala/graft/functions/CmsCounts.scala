package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `cms_counts(hash, weight, d, w)` — a Count-Min Sketch (Cormode &
  * Muthukrishnan 2005) as a native Catalyst aggregate: a d×w grid of
  * non-negative counters, returned row-major as `array<bigint>` of
  * length d·w. Each input adds `weight` to one counter per row r:
  * `cell(r, bucket_r(hash))`, where `bucket_r` is the shared affine
  * rehash family over the portable 60-bit hash
  * (`((a_r·(h mod P) + b_r) mod P) mod w`, P = 2³¹−1 — the same family
  * [[MinHashSignature]] uses, so the DuckDB oracle replays every bucket
  * with exact BIGINT arithmetic: a_r < 2³¹ and (h mod P) < 2³¹ keep the
  * product under 2⁶², overflow-free in both engines).
  *
  * The point-frequency estimate for x is `min_r cell(r, bucket_r(x))` —
  * never below the true total (counters only over-count on collisions)
  * and within ε·N of it (ε = e/w) with probability 1−e^{−d}. Unlike
  * `approx_count_distinct`'s HLL registers the sketch is a plain sum of
  * per-row contributions: deterministic, order-independent, and
  * oracle-checkable cell by cell.
  *
  * Scale shape — why this is an aggregate: state is a FIXED d·w-long
  * array per group (k-independent of the stream; 4×512 = 16 KiB),
  * updates are d array increments, and partial states merge by
  * element-wise ADDITION — the simplest mergeable synopsis there is.
  * Map-side combine therefore ships one fixed-size grid per
  * (mapper, group) instead of the group's token stream, and a 100 TB
  * frequency audit becomes one pass + a constant-size shuffle. The
  * `weight` child lets pre-aggregated inputs (term, count) feed the
  * sketch without replaying occurrences; per-occurrence streams pass 1.
  * Negative weights are accepted (the CM turnstile form) but the
  * min-estimate guarantee only holds for non-negative updates.
  */
case class CmsCounts(
    hashExpr: Expression,
    weightExpr: Expression,
    d: Int,
    w: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(d >= 1 && d <= 16, s"cms_counts needs 1 <= d <= 16, got $d")
  require(w >= 2, s"cms_counts needs w >= 2, got $w")
  // grid bound: d*w long counters materialize PER GROUP per task — cap
  // at 4M cells (32 MiB) so a typo'd width fails at plan time instead
  // of overflowing the Int product or attempting multi-GB buffers
  require(d.toLong * w <= (1L << 22),
    s"cms_counts grid d*w = ${d.toLong * w} exceeds ${1L << 22} cells")

  override def left: Expression = hashExpr
  override def right: Expression = weightExpr

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def nullable: Boolean = false

  // row coefficients resolved once per operator, not per update
  private lazy val as: Array[Long] = Array.tabulate(d)(CmsCounts.coeffA)
  private lazy val bs: Array[Long] = Array.tabulate(d)(CmsCounts.coeffB)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    val c = weightExpr.eval(input)
    if (h != null && c != null) {
      // floorMod: the portable hex60 hash is non-negative, but the
      // aggregate is SQL-exposed to arbitrary longs — a signed hash must
      // fold into a valid bucket, never index negatively (an oracle
      // replaying negative inputs must apply the same fold)
      val hm = java.lang.Math.floorMod(h.asInstanceOf[Long], CmsCounts.P)
      val cv = c.asInstanceOf[Long]
      var r = 0
      while (r < d) {
        buf(r * w + (((as(r) * hm + bs(r)) % CmsCounts.P) % w).toInt) += cv
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsCounts =
    copy(hashExpr = newLeft, weightExpr = newRight)

  override def prettyName: String = "cms_counts"
}

/** The affine rehash family shared by the aggregate, its streaming twin
  * ([[graft.streaming.StreamOps]]), and the DuckDB oracle (which inlines
  * the same literals — [[graft.queries.ScaleOps]] builds its coef VALUES
  * table from these methods). Seeds `CMA`/`CMB` are distinct from
  * MinHash's `A`/`B` family so the two sketches stay independent. */
object CmsCounts {
  val P: Long = 2147483647L

  // memoized: coeffA/coeffB sit on per-token hot paths (the streaming
  // twin buckets every token) and each derivation is an MD5 digest —
  // 16 rows covers the d <= 16 bound
  private val as: Array[Long] = Array.tabulate(16)(r =>
    graft.operators.PortableHash.hex60(s"CMA$r") % (P - 1) + 1)
  private val bs: Array[Long] = Array.tabulate(16)(r =>
    graft.operators.PortableHash.hex60(s"CMB$r") % P)

  def coeffA(r: Int): Long = as(r)
  def coeffB(r: Int): Long = bs(r)

  /** Driver/stream-side twin of the in-plan bucket arithmetic
    * (floorMod like the aggregate: signed hashes fold, never index
    * negatively). */
  def bucket(r: Int, hash: Long, w: Int): Int =
    (((as(r) * java.lang.Math.floorMod(hash, P) + bs(r)) % P) % w).toInt
}
