package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `kmin_values(hash, k)` — the K-minimum-values (KMV) distinct-count
  * sketch as a native Catalyst aggregate: the k smallest DISTINCT values
  * of a 64-bit hash column, returned as an ascending array.
  *
  * This is the sketch the repo's approx-distinct story was missing:
  * unlike HLL/`approx_count_distinct` (engine-private register layouts,
  * not oracle-checkable), the KMV synopsis is a pure ORDER STATISTIC of
  * the hash stream — deterministic given the hash function, so a DuckDB
  * oracle replays it exactly with a `row_number() <= k` window over the
  * same [[graft.operators.PortableHash]] md5-derived values, and the
  * estimator `(k-1) * 2^60 / h_k` (Bar-Yossef et al. 2002) is plain
  * IEEE arithmetic both engines compute identically.
  *
  * Scale shape — the reason this is an aggregate and not a window: the
  * aggregation state is a bounded sorted set (≤ k longs, k is a literal),
  * updates are O(log k) with an O(1) reject fast-path once the set is
  * full (any value ≥ the current k-th minimum can't enter), and partial
  * states MERGE (set union, re-truncated to k) — so map-side combine
  * ships at most k longs per group per mapper instead of the group's
  * whole value stream, and no node ever sorts a group's full distinct
  * set (the `row_number` formulation the oracle uses would). That is the
  * textbook mergeable-synopsis contract (one pass, bounded memory,
  * associative merge) that makes the sketch serve 100 TB group-bys.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"kmin_values needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      // full set: v displaces the current maximum unless already present
      if (buf.add(v)) { buf.pollLast(); () }
    }
    // v >= current k-th minimum: O(1) reject — the steady-state path
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(v => insert(buf, v))
    buf
  }

  /** Ascending array of the kept minima (size < k iff the group had
    * fewer than k distinct values — the sketch then IS the exact set). */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)

  override def prettyName: String = "kmin_values"
}
