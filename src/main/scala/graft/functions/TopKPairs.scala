package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** `topk_pairs(score, id, k)` — per-group top-k as a native Catalyst
  * aggregate: the k best (score DESC, id ASC) pairs, returned as an
  * array of `struct<score:double, id:bigint>` in emit order.
  *
  * This is the aggregate form of the repo's most common window shape
  * (`row_number() OVER (PARTITION BY g ORDER BY s DESC, id) <= k`, q9).
  * The window form SORTS every group's full contents — at 100 TB that is
  * a shuffle of all rows followed by a spillable sort per partition, all
  * to keep k of them. The aggregate form keeps a bounded ordered set
  * (≤ k entries) per group, partially aggregates BEFORE the shuffle
  * (map-side combine ships ≤ k pairs per group per mapper), and merges
  * associatively — no full sort anywhere, state O(k) per group. Same
  * contract as [[KMinValues]]: one pass, bounded memory, mergeable.
  *
  * `id` must be unique within the group (every total-order emission in
  * this repo carries such a tiebreaker — NOTES hard-won fact on
  * lineitem's non-unique keys): the (score, id) pair is then a total
  * order and the result is deterministic under any partitioning. Null
  * score or id rows are skipped (a window's ORDER BY would sort them
  * somewhere; a top-k over ranked entities wants them out).
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k >= 1, s"topk_pairs needs k >= 1, got $k")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false

  private def cmp: Comparator[(Double, Long)] = TopKPairs.BestFirst

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](cmp)

  private def insert(buf: java.util.TreeSet[(Double, Long)], p: (Double, Long)): Unit = {
    if (buf.size < k) { buf.add(p); () }
    else if (cmp.compare(p, buf.last) < 0) {
      if (buf.add(p)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    other.forEach(p => insert(buf, p))
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p._1, p._2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(p => { bb.putDouble(p._1); bb.putLong(p._2); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(scoreExpr = newLeft, idExpr = newRight)

  override def prettyName: String = "topk_pairs"
}

object TopKPairs {
  /** Best-first: score DESC, id ASC — a TreeSet under this order keeps
    * its worst element LAST (the eviction candidate). Serializable: the
    * comparator rides inside task-serialized aggregation buffers. */
  private object BestFirst extends Comparator[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}
