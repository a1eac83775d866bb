package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values aggregate (the engine's UDAF extension point —
  * SURVEY.md §2.2 "custom Aggregator only if built-ins fall short": the KMV
  * sketch is that case). Collects the k smallest DISTINCT bigint inputs per
  * group in one pass with O(k) state per group and associative merges, so a
  * distinct-count estimate needs no pre-distinct, no window sort, and no
  * join — one map-side-combinable aggregation at any scale.
  *
  * Buffer: a bounded TreeSet (sorted, deduping); partial-merge = set union
  * then trim; result: the ascending array of survivors (≤ k values).
  */
case class KMinValues(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected bigint input, got ${child.dataType}")
    } else if (!kExpr.foldable || kExpr.dataType != org.apache.spark.sql.types.IntegerType) {
      TypeCheckResult.TypeCheckFailure("k must be an int literal")
    } else if (kExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure("k must not be null")
    } else if (k < 1) {
      TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    } else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      if (buf.add(v)) buf.pollLast()
      ()
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    other.forEach(v => insert(buf, v))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    buf.forEach { v => out(i) = v; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    buf.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object KMinValues {
  /** Column API: k smallest distinct values of `c` as a sorted array. */
  def kMinValues(c: Column, k: Int): Column =
    column(KMinValues(expression(c), Literal(k)).toAggregateExpression())
}
