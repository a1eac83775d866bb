package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS 2012) as a bounded
  * one-pass aggregate: at most `k` (item, weight) counters per buffer,
  * associative merges, O(k) state at every stage of the aggregation tree.
  *
  * Guarantees (the reason this is THE candidate generator for exact heavy
  * hitters at 100 TB): for true frequency f(x) over N total items,
  *   f(x) − N/(k+1)  ≤  est(x)  ≤  f(x),
  * and the bound survives arbitrary merge trees (the PODS-2012 result), so
  * every item with f(x) > N/(k+1) is guaranteed present in the final
  * summary no matter how the data was partitioned. The ESTIMATES are
  * partition-order-dependent (two runs may report different counters), so
  * callers must treat the summary as a CANDIDATE SET and recount exactly —
  * see [[graft.operators.Sketches.heavyHitters]], whose final output is
  * provably identical to the exact GROUP BY it replaces while never
  * holding more than k counters per task.
  *
  *  - update: present → +1; room → insert at 1; full → decrement ALL
  *    counters by 1 and drop zeros (the arriving item's implicit +1 is
  *    consumed by the same decrement — classic MG). The O(k) decrement
  *    walk is the textbook form; k here is ≤ a few hundred, so the walk
  *    is a bounded constant per evicting row.
  *  - merge: sum counterparts, then if over capacity subtract the
  *    (k+1)-th largest weight from every counter and drop non-positives
  *    (Agarwal et al. §3.1 — exactly the cross-partition step that makes
  *    the bound hold under Spark's partial/final aggregation).
  */
case class MisraGries(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"expected string input, got ${child.dataType}")
    } else if (!kExpr.foldable || kExpr.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure("k must be an int literal")
    } else if (kExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure("k must not be null")
    } else if (k < 1) {
      TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    } else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Decrement every counter by `by`, dropping non-positive survivors. */
  private def decrementAll(buf: java.util.HashMap[String, Long],
      by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv > 0L) e.setValue(nv) else it.remove()
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = {
    other.forEach { (s, w) =>
      val cur = buf.get(s)
      buf.put(s, (if (buf.containsKey(s)) cur else 0L) + w)
    }
    if (buf.size > k) {
      // (k+1)-th largest weight (0-indexed k after descending sort)
      val ws = new Array[Long](buf.size)
      var i = 0
      buf.values().forEach { w => ws(i) = w; i += 1 }
      java.util.Arrays.sort(ws)
      val cut = ws(ws.length - 1 - k)
      decrementAll(buf, cut)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // lexicographic key order: the emitted map literal is deterministic
    // GIVEN the buffer contents (the contents themselves are candidate-set
    // semantics — see the class doc)
    val keys = new Array[String](buf.size)
    var i = 0
    val kit = buf.keySet().iterator()
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    val ks = new Array[Any](keys.length)
    val vs = new Array[Any](keys.length)
    i = 0
    while (i < keys.length) {
      ks(i) = UTF8String.fromString(keys(i))
      vs(i) = buf.get(keys(i))
      i += 1
    }
    ArrayBasedMapData(ks, vs)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    buf.forEach { (s, w) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      entries.add((b, w))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size())
    entries.forEach { case (b, w) =>
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(w)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object MisraGries {
  /** Column API: bounded frequent-items summary of `c` as
    * map<string, bigint> (candidate set + order-dependent estimates — see
    * class doc for why only the KEY SET is deterministic).
    */
  def misraGries(c: Column, k: Int): Column =
    column(MisraGries(expression(c), Literal(k)).toAggregateExpression())
}
