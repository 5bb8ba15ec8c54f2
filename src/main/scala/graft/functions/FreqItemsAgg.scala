package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch: `freq_items(item, capacity, k)`
  * returns the k most frequent item strings with their counts as
  * `array<struct<item string, cnt bigint>>`, ordered (count desc,
  * item asc).
  *
  * Scale posture: the classic alternative — `groupBy(item).count()`
  * then a global top-k — shuffles one row per DISTINCT item; over a
  * 100 TB corpus the token vocabulary alone makes that a heavy
  * full-corpus aggregation when only the head of the distribution is
  * wanted. This sketch keeps an O(capacity) map per partition,
  * combines map-side, and merges sketches at the reducer — the
  * shuffle carries `capacity` entries per partition regardless of
  * data size (same `TypedImperativeAggregate` mechanism as the
  * built-in HLL sketch).
  *
  * Guarantee: every item with true frequency > N/(capacity+1) is
  * present, with count under-estimated by at most N/(capacity+1).
  * When `capacity` >= the number of distinct items, no decrements can
  * occur and the counts are EXACT (which is what lets the bench
  * corpus hold this to a DuckDB hash-match oracle; see Dedup's LSH
  * recall argument for the same pattern).
  */
case class FreqItems(
    itemExpr: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItems.Buf] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(itemExpr)
  // analysis-time contract: the item is a string (castable inputs are
  // coerced; anything else is an AnalysisException, not an executor
  // ClassCastException).
  override def inputTypes: Seq[org.apache.spark.sql.GraftColumnBridge.AbstractType] =
    Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): FreqItems.Buf = new FreqItems.Buf(capacity)

  override def update(buf: FreqItems.Buf, input: InternalRow): FreqItems.Buf = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: FreqItems.Buf, other: FreqItems.Buf): FreqItems.Buf = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: FreqItems.Buf): Any = {
    val top = buf.topK(k)
    new GenericArrayData(top.map { case (item, cnt) =>
      InternalRow(UTF8String.fromString(item), cnt)
    })
  }

  // length-prefixed UTF-8, not writeUTF: modified-UTF-8 hard-fails at
  // 65535 encoded bytes, so one pathological token would crash the
  // aggregation at shuffle time.
  override def serialize(buf: FreqItems.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.entries
    out.writeInt(entries.length)
    entries.foreach { case (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqItems.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new FreqItems.Buf(capacity)
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(new String(b, StandardCharsets.UTF_8), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItems =
    copy(itemExpr = newChildren(0))
}

object FreqItems {
  /** Misra-Gries summary: at most `capacity` (item, count) entries.
    * Merge follows Agarwal et al. ("Mergeable Summaries"): sum the two
    * maps, then subtract the (capacity+1)-th largest count from every
    * entry and drop the non-positive ones — error bounds add, the
    * summary stays O(capacity).
    */
  final class Buf(capacity: Int) {
    private val m = new java.util.HashMap[String, Long]()

    /** Single-item MG update (w=1 from update(); deserialize re-adds
      * entries of an already-capacity-bounded summary, so its puts
      * never trigger the decrement path with a fresh map).
      */
    def add(item: String, w: Long): Unit = {
      val cur = m.getOrDefault(item, 0L)
      if (cur > 0L) m.put(item, cur + w)
      else if (m.size < capacity) m.put(item, w)
      else {
        // decrement-all by min(w, smallest count); zeros evict. The
        // new item is absorbed by the same subtraction (its count w
        // minus the decrement is <= 0 whenever it doesn't win a slot).
        var minV = w
        val it0 = m.values().iterator()
        while (it0.hasNext) { val v = it0.next(); if (v < minV) minV = v }
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - minV
          if (nv <= 0L) it.remove() else e.setValue(nv)
        }
        if (w - minV > 0L) m.put(item, w - minV)
      }
    }

    def mergeFrom(other: Buf): Unit = {
      val it = other.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        m.merge(e.getKey, e.getValue, java.lang.Long.sum _)
      }
      if (m.size > capacity) {
        val counts = new Array[Long](m.size)
        var i = 0
        val vit = m.values().iterator()
        while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(counts)
        // (capacity+1)-th largest = index (size-1-capacity) ascending
        val t = counts(m.size - 1 - capacity)
        val eit = m.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val nv = e.getValue - t
          if (nv <= 0L) eit.remove() else e.setValue(nv)
        }
      }
    }

    def entries: Array[(String, Long)] = {
      val out = new Array[(String, Long)](m.size)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
      out
    }

    def topK(k: Int): Array[(String, Long)] =
      entries.sortBy { case (s, c) => (-c, s) }.take(k)
  }

  /** Column builder: `freqItems(item, capacity, k)`. */
  def freqItems(item: org.apache.spark.sql.Column, capacity: Int, k: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.toColumn(
      FreqItems(GraftColumnBridge.toExpression(item), capacity, k)
        .toAggregateExpression())
  }
}
