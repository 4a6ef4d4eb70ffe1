package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_freq_items(item, k)` — approximate top-k frequent items in one
  * pass with bounded memory (SpaceSaving/Misra-Gries family, batched
  * eviction). The 100 TB shape of "most frequent tokens/domains/n-grams":
  * an exact groupBy needs shuffle + memory proportional to the vocabulary;
  * this summary is O(k) per partition, merges associatively map-side, and
  * guarantees `true <= est <= true + err` per emitted item; items far above
  * the N/capacity noise floor survive eviction (capacity = 8k monitors).
  *
  * Output is `array<struct<item, est, err>>` ordered by (est desc, item).
  * Estimates depend on partition merge order at the margin, so queries over
  * it use the driver's rows-only check (like the HLL/quantile sketches).
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqItemsAgg.Summary]
    with UnaryLike[Expression] {

  import FreqItemsAgg._

  private val capacity = 8 * k

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_items requires a string item, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType),
    StructField("err", LongType))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): Summary = new Summary(0L, mutable.HashMap.empty)

  override def update(buffer: Summary, input: InternalRow): Summary = {
    val v = child.eval(input)
    if (v == null) return buffer
    val item = v.asInstanceOf[UTF8String].toString
    buffer.counts.get(item) match {
      case Some((c, e)) => buffer.counts.update(item, (c + 1, e))
      case None         => buffer.counts.update(item, (buffer.base + 1, buffer.base))
    }
    prune(buffer, capacity)
    buffer
  }

  override def merge(a: Summary, b: Summary): Summary = {
    // Standard summary merge: an item absent from one side is counted at
    // most that side's base, which goes into both estimate and error.
    val out = new Summary(a.base + b.base, mutable.HashMap.empty)
    for ((item, (c, e)) <- a.counts) {
      val (bc, be) = b.counts.getOrElse(item, (b.base, b.base))
      out.counts.update(item, (c + bc, e + be))
    }
    for ((item, (c, e)) <- b.counts if !a.counts.contains(item)) {
      out.counts.update(item, (c + a.base, e + a.base))
    }
    prune(out, capacity)
    out
  }

  override def eval(buffer: Summary): Any = {
    val top = buffer.counts.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e)
      }
    new GenericArrayData(top)
  }

  override def serialize(buffer: Summary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buffer.base)
    out.writeInt(buffer.counts.size)
    for ((item, (c, e)) <- buffer.counts) {
      out.writeUTF(item); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Summary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val base = in.readLong()
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) { m.update(in.readUTF(), (in.readLong(), in.readLong())); i += 1 }
    new Summary(base, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

object FreqItemsAgg {
  /** base = the count floor any evicted item may have reached; new items
    * enter at base+1 with err=base (they may have been evicted before).
    */
  final class Summary(var base: Long, val counts: mutable.HashMap[String, (Long, Long)])

  /** Batched eviction: amortized O(log n) per insert instead of a per-insert
    * min scan. When the map doubles past capacity, drop everything at or
    * below the capacity-th count and raise the base to that watermark.
    */
  private def prune(s: Summary, capacity: Int): Unit = {
    if (s.counts.size >= 2 * capacity) {
      val sorted = s.counts.toSeq.sortBy { case (_, (c, _)) => -c }
      val watermark = sorted(capacity - 1)._2._1
      val kept = sorted.takeWhile { case (_, (c, _)) => c > watermark }
      val keep = if (kept.isEmpty) sorted.take(capacity) else kept
      s.counts.clear()
      s.counts ++= keep
      s.base = math.max(s.base, watermark)
    }
  }

  def column(c: Column, k: Int): Column =
    call_function("graft_freq_items", c, lit(k))
}
