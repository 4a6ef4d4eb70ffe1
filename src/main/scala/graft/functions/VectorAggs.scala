package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `graft_vec_sum(array<double>)` — element-wise sum across the group, one
  * primitive-double buffer per group.
  *
  * This is the aggregation shape a 100 TB embedding pipeline needs: the
  * posexplode alternative (explode to (pos, x) rows, groupBy(key, pos)) puts
  * `dim×` more rows through the shuffle and hashes a two-part key per
  * element. Here the buffer is one `Array[Double]`, partial aggregation
  * combines map-side, and the shuffle carries one row per (group, dim)
  * vector. Same pattern as Spark's own HLL/percentile sketch aggregates
  * (TypedImperativeAggregate), so it composes with partial/final codegen
  * aggregation for free.
  *
  * Each element accumulates as a DOUBLE-DOUBLE (hi + compensation) pair via
  * Knuth/Møller two-sum, so the evaluated sum carries ~106 bits of
  * precision and is independent of accumulation ORDER for all practical
  * purposes. Plain `+=` would make the result depend on shuffle-block
  * arrival order at the final merge — nondeterministic run to run (and
  * across task retries), which downstream roundings then amplify into
  * visible result flips (the e13 hash-flake class). FP aggregation in a
  * distributed engine must be reassociation-stable to be reproducible;
  * the extra add/sub ops are noise next to shuffle cost.
  *
  * Ragged inputs are tolerated (buffer grows to the longest seen; missing
  * tail elements contribute 0); nulls are skipped. Empty group → null.
  * Buffer layout: interleaved [hi0, c0, hi1, c1, …].
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum requires array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def grow(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)

  /** Add `x` (+ carry `xlo`) into the dd pair at buf(i2), buf(i2+1):
    * branch-free Knuth two-sum on the high parts, low parts folded into
    * the error term, then a quick-two-sum RENORMALIZATION so the pair
    * stays canonical (|lo| ≤ ulp(hi)/2). Without the renormalize the
    * compensation term accumulates its own naive-FP error and order
    * independence degrades back to ~1 ulp of the result.
    */
  private def addAt(buf: Array[Double], i2: Int, x: Double, xlo: Double): Unit = {
    val hi = buf(i2)
    val s = hi + x
    val bv = s - hi
    val e = (hi - (s - bv)) + (x - bv) + buf(i2 + 1) + xlo
    val hi2 = s + e
    buf(i2) = hi2
    buf(i2 + 1) = e - (hi2 - s)
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = grow(buffer, 2 * n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) addAt(out, 2 * i, arr.getDouble(i), 0.0)
      i += 1
    }
    out
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    val out = grow(buffer, other.length)
    var i = 0
    while (i < other.length) {
      addAt(out, i, other(i), other(i + 1))
      i += 2
    }
    out
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null
    else {
      val out = new Array[Any](buffer.length / 2)
      var i = 0
      while (i < out.length) { out(i) = buffer(2 * i) + buffer(2 * i + 1); i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorSumAgg {
  def column(c: Column): Column = call_function("graft_vec_sum", c)
}

/** `graft_vec_min(array<long>)` — element-wise min across the group. The
  * cluster-union form of a MinHash signature: the signature of a union of
  * documents is the element-wise min of their signatures, so near-dup
  * clusters can be summarized / re-compared without touching text again.
  * Same single-buffer design as [[VectorSumAgg]].
  */
case class VectorMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_min requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_min"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def grow(buf: Array[Long], n: Int): Array[Long] = {
    if (buf.length >= n) buf
    else {
      val out = java.util.Arrays.copyOf(buf, n)
      java.util.Arrays.fill(out, buf.length, n, Long.MaxValue)
      out
    }
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = grow(buffer, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { val x = arr.getLong(i); if (x < out(i)) out(i) = x }
      i += 1
    }
    out
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    val out = grow(buffer, other.length)
    var i = 0
    while (i < other.length) { if (other(i) < out(i)) out(i) = other(i); i += 1 }
    out
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMinAgg =
    copy(child = newChild)
}

object VectorMinAgg {
  def column(c: Column): Column = call_function("graft_vec_min", c)
}
