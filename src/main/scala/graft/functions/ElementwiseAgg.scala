package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Element-wise aggregate over fixed-width `array<long>` columns: the
  * reduction MinHash/SimHash actually need — `sig[i] = min(h_i)` /
  * `bits[i] = Σ ±1` across a group — as ONE aggregate expression instead
  * of `k` separate `min(...)`/`sum(...)` columns. With k=64 the
  * k-column form forces codegen of 64 aggregate slots and a 64-column
  * shuffle row; this buffers a single primitive `Array[Long]`
  * (16 B header + 8k bytes), supports partial aggregation
  * (ObjectHashAggregate map-side combine), and serializes compactly for
  * the shuffle — the layout that survives a 100 TB corpus.
  *
  * Rows where the child array is null or shorter than `n` contribute
  * only their present elements (missing tail = identity element).
  */
case class ElementwiseLongAgg(
    child: Expression,
    n: Int,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(n > 0, s"ElementwiseLongAgg needs n > 0, got $n")

  private def identityElem: Long = if (isMin) Long.MaxValue else 0L

  override def createAggregationBuffer(): Array[Long] = Array.fill(n)(identityElem)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = math.min(n, arr.numElements())
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          val x = arr.getLong(i)
          if (isMin) { if (x < buf(i)) buf(i) = x } else buf(i) += x
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) {
      if (isMin) { if (b2(i) < b1(i)) b1(i) = b2(i) } else b1(i) += b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): ElementwiseLongAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ElementwiseLongAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ElementwiseLongAgg =
    copy(child = newChild)
}

/** Element-wise `sum` over fixed-width `array<double>` columns — the
  * vector-sum reduction of k-means centroid updates, one aggregate
  * expression and one primitive buffer instead of a posexplode +
  * per-dimension groupBy (which shuffles rows × dim). Same
  * partial-aggregation/serialization story as [[ElementwiseLongAgg]].
  * Short/null inputs contribute only their present elements.
  */
case class ElementwiseDoubleSumAgg(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  require(n > 0, s"ElementwiseDoubleSumAgg needs n > 0, got $n")

  override def createAggregationBuffer(): Array[Double] = new Array[Double](n)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = math.min(n, arr.numElements())
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) buf(i) += arr.getDouble(i)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < n) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    var i = 0
    while (i < n) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): ElementwiseDoubleSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ElementwiseDoubleSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ElementwiseDoubleSumAgg =
    copy(child = newChild)
}

object ElementwiseAgg {
  /** `min` per array position across the group (MinHash signature agg).
    *
    * CONTRACT: a position never populated by any row (all child arrays
    * null or shorter than `n`) keeps the `Long.MaxValue` identity — the
    * result is not nullable, so a degenerate group is indistinguishable
    * from one whose true min is MaxValue. Callers must guarantee ≥1
    * full-width, non-null array per group ([[Dedup.minhashSignatures]]
    * does: every row it aggregates is a k-wide [[MinhashHashes]]
    * output). */
  def elementwiseMin(c: Column, n: Int): Column =
    ColumnBridge.column(
      ElementwiseLongAgg(ColumnBridge.expression(c), n, isMin = true)
        .toAggregateExpression())

  /** `sum` per array position across the group (SimHash bit-vote agg).
    * Never-populated positions keep the `0` identity (see
    * [[elementwiseMin]]'s contract note — for a sum the identity is the
    * natural "no contributions" value, so this is benign). */
  def elementwiseSum(c: Column, n: Int): Column =
    ColumnBridge.column(
      ElementwiseLongAgg(ColumnBridge.expression(c), n, isMin = false)
        .toAggregateExpression())

  /** `sum` per array position across the group, double-valued (k-means
    * centroid accumulation). */
  def elementwiseDoubleSum(c: Column, n: Int): Column =
    ColumnBridge.column(
      ElementwiseDoubleSumAgg(ColumnBridge.expression(c), n)
        .toAggregateExpression())
}
