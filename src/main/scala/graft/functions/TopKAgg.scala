package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Bounded-memory grouped top-k values: polars `top_k` inside an agg
  * context, shipped as a `TypedImperativeAggregate` (SURVEY §2.11 custom
  * aggregations).
  *
  * The composition alternatives both fall over at scale: a window +
  * `row_number <= k` sorts every group's full contents, and
  * `slice(sort_array(collect_list(x)), 1, k)` materializes whole groups in
  * executor memory. This aggregate keeps a k-element heap per group,
  * merges partial heaps map-side like any other partial aggregation, and
  * its state is k doubles regardless of group size — the shape that
  * survives a 10^9-row skewed group.
  *
  * Returns the k largest (descending=true) or smallest values as a sorted
  * array. Nulls are ignored (like every Spark agg); NaN sorts greatest,
  * matching Spark/DuckDB double ordering.
  */
case class TopKAgg(child: Expression, k: Int, descending: Boolean,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column (cast upstream), got ${t.simpleString}")
  }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k, descending)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = { buf.addAll(other); buf }

  override def eval(buf: TopKBuf): Any = new GenericArrayData(buf.sortedValues)

  override def serialize(buf: TopKBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuf =
    TopKBuf.fromBytes(bytes, k, descending)

  override def withNewMutableAggBufferOffset(off: Int): TopKAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKAgg =
    copy(child = cs.head)
}

/** k-bounded heap of doubles. For the k LARGEST we keep a min-heap (root =
  * weakest member, evicted first); total order is java.lang.Double.compare
  * (NaN greatest, -0.0 < 0.0) — Spark's and DuckDB's double sort order. */
final class TopKBuf(k: Int, descending: Boolean) {
  private val heap = new Array[Double](k)
  private var n = 0

  // sign-flip so the root is always the element to evict next
  @inline private def key(v: Double): Double = if (descending) v else -v
  @inline private def lt(a: Double, b: Double): Boolean =
    java.lang.Double.compare(key(a), key(b)) < 0

  def add(v: Double): Unit = {
    if (n < k) {
      heap(n) = v; n += 1
      var i = n - 1
      while (i > 0 && lt(heap(i), heap((i - 1) / 2))) {
        val p = (i - 1) / 2
        val t = heap(i); heap(i) = heap(p); heap(p) = t
        i = p
      }
    } else if (lt(heap(0), v)) {
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var s = i
        if (l < n && lt(heap(l), heap(s))) s = l
        if (r < n && lt(heap(r), heap(s))) s = r
        if (s == i) done = true
        else { val t = heap(i); heap(i) = heap(s); heap(s) = t; i = s }
      }
    }
  }

  def addAll(other: TopKBuf): Unit = {
    var i = 0
    while (i < other.n) { add(other.heap(i)); i += 1 }
  }

  /** Values best-first: descending for top-k, ascending for bottom-k. */
  def sortedValues: Array[Any] = {
    val out = java.util.Arrays.copyOf(heap, n)
    java.util.Arrays.sort(out) // ascending, Double total order
    val boxed = new Array[Any](n)
    var i = 0
    while (i < n) {
      boxed(i) = if (descending) out(n - 1 - i) else out(i)
      i += 1
    }
    boxed
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(heap(i)); i += 1 }
    bb.array()
  }
}

object TopKBuf {
  def fromBytes(bytes: Array[Byte], k: Int, descending: Boolean): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k, descending)
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }
}
