package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass exact NDV over a long key column: polars `n_unique` in an agg
  * context (crates/polars-ops/src/chunked_array/... n_unique kernels),
  * shipped as a `TypedImperativeAggregate` (SURVEY §2.11).
  *
  * Why not `countDistinct`: ONE exact distinct plans fine, but two or more
  * in the same groupBy force Catalyst's Expand — the input replicates once
  * per distinct aggregate BEFORE the first shuffle (measured 19.5 s for
  * two NDVs over 600M rows at sf100). Splitting into per-column
  * partial-distinct aggregates avoids Expand but pays one full scan and
  * one pair-shuffle per column (14.8 s). This aggregate computes ANY
  * number of exact NDVs in ONE scan: per (group, column) state is an
  * open-addressing long hash set, partial states merge as set unions, and
  * the shuffle ships each task's distinct values exactly once (the same
  * bytes the partial-distinct shape shuffles, minus the extra scans and
  * the second shuffle round) — DuckDB's grouped-distinct shape, ~10 s on
  * the same data: 2.9× of DuckDB (same-host 3.4 s), down from the Expand
  * plan's 5.2×. The residual gap is structural: typed aggregates run in
  * ObjectHashAggregate outside whole-stage codegen, so each row pays the
  * interpreted pipeline that DuckDB's fused scan-agg loop doesn't.
  *
  * Scale contract: state is O(per-task distinct values), exactly like the
  * hash table inside Spark's own partial-distinct aggregation — NOT
  * O(group size). The 100 TB recipe stays graft_approx_ndv (HLL,
  * constant state) when a few-percent error is acceptable; this is the
  * exact path. Long keys only (cast upstream) — hashing non-integral
  * types to 64 bits would make "exact" probabilistic.
  */
case class NdvAgg(child: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongSet] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ndv"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column (cast upstream), got ${t.simpleString}")
  }

  override def createAggregationBuffer(): LongSet = new LongSet()

  // The exec binds `child` to the input schema before update() runs; when
  // it's a plain column that bound form is a BoundReference, and reading
  // the long by ordinal skips one boxed java.lang.Long allocation per row
  // (1.2B allocations for two NDVs over 600M rows; measured effect at
  // sf100 is within host noise — the dominant cost is the exec's
  // non-codegen row pipeline — but allocating a billion boxes for nothing
  // is still wrong). Computed expressions fall back to eval().
  @transient private lazy val boundOrdinal: Int = child match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }

  override def update(buf: LongSet, input: InternalRow): LongSet = {
    val ord = boundOrdinal
    if (ord >= 0) {
      if (!input.isNullAt(ord)) buf.add(input.getLong(ord))
    } else {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: LongSet, other: LongSet): LongSet = {
    buf.addAll(other); buf
  }

  override def eval(buf: LongSet): Any = buf.size.toLong

  override def serialize(buf: LongSet): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): LongSet = LongSet.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(off: Int): NdvAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): NdvAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): NdvAgg =
    copy(child = cs.head)
}

/** Open-addressing (linear-probe) hash set of longs. Zero is tracked out
  * of band so the backing array's 0 can mark empty slots; capacity doubles
  * at 60% load. splitmix64 finalizer scatters sequential keys (the common
  * surrogate-key case) across slots. */
final class LongSet(initialCapacity: Int = 1 << 4) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 4))
  private var data = new Array[Long](cap)
  private var n = 0
  private var hasZero = false

  @inline private def slot(v: Long): Int = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) & (cap - 1)).toInt
  }

  def add(v: Long): Unit = {
    if (v == 0L) { if (!hasZero) { hasZero = true } }
    else {
      var i = slot(v)
      while (data(i) != 0L && data(i) != v) i = (i + 1) & (cap - 1)
      if (data(i) == 0L) {
        data(i) = v
        n += 1
        // long arithmetic: at cap=2^30 the int product cap*3 overflows and
        // the load check would misfire into a cap<<=1 → Int.MinValue array
        if (n.toLong * 5 > cap.toLong * 3) grow()
      }
    }
  }

  private def grow(): Unit = {
    // 2^30 is the largest power-of-two Int capacity; at 60% load that is
    // ~644M distinct longs PER AGGREGATION BUFFER (5+ GB of state) — far
    // past the point the documented recipe says to switch to graft_approx_ndv
    require(cap < (1 << 30),
      "graft_ndv buffer exceeded 2^30 slots (~644M distinct values in one " +
        "group on one task) — use graft_approx_ndv (HLL) at this cardinality")
    val old = data
    cap <<= 1
    data = new Array[Long](cap)
    n = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) {
        val v = old(i)
        var j = slot(v)
        while (data(j) != 0L) j = (j + 1) & (cap - 1)
        data(j) = v
        n += 1
      }
      i += 1
    }
  }

  def addAll(other: LongSet): Unit = {
    if (other.hasZero) hasZero = true
    var i = 0
    while (i < other.data.length) {
      if (other.data(i) != 0L) add(other.data(i))
      i += 1
    }
  }

  def size: Int = n + (if (hasZero) 1 else 0)

  def toBytes: Array[Byte] = {
    // long math: 8*n as Int overflows past ~268M entries; a JVM byte array
    // caps near 2 GB regardless, so fail with the remediation, not an OOM
    val bytes = 5L + 8L * n
    require(bytes <= Int.MaxValue - 16,
      s"graft_ndv partial state ($n distinct longs) exceeds the 2 GB " +
        "serialization limit — use graft_approx_ndv (HLL) at this cardinality")
    val bb = ByteBuffer.allocate(bytes.toInt)
    bb.put(if (hasZero) 1.toByte else 0.toByte)
    bb.putInt(n)
    var i = 0
    while (i < data.length) {
      if (data(i) != 0L) bb.putLong(data(i))
      i += 1
    }
    bb.array()
  }
}

object LongSet {
  def fromBytes(bytes: Array[Byte]): LongSet = {
    val bb = ByteBuffer.wrap(bytes)
    val zero = bb.get() == 1.toByte
    val n = bb.getInt
    val s = new LongSet(math.max(4, Integer.highestOneBit(n * 2)))
    if (zero) s.add(0L)
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }
}
