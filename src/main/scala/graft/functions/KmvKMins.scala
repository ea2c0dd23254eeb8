package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate: retains the k smallest DISTINCT hash values of the input
  * in UNSIGNED 64-bit order (Bar-Yossef et al. 2002; Beyer et al.
  * SIGMOD'07 — estimator D-hat = (k−1)·2^64/u_(k) once full, exact
  * retained count below k).
  *
  * Why an aggregate and not a window/sort: the sketch state is k longs,
  * so Spark plans it like any partial aggregate — per-partition update,
  * MAP-SIDE COMBINE, k-bounded shuffle rows, associative+commutative
  * merge. At 100 TB the alternative (distinct + per-group sort + rank
  * filter) sorts billions of distinct hashes per stratum to keep 256 of
  * them; this shuffles at most k longs per stratum per map task. The
  * same mergeability serves shard-level audit files: sketch each shard,
  * union, re-aggregate — no re-scan.
  *
  * Determinism: the result is the SET of k unsigned-smallest distinct
  * values — independent of row order and partitioning by construction —
  * returned sorted ascending (unsigned), so an external oracle can
  * replay it with a rank filter over distinct hashes.
  */
case class KmvKMins(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_kmins"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvKMins.UnsignedOrder)

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // TreeSet dedups; keep only the k unsigned-smallest. Skip the insert
    // outright when the set is full and v is not below the current max —
    // the common case on a full sketch, no churn.
    if (buf.size < k) { buf.add(v); () }
    else if (KmvKMins.UnsignedOrder.compare(v, buf.last()) < 0) {
      if (buf.add(v)) buf.remove(buf.last())
      ()
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
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

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKMins =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKMins =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvKMins =
    copy(child = newChildren.head)
}

object KmvKMins {
  /** Unsigned 64-bit order — hashes are uniform over the full unsigned
    * range; signed order would make the "smallest" half start at 2^63. */
  val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    new java.util.Comparator[java.lang.Long] with Serializable {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a.longValue(), b.longValue())
    }
}
