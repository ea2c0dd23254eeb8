package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a native Catalyst
  * aggregate: a depth×width table of counters where each row increments
  * one counter per sketch row at its hash position; a point query reads
  * the MINIMUM across rows, an overestimate bounded by εN with
  * probability 1−δ (ε = e/width, δ = e^−depth).
  *
  * The aggregate takes the PRE-COMPUTED position array (one position
  * per sketch row, from the same Kirsch–Mitzenmacher double hashing
  * BloomGate uses) so the hashing scheme is one shared, oracle-replayed
  * code path and the aggregate stays a pure counting kernel.
  *
  * Scale shape: like [[KmvKMins]] — state is depth·width longs
  * regardless of corpus size, update is map-side, merge is elementwise
  * add (associative + commutative, partitioning-independent by
  * construction), the shuffle carries one state per map task per
  * group. The standard way to track token/domain frequency drift at
  * corpus scale, and sketches from different shards/days merge without
  * re-scanning.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2 && width <= (1 << 24), s"width must be in [2, 2^24], got $width")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> position argument, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"$prettyName: position array has ${arr.numElements()} entries, expected depth=$depth")
      var i = 0
      while (i < depth) {
        val p = arr.getLong(i)
        require(p >= 0 && p < width,
          s"$prettyName: position $p out of [0, $width) in sketch row $i")
        buf(i * width + p.toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}
