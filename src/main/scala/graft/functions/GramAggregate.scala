package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * gram_aggregate(vec, dim, scale): EXACT second-moment statistics of a
 * vector column in one map-side-combined pass — the distributed half
 * of PCA/whitening (C81). Each coordinate quantizes to micro-units
 * (floor(x·scale + 0.5), the Projection/C58 exact-integer discipline),
 * then the state accumulates, all in Long:
 *
 *   [ G_ij (upper triangle, i ≤ j, row-major) ++ s_i (first moments)
 *     ++ n ]
 *
 * State is dim(dim+1)/2 + dim + 1 longs REGARDLESS of row count
 * (33 KiB at dim=64), merges are elementwise adds — the aggregate
 * shuffles one fixed-width buffer per partition, never vectors. From
 * (G, s, n) the driver derives the exact covariance
 * (G_ij·n − s_i·s_j)/n² in one bounded step; quantization makes every
 * value an exact integer, so a second engine replays the whole
 * distributed computation bit-for-bit (the q_pca_gram oracle).
 *
 * Overflow is fail-loud (the B55 rule): accumulation uses
 * Math.addExact/multiplyExact, so a corpus too large/hot for the
 * scale throws instead of silently wrapping — at |x| ≤ 8 and
 * scale = 10⁶ the products are ≤ 6.4·10¹³, leaving headroom for
 * ~10⁵ rows per PARTITION buffer times any partition count (partials
 * merge pairwise, each merge checked).
 */
case class GramAggregate(
    child: Expression,
    dim: Int,
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim > 0 && dim <= 1024, s"gram_aggregate dim must be in (0, 1024], got $dim")
  require(scale > 0, s"gram_aggregate scale must be > 0, got $scale")

  private val triLen = dim * (dim + 1) / 2
  private val stateLen = triLen + dim + 1

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorTypeCheck.check("gram_aggregate", Seq(child.dataType))

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](stateLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gram_aggregate: vector of ${arr.numElements()} elements, declared dim $dim")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = HashOps.microQuantize(x, scale)
        i += 1
      }
      var idx = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          buf(idx) = Math.addExact(buf(idx), Math.multiplyExact(q(i), q(j)))
          idx += 1
          j += 1
        }
        buf(triLen + i) = Math.addExact(buf(triLen + i), q(i))
        i += 1
      }
      buf(stateLen - 1) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < stateLen) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_aggregate"

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAggregate =
    copy(child = newChild)
}
