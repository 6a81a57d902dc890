package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * bitmap_distinct(key, domain): EXACT distinct count of an integer
 * key known to lie in [0, domain), as a custom Catalyst aggregate
 * (`TypedImperativeAggregate`) whose state is a fixed-width bitmap.
 *
 * Why not COUNT(DISTINCT): Spark plans it as an Expand + two
 * aggregates — the first shuffle carries every DISTINCT (group, key)
 * pair, which for a hot group is the data itself. The bitmap's
 * partial state is domain/8 bytes REGARDLESS of row count, merges
 * are a byte-wise OR, and the whole aggregate stays one map-side-
 * combined pass — the fixed-width cousin of a roaring bitmap, the
 * right shape whenever the key domain is bounded (enum codes, small
 * dimension ids, shard numbers).
 *
 * Out-of-domain keys fail loudly: silently dropping or clamping them
 * would return a wrong count, and the caller claimed the bound.
 */
case class BitmapDistinct(
    child: Expression,
    domain: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(domain > 0 && domain <= (1 << 30),
    s"bitmap_distinct domain must be in (0, 2^30], got $domain")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bitmap_distinct requires an integral key, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte]((domain + 7) / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Number].longValue()
      if (k < 0 || k >= domain)
        throw new IllegalArgumentException(
          s"bitmap_distinct: key $k outside declared domain [0, $domain)")
      val i = k.toInt
      buf(i >>> 3) = (buf(i >>> 3) | (1 << (i & 7))).toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += java.lang.Integer.bitCount(buf(i) & 0xff); i += 1 }
    n
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}
