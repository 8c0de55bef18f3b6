package graft.sql.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count-Min sketch frequency aggregate as a custom Catalyst
  * `TypedImperativeAggregate` (same custom-aggregate path as
  * [[KMinValues]]): `depth × width` counters, row j incremented at bucket
  * `hash_j(value) mod width`. `eval` returns the flattened counter matrix
  * (row-major, `depth*width` longs); point estimates are the min over the
  * value's `depth` buckets ([[graft.sql.functions.cmsEstimate]]), an upper
  * bound on the true count with error ≤ N·e/width at confidence
  * 1-e^-depth (Cormode & Muthukrishnan 2005).
  *
  * Why a sketch and not a wordcount: at 100 TB the exact token→count map
  * is itself a large table; the sketch is FIXED `depth*width*8` bytes per
  * group, partial-aggregates map-side, and merges by elementwise add —
  * heavy-hitter frequency queries then never shuffle the vocabulary.
  *
  * Hashing is the house md5-56bit scheme seeded per row
  * (`md5(j + ":" + value)`) so the sketch is deterministic AND replayable
  * by the DuckDB oracle: `('0x' || substr(md5(j || ':' || v), 1, 14))::BIGINT
  * % width` reproduces every bucket (q74).
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth ($depth) must be in [1, 16]")
  require(width >= 2 && width <= (1 << 22), s"width ($width) must be in [2, 2^22]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min_sketch needs STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var j = 0
      while (j < depth) {
        buf(j * width + CountMinSketch.bucket(j, s, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
    copy(child = newChild)
}

object CountMinSketch {
  /** Bucket of `value` in sketch row `j`: 56-bit md5 of `"j:value"` mod
    * width (md5 output is non-negative in 56 bits, so `%` is safe).
    */
  def bucket(j: Int, value: String, width: Int): Int =
    (KMinValues.hash56(s"$j:$value") % width).toInt
}
