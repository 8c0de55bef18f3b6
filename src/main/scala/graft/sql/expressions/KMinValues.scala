package graft.sql.expressions

import java.nio.ByteBuffer
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** K-minimum-values (KMV) distinct-count sketch as a custom Catalyst
  * `TypedImperativeAggregate` — the engine's demonstration of the custom
  * aggregate path (partial update / merge / final eval handled by
  * Catalyst's ObjectHashAggregate, exactly like `collect_list`).
  *
  * State per group: the k smallest DISTINCT 56-bit md5 hashes of the
  * input strings — bounded at k longs regardless of group size, mergeable
  * by union+truncate (what makes it a sketch: a billion-value group still
  * ships k longs through the shuffle). `eval` returns the sorted hash
  * array; [[graft.sql.functions.kmvEstimate]] turns it into the classic
  * estimator `(k-1) * 2^56 / h_k` (exact size when fewer than k distinct
  * values were seen — the array is then the complete distinct hash set).
  *
  * md5 (not a JVM hash) keeps the sketch deterministic AND replayable by
  * the SQL oracle: DuckDB reproduces the same k minima with
  * `('0x' || substr(md5(v), 1, 14))::BIGINT` + a rank window (q67).
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"k ($k) must be in [2, 2^20]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmin_values needs STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmin_values"

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  /** Bounded insert shared by update and merge (one definition of the
    * eviction rule — the [[BottomKSample]] discipline). */
  private def add(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf += h; buf -= buf.last }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, KMinValues.hash56(v.toString))
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { s += bb.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

object KMinValues {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 14 hex nibbles (56 bits) of md5 — same layout as the SQL
    * replay `('0x' || substr(md5(v), 1, 14))::BIGINT`.
    */
  def hash56(s: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var j = 0
    while (j < 14) {
      val nibble = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xF else d(j >> 1) & 0xF
      v = (v << 4) | nibble
      j += 1
    }
    v
  }
}
