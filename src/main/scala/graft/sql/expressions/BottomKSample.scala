package graft.sql.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k uniform sample: the k DISTINCT input values with the smallest
  * 56-bit md5 hashes, as a custom `TypedImperativeAggregate` — a
  * deterministic uniform random sample WITHOUT replacement of each group's
  * distinct values, in bounded state.
  *
  * The hash-order trick makes this the sampling sibling of [[KMinValues]]
  * (which keeps only the hashes, for cardinality): because md5 imposes a
  * fixed pseudo-random total order on values, "k smallest hashes" IS a
  * uniform sample, and it is MERGEABLE — the k smallest of a union are
  * contained in the union of each part's k smallest, so per-source/per-day
  * sample sketches roll up to any coarser scope without rescanning rows
  * (the property a one-shot `TABLESAMPLE` or rand()-filter sample lacks:
  * those cannot be combined later without bias). Duplicate rows of a value
  * hash identically, so group size and row duplication never bias
  * membership; the sample is over the group's distinct-value set.
  *
  * State: a TreeSet of at most k (hash, value) pairs — fixed-size through
  * partial aggregation and the shuffle regardless of group size. `eval`
  * returns the values in hash order (a uniformly-shuffled order, handy for
  * "first m of the sample" sub-sampling). SQL-replayable: the oracle
  * reproduces membership with `('0x' || substr(md5(v), 1, 14))::BIGINT`
  * and a rank window (same scheme as [[KMinValues]]).
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, String)]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"k ($k) must be in [1, 2^20]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottom_k_sample needs STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): mutable.TreeSet[(Long, String)] =
    mutable.TreeSet.empty[(Long, String)]

  private def add(buf: mutable.TreeSet[(Long, String)], e: (Long, String)): Unit = {
    if (buf.size < k) buf += e
    else if (Ordering[(Long, String)].lt(e, buf.last) && !buf.contains(e)) {
      buf += e; buf -= buf.last
    }
  }

  override def update(
      buf: mutable.TreeSet[(Long, String)], input: InternalRow): mutable.TreeSet[(Long, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      add(buf, (KMinValues.hash56(s), s))
    }
    buf
  }

  override def merge(
      buf: mutable.TreeSet[(Long, String)],
      other: mutable.TreeSet[(Long, String)]): mutable.TreeSet[(Long, String)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[(Long, String)]): Any =
    new GenericArrayData(buf.toArray.map(e => UTF8String.fromString(e._2)))

  override def serialize(buf: mutable.TreeSet[(Long, String)]): Array[Byte] = {
    val bytes = buf.toArray.map(_._2.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(buf.size)
    buf.toArray.zip(bytes).foreach { case ((h, _), b) =>
      bb.putLong(h); bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.TreeSet.empty[(Long, String)]
    var i = 0
    while (i < n) {
      val h = bb.getLong
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      s += ((h, new String(b, StandardCharsets.UTF_8)))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKSample =
    copy(child = newChild)
}
