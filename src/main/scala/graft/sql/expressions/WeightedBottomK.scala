package graft.sql.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Weighted sampling WITHOUT replacement in bounded state: the
  * Efraimidis–Spirakis A-Res scheme with a deterministic coin. Each
  * distinct value gets the key
  *
  *   key(v, w) = −ln(u) / w,  u = (hash56(v) + 1) / 2^56 ∈ (0, 1]
  *
  * (an Exponential(w) draw via inverse transform) and the sample is the k
  * values with the SMALLEST keys — by the exponential race property
  * (min of Exp(wᵢ) wins with probability wᵢ/Σw), exactly a weighted sample
  * without replacement. The weighted sibling of [[BottomKSample]], with
  * the same operational wins:
  *
  *   - bounded state: k (key, value, weight) triples through partial
  *     aggregation and the shuffle, whatever the group size;
  *   - deterministic and SQL-replayable (u is the md5 coin, not a seed);
  *   - MERGEABLE: the k smallest keys of a union live inside the union
  *     of per-part k smallest, and keys recompute from (value, weight),
  *     so per-source/day sample sketches roll up without rescans.
  *
  * This is THE fixed-size subsampling primitive for mixture-weighted
  * corpus selection: weight = mixture weight × quality multiplier, sample
  * exactly k documents, merge per-shard sketches.
  *
  * Ties: duplicate values contribute once, with the FIRST weight seen
  * canonically resolved as the LARGEST weight (deterministic under
  * merge order); distinct values with bit-equal keys order by value.
  * `eval` returns ARRAY&lt;STRUCT&lt;v, w&gt;&gt; in key order.
  */
case class WeightedBottomK(
    valueExpr: Expression,
    weightExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Double, String, Double)]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"k ($k) must be in [1, 2^20]")

  override def left: Expression = valueExpr
  override def right: Expression = weightExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, weightExpr.dataType) match {
      case (StringType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (v, w) => TypeCheckResult.TypeCheckFailure(
        s"weighted_bottom_k needs (STRING, DOUBLE), got (${v.catalogString}, ${w.catalogString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", StringType, nullable = false),
    StructField("w", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "weighted_bottom_k"

  override def createAggregationBuffer(): mutable.TreeSet[(Double, String, Double)] =
    mutable.TreeSet.empty[(Double, String, Double)](
      Ordering.by(e => (e._1, e._2)))

  private def add(
      buf: mutable.TreeSet[(Double, String, Double)],
      e: (Double, String, Double)): Unit = {
    // dedup by value: keep the largest-weight (= smallest-key) entry.
    // Linear scan is fine: buffers hold <= k entries and collisions are
    // rare; correctness (merge-order independence) is what matters.
    buf.find(_._2 == e._2) match {
      case Some(old) =>
        if (e._1 < old._1) { buf -= old; buf += e }
      case None =>
        if (buf.size < k) buf += e
        else if (Ordering.Tuple2[Double, String].lt((e._1, e._2),
          (buf.last._1, buf.last._2))) {
          buf += e; buf -= buf.last
        }
    }
  }

  override def update(
      buf: mutable.TreeSet[(Double, String, Double)],
      input: InternalRow): mutable.TreeSet[(Double, String, Double)] = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null) {
      val wd = w.asInstanceOf[Double]
      if (wd > 0 && !wd.isNaN && !wd.isInfinite) {
        val s = v.toString
        add(buf, (WeightedBottomK.key(s, wd), s, wd))
      }
    }
    buf
  }

  override def merge(
      buf: mutable.TreeSet[(Double, String, Double)],
      other: mutable.TreeSet[(Double, String, Double)]): mutable.TreeSet[(Double, String, Double)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[(Double, String, Double)]): Any =
    new GenericArrayData(buf.toArray.map { case (_, v, w) =>
      InternalRow(UTF8String.fromString(v), w)
    })

  override def serialize(buf: mutable.TreeSet[(Double, String, Double)]): Array[Byte] = {
    val bytes = buf.toArray.map(_._2.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 20).sum)
    bb.putInt(buf.size)
    buf.toArray.zip(bytes).foreach { case ((h, _, w), b) =>
      bb.putDouble(h); bb.putDouble(w); bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Double, String, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val h = bb.getDouble
      val w = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      s += ((h, new String(b, StandardCharsets.UTF_8), w))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedBottomK =
    copy(valueExpr = newLeft, weightExpr = newRight)
}

object WeightedBottomK {
  /** The Efraimidis–Spirakis key: −ln(u)/w with the deterministic uniform
    * u = (hash56(v)+1)/2^56 — replayable in SQL as
    * `-ln((('0x'||substr(md5(v),1,14))::BIGINT + 1) / 72057594037927936.0) / w`.
    */
  def key(v: String, w: Double): Double =
    -math.log((KMinValues.hash56(v) + 1).toDouble / 7.2057594037927936E16) / w
}
