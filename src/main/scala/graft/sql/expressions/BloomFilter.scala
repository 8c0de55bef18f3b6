package graft.sql.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}

/** Bloom-filter membership aggregate: `numBits` bits as packed longs, each
  * value setting `numHashes` bits via Kirsch–Mitzenmacher double hashing
  * (`pos_i = h1 + i·h2 mod numBits` from one 56-bit md5 — one digest per
  * value, not one per probe).
  *
  * This is the build side of the classic runtime-filter join pattern
  * ([[graft.sql.BloomJoin]]): the filter is FIXED `numBits/8` bytes of
  * mergeable state no matter how many keys feed it, partial-aggregates
  * map-side (merge = bitwise OR), and the finished filter is a bounded
  * driver statistic that prunes the probe side BEFORE its shuffle — the
  * same shape Spark's own InjectRuntimeFilter inserts, here available as an
  * explicit operator with a verification join on top.
  *
  * No false negatives by construction; false-positive rate ≈
  * (1 - e^(-kn/m))^k — size `numBits` ≳ 10× the expected build-key count
  * for ~1% FPR at numHashes=5.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 27),
    s"numBits ($numBits) must be a positive multiple of 64, at most 2^27")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes ($numHashes) must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_filter needs STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_filter"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilterOps.set(buf, v.toString, numBits, numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** `might_contain(filterWords, key)`: probe-side bit test against a
  * [[BloomFilterAgg]] result (typically a broadcast/foldable literal).
  * True ⇒ maybe present (verify exactly downstream); false ⇒ definitely
  * absent — the pruning direction is always safe.
  *
  * `doGenCode` emits a static call into [[BloomFilterOps]] so the filter
  * predicate stays inside whole-stage codegen (one call per row; the md5 +
  * k bit probes run in compiled Java, not the interpreted fallback).
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {

  require(numHashes >= 1 && numHashes <= 16, s"numHashes ($numHashes) must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"might_contain needs (ARRAY<BIGINT>, STRING), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain"

  override def nullSafeEval(words: Any, key: Any): Any =
    BloomFilterOps.mightContain(words.asInstanceOf[ArrayData], key.toString, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, k) =>
      s"${ev.value} = graft.sql.expressions.BloomFilterOps.mightContain($w, $k.toString(), $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFilterOps {

  /** Kirsch–Mitzenmacher positions from ONE md5: h1 = low 28 bits,
    * h2 = high 28 bits forced odd, pos_i = (h1 + i·h2) mod numBits.
    */
  private def h1h2(key: String): (Long, Long) = {
    val h = KMinValues.hash56(key)
    (h & 0xFFFFFFFL, ((h >>> 28) & 0xFFFFFFFL) | 1L)
  }

  def set(words: Array[Long], key: String, numBits: Int, numHashes: Int): Unit = {
    val (a, b) = h1h2(key)
    var i = 0
    while (i < numHashes) {
      val pos = ((a + i * b) % numBits).toInt
      words(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def mightContain(words: ArrayData, key: String, numHashes: Int): Boolean = {
    val n = words.numElements()
    val numBits = n * 64
    val (a, b) = h1h2(key)
    var i = 0
    while (i < numHashes) {
      val pos = ((a + i * b) % numBits).toInt
      if ((words.getLong(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
