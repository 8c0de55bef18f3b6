package graft.sql.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** HyperLogLog distinct-count sketch as a custom Catalyst
  * `TypedImperativeAggregate` — completes the engine's mergeable-sketch
  * suite (KMV `KMinValues`, Count-Min `CountMinSketch`, `BloomFilter`).
  *
  * State per group: `m = 2^p` one-byte registers, `M[j] = max rho` over all
  * hashes landing in register `j`, where `j` is the hash's top `p` bits and
  * `rho` is the number of leading zeros in the remaining bits plus one
  * (Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm", AofA 2007). Fixed `m` bytes of state
  * regardless of group size and merge = element-wise max, which is what
  * makes it the 100 TB distinct-count tool: a trillion-row group still
  * ships 2^p bytes through the shuffle, and partial aggregation
  * (map-side combine) works because max is commutative/associative.
  *
  * The hash is the same 56-bit md5 prefix as [[KMinValues]]
  * ([[KMinValues.hash56]]), NOT a JVM hash, so the SQL oracle can replay
  * the exact registers: DuckDB computes `('0x'||substr(md5(v),1,14))::BIGINT`,
  * splits it into `reg = hv >> (56-p)` and a suffix, and derives rho from
  * the suffix's binary length (q80).
  *
  * `eval` returns the register array (`array<int>`, length m);
  * [[graft.sql.functions.hllEstimate]] turns it into the standard
  * bias-corrected estimate with the small-range linear-counting branch.
  * Returning registers (not the estimate) from the aggregate keeps the
  * query output integer-exact for hash comparison and lets callers union
  * sketches across time partitions before estimating.
  */
case class HllSketch(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"p ($p) must be in [4, 16]")
  private def m: Int = 1 << p

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch needs STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hv = KMinValues.hash56(v.toString)
      val reg = (hv >>> (56 - p)).toInt
      val suffixBits = 56 - p
      val suffix = hv & ((1L << suffixBits) - 1)
      // rho = leading zeros within the suffix-bit window, plus one
      val rho =
        if (suffix == 0L) suffixBits + 1
        else suffixBits - (63 - java.lang.Long.numberOfLeadingZeros(suffix))
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}
