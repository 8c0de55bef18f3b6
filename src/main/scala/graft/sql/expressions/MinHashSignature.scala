package graft.sql.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: given a document's shingle array, computes all
  * `numHashes` minima in ONE row-local pass — `min_j over shingles of
  * (h1 + j*h2) mod 2^56` with (h1, h2) the first two 56-bit halves of
  * md5(shingle) (Kirsch-Mitzenmacher double hashing).
  *
  * Bit-identical to the declarative formulation
  * (`conv(substring(md5(s),1,14),16,10)` etc.) and to the SQL oracle's
  * replay, but with no shingle explode, no shingle×seed row blow-up, and
  * no (doc, seed) aggregation shuffle — the md5 kernel runs on raw digest
  * bytes with zero hex-string allocation.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 2 && numHashes <= 64,
    s"numHashes ($numHashes) must be in [2, 64]") // j*h2 stays < 2^63

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.sql.expressions.MinHashSignature.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  private val Mask56 = (1L << 56) - 1

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** 56-bit value of hex nibbles [from, from+14) of the digest. */
  private def half(digest: Array[Byte], from: Int): Long = {
    var v = 0L
    var j = from
    while (j < from + 14) {
      val nibble =
        if ((j & 1) == 0) (digest(j >> 1) >> 4) & 0xF
        else digest(j >> 1) & 0xF
      v = (v << 4) | nibble
      j += 1
    }
    v
  }

  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val minima = Array.fill(numHashes)(Long.MaxValue)
    val md = digests.get()
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val shingle = shingles.getUTF8String(s)
      if (shingle != null) {
        md.reset()
        val digest = md.digest(shingle.getBytes)
        val h1 = half(digest, 0)
        val h2 = half(digest, 14)
        var j = 0
        while (j < numHashes) {
          val g = (h1 + j * h2) & Mask56
          if (g < minima(j)) minima(j) = g
          j += 1
        }
      }
      s += 1
    }
    new GenericArrayData(minima)
  }
}
