package graft.sql.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a token array: md5 each token (same digest
  * as Spark's `md5` — UTF-8 bytes), majority-vote the first 64 hash bits
  * with token-frequency weighting, emit 16 lowercase hex chars.
  *
  * Replaces the declarative formulation (explode → 64 CASE/conv vote sums
  * → groupBy) with ONE row-local pass: no explode blow-up, no 64-column
  * aggregate, no shuffle — the signature computes inside the scan stage.
  * Bit-for-bit identical to the SQL oracle's replay.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.sql.expressions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".getBytes

  /** One pass over the tokens: votes[i*4 + (3-b)] accumulates ±1 per token
    * for bit b (weight 1&lt;&lt;b) of hex nibble i of the token's md5.
    */
  def compute(tokens: ArrayData): UTF8String = {
    val votes = new Array[Int](64)
    val md = digests.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) {
        md.reset()
        val digest = md.digest(tok.getBytes)
        var i = 0
        while (i < 16) {
          val nibble =
            if ((i & 1) == 0) (digest(i >> 1) >> 4) & 0xF
            else digest(i >> 1) & 0xF
          var b = 3
          while (b >= 0) {
            val idx = i * 4 + (3 - b)
            if (((nibble >> b) & 1) == 1) votes(idx) += 1 else votes(idx) -= 1
            b -= 1
          }
          i += 1
        }
      }
      t += 1
    }
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      var v = 0
      var b = 3
      while (b >= 0) {
        if (votes(i * 4 + (3 - b)) > 0) v |= (1 << b)
        b -= 1
      }
      out(i) = hexChars(v)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
