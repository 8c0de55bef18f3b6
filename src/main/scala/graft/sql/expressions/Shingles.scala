package graft.sql.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling kernel: the k-gram fan-out of the MinHash pipeline as
  * one codegen'd row-local loop.
  *
  *  - `STRING` input → character k-shingles: the `max(len-k+1, 1)`
  *    substrings of width k (a string shorter than k yields itself), same
  *    as `transform(sequence(1, greatest(length(s)-k+1, 1)),
  *    i -> substring(s, i, k))`.
  *  - `ARRAY<STRING>` input → token k-grams: the `max(n-k+1, 1)`
  *    space-joined windows of k consecutive tokens, same as
  *    `transform(sequence(...), i -> array_join(slice(toks, i, k), ' '))`.
  *
  * The declarative higher-order-function formulations above run on the
  * interpreted CodegenFallback path (one virtual call per element — the
  * dominant cost of the minhash stage at ~hundreds of shingles per
  * document); this kernel emits a plain loop into whole-stage codegen and
  * produces byte-identical output, so the SQL oracle replay is unchanged.
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 2, s"shingle width k ($k) must be >= 2")

  private lazy val tokenMode: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles needs STRING or ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    if (tokenMode) Shingles.tokenGrams(input.asInstanceOf[ArrayData], k)
    else Shingles.charShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (tokenMode) "tokenGrams" else "charShingles"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.sql.expressions.Shingles.$fn($c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  private val Space = UTF8String.fromString(" ")

  /** Character k-shingles; mirrors `substring(s, i, k)` SQL semantics
    * (codepoint-based positions) via `UTF8String.substringSQL`.
    */
  def charShingles(s: UTF8String, k: Int): ArrayData = {
    val len = s.numChars()
    val n = math.max(len - k + 1, 1)
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = s.substringSQL(i + 1, k)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Token k-grams joined with single spaces; null tokens render as empty
    * strings, matching `array_join(slice(toks, i, k), ' ')` with its
    * default null replacement of dropping nulls — the normalizer never
    * emits nulls, but stay total.
    */
  def tokenGrams(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val count = math.max(n - k + 1, 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val width = math.min(k, n - i)
      val parts = new Array[UTF8String](math.max(width, 0))
      var j = 0
      while (j < width) {
        parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      // array_join drops null elements entirely (no separator), which
      // concatWs reproduces when passed no null args; filter defensively
      val nonNull = parts.filter(_ != null)
      out(i) = UTF8String.concatWs(Space, nonNull: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
