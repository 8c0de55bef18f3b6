package graft.sql.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a random-hyperplane LSH sign-bit
  * signature for an `ARRAY<DOUBLE>` vector: bit r = sign(dot(vec, plane_r))
  * where component d of plane r is
  * `((r*2654435761 + d*40503) mod 1009)/1009 - 0.5`.
  *
  * This is the hot inner loop of [[graft.similarity.RandomHyperplaneLSH]]:
  * numPlanes×dim multiply-adds per row. As a chain of built-in higher-order
  * functions (zip_with/aggregate) it runs on the interpreted
  * CodegenFallback path (~1 virtual call per element); here `doGenCode`
  * emits the two nested Java loops directly into whole-stage codegen —
  * same arithmetic as the SQL oracle's replay, ~10× less per-row overhead.
  *
  * Oracle-replay caveat: this loop accumulates each dot product in fixed
  * d=0..n order, while an SQL replay that SUMs over an exploded group has
  * no guaranteed accumulation order — a dot product within float epsilon
  * of 0 could round to a different sign and flip a signature bit. In
  * practice plane dots sit far from 0 (the test gate has never seen a
  * flip), but comparisons should treat signature-boundary discrepancies as
  * possible, not impossible.
  */
case class HyperplaneSignature(child: Expression, numPlanes: Int)
  extends UnaryExpression {

  require(numPlanes > 0, s"numPlanes ($numPlanes) must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature needs ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bits = new Array[Byte](numPlanes)
    var r = 0
    while (r < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val plane = ((r * 2654435761L + d * 40503L) % 1009L).toDouble / 1009.0 - 0.5
        dot += arr.getDouble(d) * plane
        d += 1
      }
      bits(r) = if (dot > 0) '1' else '0'
      r += 1
    }
    UTF8String.fromBytes(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bits = ctx.freshName("bits")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $c.numElements();
         |final byte[] $bits = new byte[$numPlanes];
         |for (int $r = 0; $r < $numPlanes; $r++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    final double $plane =
         |      (double) (($r * 2654435761L + $d * 40503L) % 1009L) / 1009.0 - 0.5;
         |    $dot += $c.getDouble($d) * $plane;
         |  }
         |  $bits[$r] = $dot > 0 ? (byte) '1' : (byte) '0';
         |}
         |${ev.value} = UTF8String.fromBytes($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}
