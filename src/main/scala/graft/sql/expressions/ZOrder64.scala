package graft.sql.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of the low `bits` bits of two non-negative
  * longs: output bit 2i = x bit i, output bit 2i+1 = y bit i.
  *
  * The data-layout primitive for multi-dimensional clustering at scale:
  * sorting/range-partitioning a 100 TB table by `zorder(dim1, dim2)` before
  * writing gives every downstream scan predicate on EITHER dimension
  * contiguous file-level min/max ranges to prune on (the Delta/Iceberg
  * OPTIMIZE ZORDER layout, as a plain expression any `orderBy`/
  * `repartitionByRange` can use).
  *
  * Native codegen (one fused bit loop) keeps it eligible for whole-stage
  * codegen in write paths; the same arithmetic is SQL-replayable as
  * `sum(((x >> i) & 1) << 2i | ((y >> i) & 1) << 2i+1)` (q75's oracle).
  * Nulls propagate. Only the low `bits` bits of each input are read, which
  * for any sign equals interleaving `pmod(x, 2^bits)` — but a negative
  * long's low bits carry no ordering relation to its value, so callers must
  * pre-bucket dimensions into [0, 2^bits) (e.g. via `pmod` or rank-bucketing)
  * for the sort key to be meaningful.
  */
case class ZOrder64(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits ($bits) must be in [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"zorder needs (BIGINT, BIGINT), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder64.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names: with non-nullable children nullSafeCodeGen inlines this
    // fragment without an enclosing block, so fixed `z`/`i` would collide
    // when two zorder calls share one codegen scope
    val z = ctx.freshName("z")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
