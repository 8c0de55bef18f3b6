package graft.sql.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Row-local nearest-cell assignment under squared L2 for [[graft.similarity.KMeans]]
  * — the L2 sibling of [[NearestCentroidId]] (see there for the shuffle
  * argument; here the replaced shape was `crossJoin(broadcast) →
  * groupBy(id).agg(min_by(struct(cid, d2), struct(d2, cid)))`, one argmax
  * shuffle per Lloyd round plus the corpus join-back).
  *
  * Returns `struct(cid LONG, d2 DOUBLE)` replicating
  * `min_by(struct(cid, d2), struct(d2, cid))` exactly:
  *
  *  - cells evaluated in ascending-cid order (caller sorts the literal);
  *    a later cell wins only on STRICTLY smaller d2 — ties keep the
  *    lowest cid;
  *  - a null d2 (null vector, null centroid, length mismatch) sorts
  *    SMALLEST (struct comparison puts null fields first), so under MIN a
  *    null-d2 cell beats every real one — the all-null row keeps the
  *    lowest cid with d2 = null, exactly as the struct min_by did;
  *  - NaN sorts largest (loses under min except to nothing).
  *
  * `d2` is computed by the IDENTICAL loop as [[SquaredL2]]
  * ([[NearestCellL2Ops.squaredL2]]), so assignments are bit-equal to the
  * crossJoin formulation. Null result only for an empty cell set
  * (callers special-case it).
  */
case class NearestCellL2(vec: Expression, cids: Expression, cents: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cids
  override def third: Expression = cents

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cids.dataType, cents.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _),
          ArrayType(ArrayType(DoubleType, _), _)) => TypeCheckResult.TypeCheckSuccess
      case (v, i, c) => TypeCheckResult.TypeCheckFailure(
        "nearest_cell_l2 needs (ARRAY<DOUBLE>, ARRAY<BIGINT>, " +
          s"ARRAY<ARRAY<DOUBLE>>), got ${v.catalogString}, ${i.catalogString}, " +
          c.catalogString)
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = true),
    StructField("d2", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell_l2"

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val is = cids.eval(input).asInstanceOf[ArrayData]
    val cs = cents.eval(input).asInstanceOf[ArrayData]
    NearestCellL2Ops.nearest(v.asInstanceOf[ArrayData], is, cs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vGen = vec.genCode(ctx)
    val iGen = cids.genCode(ctx)
    val cGen = cents.genCode(ctx)
    ev.copy(code =
      code"""
        ${vGen.code}
        ${iGen.code}
        ${cGen.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.sql.expressions.NearestCellL2Ops.nearest(
            ${vGen.isNull} ? null : ${vGen.value}, ${iGen.value}, ${cGen.value});
        boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCellL2 =
    copy(vec = newFirst, cids = newSecond, cents = newThird)
}

/** Row-local `min(squared_l2(cv, centroid))` over the cell set, ignoring
  * null distances (SQL `min` semantics: null only when ALL are null; NaN
  * sorts largest so a real distance always beats it) — replaces the
  * per-seed-round `crossJoin → groupBy(id).agg(min(d2))` shuffle in
  * [[graft.similarity.KMeans.seedsFarthest]].
  */
case class MinSquaredL2(vec: Expression, cents: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cents

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, c) => TypeCheckResult.TypeCheckFailure(
        "min_squared_l2 needs (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>), got " +
          s"${v.catalogString}, ${c.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "min_squared_l2"

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val cs = cents.eval(input).asInstanceOf[ArrayData]
    NearestCellL2Ops.minD2(v.asInstanceOf[ArrayData], cs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vGen = vec.genCode(ctx)
    val cGen = cents.genCode(ctx)
    ev.copy(code =
      code"""
        ${vGen.code}
        ${cGen.code}
        java.lang.Double ${ev.value}_box =
          graft.sql.expressions.NearestCellL2Ops.minD2(
            ${vGen.isNull} ? null : ${vGen.value}, ${cGen.value});
        boolean ${ev.isNull} = ${ev.value}_box == null;
        double ${ev.value} = ${ev.isNull} ? 0.0 : ${ev.value}_box.doubleValue();
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinSquaredL2 =
    copy(vec = newLeft, cents = newRight)
}

object NearestCellL2Ops {

  /** See [[NearestCellL2]] for the ordering contract. Null for an empty
    * cell set.
    */
  def nearest(cv: ArrayData, cids: ArrayData, cents: ArrayData): InternalRow = {
    val m = cents.numElements()
    var best = -1
    var bestD2 = 0.0
    var bestNull = true
    var j = 0
    while (j < m) {
      var d2Null = true
      var d2 = 0.0
      if (cv != null && !cents.isNullAt(j)) {
        val d = squaredL2(cv, cents.getArray(j))
        if (d != null) { d2 = d.doubleValue(); d2Null = false }
      }
      // min over struct(d2, cid): null d2 is SMALLEST; ties keep the
      // earlier (lower) cid; NaN largest
      val better =
        if (best < 0) true
        else if (bestNull) false            // an earlier null d2 already won
        else if (d2Null) true               // null beats any real d2 under min
        else ltSql(d2, bestD2)
      if (better) { best = j; bestD2 = d2; bestNull = d2Null }
      j += 1
    }
    if (best < 0) null
    else {
      val cid: Any = if (cids.isNullAt(best)) null else cids.getLong(best)
      val d2: Any = if (bestNull) null else bestD2
      InternalRow(cid, d2)
    }
  }

  /** SQL `min` of the per-cell distances, ignoring nulls. */
  def minD2(cv: ArrayData, cents: ArrayData): java.lang.Double = {
    val m = cents.numElements()
    var best: java.lang.Double = null
    var j = 0
    while (j < m) {
      if (cv != null && !cents.isNullAt(j)) {
        val d = squaredL2(cv, cents.getArray(j))
        if (d != null && (best == null || ltSql(d.doubleValue(), best.doubleValue())))
          best = d
      }
      j += 1
    }
    best
  }

  /** Spark's double sort order as strict less-than (NaN largest, signed
    * zeros tie).
    */
  private def ltSql(x: Double, y: Double): Boolean =
    if (y.isNaN) !x.isNaN
    else if (x.isNaN) false
    else x < y

  /** The IDENTICAL loop as [[SquaredL2.nullSafeEval]] — same accumulation
    * order for bit-equal distances. Null on length mismatch.
    */
  def squaredL2(va: ArrayData, vb: ArrayData): java.lang.Double = {
    val n = va.numElements()
    if (n != vb.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = va.getDouble(i) - vb.getDouble(i)
        acc += d * d
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
  }
}
