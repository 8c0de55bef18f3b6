package graft.sql.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the exact-verify family's set math
  * ([[graft.dedup.SetSimilarityJoin]], [[graft.dedup.ContainmentJoin]],
  * [[graft.dedup.MinHashDeduplicator]], [[graft.dedup.SortedNeighborhoodJoin]],
  * [[graft.streaming.StreamingNearDup]]).
  *
  * The r16 profile put the suite's largest remaining compute block in the
  * verify stage's `array_intersect`: Spark's `ArrayIntersect` builds a
  * boxed hash set PER CANDIDATE PAIR and materializes the intersection
  * array, when the verify only needs its SIZE. These kernels exploit what
  * the optimizer cannot know (guide §8): the token/shingle sets are
  * immutable per document and each document appears in MANY candidate
  * pairs, so sorting each set ONCE (per document, [[SortedDistinct]])
  * converts every per-pair verify into an allocation-free two-pointer
  * merge count ([[SortedIntersectCount]]).
  *
  * Order contract: [[SortedDistinct]] sorts ascending in UTF8String binary
  * order with nulls LAST and removes duplicates — the same element SET as
  * `array_distinct` (size and any order-independent consumer are
  * unchanged; intersection size, explode+groupBy, and size() are the only
  * consumers). [[SortedIntersectCount]] requires BOTH inputs in that
  * order, distinct; null elements compare equal to each other (matching
  * `array_intersect`'s null-aware equality).
  */
case class SortedDistinct(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_distinct needs ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "sorted_distinct"

  override def nullSafeEval(input: Any): Any =
    SortedSetOps.sortedDistinct(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.sql.expressions.SortedSetOps.sortedDistinct($c);")

  override protected def withNewChildInternal(newChild: Expression): SortedDistinct =
    copy(child = newChild)
}

/** `size(array_intersect(a, b))` for two SORTED (UTF8String binary order,
  * nulls last), DISTINCT ARRAY&lt;STRING&gt; columns, as one allocation-free
  * merge loop. See [[SortedDistinct]] for the order contract.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs two ARRAY<STRING>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedSetOps.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.sql.expressions.SortedSetOps.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedSetOps {

  /** Sort ascending (UTF8String binary order, nulls last) and drop
    * duplicates. One O(n log n) pass per document — paid once per set,
    * amortized over every candidate pair the set verifies in.
    */
  def sortedDistinct(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(a, NullsLastOrder)
    // dedup in place over the sorted run (null dedups too: nulls are
    // grouped at the end and array_distinct also keeps exactly one)
    val out = new Array[AnyRef](n)
    var m = 0
    i = 0
    while (i < n) {
      val v = a(i)
      if (m == 0 || !eq(out(m - 1).asInstanceOf[UTF8String], v)) {
        out(m) = v
        m += 1
      }
      i += 1
    }
    if (m == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Two-pointer merge count over sorted distinct arrays. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    var x: UTF8String = null
    var y: UTF8String = null
    var xNull = false
    var yNull = false
    if (i < na) { xNull = a.isNullAt(i); x = if (xNull) null else a.getUTF8String(i) }
    if (j < nb) { yNull = b.isNullAt(j); y = if (yNull) null else b.getUTF8String(j) }
    while (i < na && j < nb) {
      // nulls sort last and compare equal to each other
      val cmp =
        if (xNull && yNull) 0
        else if (xNull) 1
        else if (yNull) -1
        else x.compareTo(y)
      if (cmp <= 0) {
        if (cmp == 0) c += 1
        i += 1
        if (i < na) { xNull = a.isNullAt(i); x = if (xNull) null else a.getUTF8String(i) }
      }
      if (cmp >= 0) {
        j += 1
        if (j < nb) { yNull = b.isNullAt(j); y = if (yNull) null else b.getUTF8String(j) }
      }
    }
    c
  }

  private def eq(a: UTF8String, b: UTF8String): Boolean =
    if (a == null) b == null else b != null && a.equals(b)

  private val NullsLastOrder: java.util.Comparator[UTF8String] =
    new java.util.Comparator[UTF8String] {
      override def compare(a: UTF8String, b: UTF8String): Int =
        if (a == null && b == null) 0
        else if (a == null) 1
        else if (b == null) -1
        else a.compareTo(b)
    }
}
