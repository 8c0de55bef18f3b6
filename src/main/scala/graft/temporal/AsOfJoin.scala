package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series as-of join: for each left row, the single right row with the
  * greatest right-time <= left-time (`backward`, the default) or the
  * smallest right-time >= left-time (`forward`), equi-matched on key
  * columns — the join behind "attach the most recent signal reading /
  * price / prior event to each observation".
  *
  * Beyond-reference operator (the build brief's canonical example of an
  * operator Spark lacks). Spark has no ASOF JOIN; a naive formulation is a
  * non-equi range join (O(n·m) per key) or a per-key `collect` — neither
  * survives scale. This implementation is the union+window trick:
  *
  *  1. tag left and right rows and `unionByName` them onto a common
  *     (keys, time, side, payload) shape — no join node at all;
  *  2. one hash shuffle on the key columns (the only wide exchange);
  *  3. per key, sort by (time, side) and take `last(right-payload,
  *     ignoreNulls)` over the running window — each right row's payload
  *     is visible to exactly the left rows at-or-after it, which IS the
  *     as-of semantics; right rows order before left rows at equal time,
  *     so matching is inclusive;
  *  4. keep the left rows, unpack the matched payload, apply the optional
  *     `tolerance` as a null-out filter.
  *
  * Cost: one shuffle + one per-key sort, same as any keyed window — at
  * 100 TB it scales exactly like `groupBy(key)`; a pathologically hot key
  * serializes only its own partition (standard salting/time-bucketing
  * applies upstream). Duplicate (key, time) rows in the right table make
  * the winner order-dependent — pre-aggregate the right side to one row
  * per (key, time) when that matters.
  */
class AsOfJoin(
    keyCols: Seq[String],
    leftTimeCol: String,
    rightTimeCol: String,
    direction: String = "backward",
    tolerance: Option[Long] = None) {

  require(keyCols.nonEmpty, "as-of join needs at least one key column")
  require(direction == "backward" || direction == "forward",
    s"direction must be backward|forward, got $direction")
  require(tolerance.forall(_ >= 0), "tolerance must be nonnegative")

  /** Left-outer as-of join; right payload columns (everything except the
    * key and time columns) are appended, null when no right row qualifies.
    * Right payload columns must not clash with left column names — rename
    * upstream (the deliberate contract; implicit suffixing hides bugs).
    */
  def join(left: DataFrame, right: DataFrame): DataFrame = {
    val rPayloadCols = right.columns.filterNot(c => keyCols.contains(c)).toSeq
    val clash = rPayloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"right payload columns clash with left: ${clash.mkString(", ")} — rename upstream")

    // common shape: keys, __t, __side, __l (left payload), __r (right payload)
    val lPayload = struct(left.columns.map(col).toIndexedSeq: _*)
    val rPayload = struct(rPayloadCols.map(col): _*)
    val rStruct: StructType = StructType(
      right.schema.fields.filter(f => rPayloadCols.contains(f.name)))
    val lStruct: StructType = left.schema

    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTimeCol).cast("long").as("__t"), lit(1).as("__side"),
        lPayload.as("__l"), lit(null).cast(rStruct).as("__r")): _*)
    // null-time right rows would sort before everything and become the
    // "most recent" match for early left rows — they can never be a valid
    // as-of answer, so drop them here
    val rTagged = right.where(col(rightTimeCol).isNotNull).select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).cast("long").as("__t"), lit(0).as("__side"),
        lit(null).cast(lStruct).as("__l"), rPayload.as("__r")): _*)

    // backward: right rows sort before left at equal __t (inclusive match);
    // forward: scan time descending so "last right seen" = next-at-or-after
    val timeOrder =
      if (direction == "backward") Seq(col("__t").asc, col("__side").asc)
      else Seq(col("__t").desc, col("__side").asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val withinTol: Column = tolerance match {
      case None => col("__m").isNotNull
      case Some(tol) =>
        val gap =
          if (direction == "backward") col("__t") - col("__m")(rightTimeCol)
          else col("__m")(rightTimeCol) - col("__t")
        col("__m").isNotNull && gap <= tol
    }

    val leftCols = left.columns.map(c => col("__l")(c).as(c)).toIndexedSeq
    val rightCols = rPayloadCols.map(c =>
      when(withinTol, col("__m")(c)).as(c))
    matched.select(leftCols ++ rightCols: _*)
  }
}
