package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series as-of join: for each left row, the single right row with the
  * greatest right-time <= left-time (`backward`, the default), the
  * smallest right-time >= left-time (`forward`), or whichever of the two
  * is closer in time (`nearest`, ties to backward — the pandas
  * `merge_asof` convention), equi-matched on key columns — the join
  * behind "attach the most recent signal reading / price / prior event
  * to each observation".
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
  * applies upstream). Among duplicate (key, time) rows in the right
  * table, the greatest payload (struct order) wins deterministically.
  * When the payload type is unorderable (maps) there IS no deterministic
  * winner, so a duplicate (key, time) right row fails loudly at run time
  * (r13 — previously a scaladoc-only contract, i.e. a silent
  * nondeterminism footgun); pre-aggregate upstream, drop the map column,
  * or pass `allowUnorderableDuplicates = true` to accept any-winner.
  */
class AsOfJoin(
    keyCols: Seq[String],
    leftTimeCol: String,
    rightTimeCol: String,
    direction: String = "backward",
    tolerance: Option[Long] = None,
    allowUnorderableDuplicates: Boolean = false) {

  require(keyCols.nonEmpty, "as-of join needs at least one key column")
  require(Set("backward", "forward", "nearest").contains(direction),
    s"direction must be backward|forward|nearest, got $direction")
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
    // forward: scan time descending so "last right seen" = next-at-or-after.
    // nearest: both scans — two Window nodes over the SAME partitioning
    // (one exchange, two per-partition sorts), candidates reconciled
    // row-locally by gap.
    //
    // Duplicate (key, time) RIGHT rows: the payload struct joins the sort
    // key (when its type is orderable — maps aren't), so the winner among
    // duplicates is the GREATEST payload in both scan directions — a
    // deterministic function of the data, not of partitioning/speculative
    // task order.
    val orderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(rStruct)
    val rTie: Seq[Column] =
      if (orderable) Seq(col("__r").asc_nulls_first) else Seq.empty
    // An UNORDERABLE payload (a map column) has no deterministic winner
    // among duplicate (key, time) right rows — the match would silently
    // depend on partitioning/speculative task order. Fail loudly at the
    // first duplicate actually present (a per-(key, time) count window on
    // the right side — one extra keyed sort, paid only on the unorderable
    // path) and name the fixes; `allowUnorderableDuplicates = true` is
    // the documented opt-out for callers who accept any-winner.
    val rGuarded =
      if (orderable || allowUnorderableDuplicates) rTagged
      else {
        val wDup = Window.partitionBy(keyCols.map(col) :+ col("__t"): _*)
        rTagged
          .withColumn("__r",
            when(count(lit(1)).over(wDup) > 1, raise_error(lit(
              s"AsOfJoin: duplicate (${keyCols.mkString(", ")}, $rightTimeCol) " +
                "right rows with an UNORDERABLE payload (map column): the " +
                "matched row would depend on partitioning. Pre-aggregate the " +
                "right side to one row per (key, time), drop the map column, " +
                "or opt in with allowUnorderableDuplicates = true.")))
              .otherwise(col("__r")))
      }
    val wBack = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col("__t").asc, col("__side").asc) ++ rTie: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // desc_nulls_FIRST, deliberately: a NULL left time can never have an
    // as-of answer. asc puts nulls first, so the backward scan naturally
    // shows them nothing — but plain desc puts them LAST, where the scan
    // has already accumulated every right row, and a tolerance-less
    // forward join silently matched null-time rows to the EARLIEST right
    // row (merge_asof never matches NaT; backward and forward must agree)
    val wFwd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col("__t").desc_nulls_first, col("__side").asc) ++ rTie: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val union = lTagged.unionByName(rGuarded)
    // candidate validity: present, and inside tolerance when one is set
    def valid(m: Column, gap: Column): Column = tolerance match {
      case None => m.isNotNull
      case Some(tol) => m.isNotNull && gap <= tol
    }
    val matched = direction match {
      case "backward" =>
        val m = last(col("__r"), ignoreNulls = true).over(wBack)
        union.withColumn("__m", m)
          .withColumn("__ok", valid(col("__m"), col("__t") - col("__m")(rightTimeCol)))
      case "forward" =>
        val m = last(col("__r"), ignoreNulls = true).over(wFwd)
        union.withColumn("__m", m)
          .withColumn("__ok", valid(col("__m"), col("__m")(rightTimeCol) - col("__t")))
      case "nearest" =>
        val both = union
          .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wBack))
          .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(wFwd))
        val gapB = col("__t") - col("__mb")(rightTimeCol)
        val gapF = col("__mf")(rightTimeCol) - col("__t")
        val okB = valid(col("__mb"), gapB)
        val okF = valid(col("__mf"), gapF)
        // both valid → smaller gap wins, tie → backward (the pandas
        // merge_asof nearest convention)
        both
          .withColumn("__m",
            // no otherwise: an unmatched row gets a typed NULL for free
            when(okB && (!okF || gapB <= gapF), col("__mb"))
              .when(okF, col("__mf")))
          .withColumn("__ok", okB || okF)
          .drop("__mb", "__mf")
    }

    val kept = matched.where(col("__side") === 1)
    val leftCols = left.columns.map(c => col("__l")(c).as(c)).toIndexedSeq
    val rightCols = rPayloadCols.map(c =>
      when(col("__ok"), col("__m")(c)).as(c))
    kept.select(leftCols ++ rightCols: _*)
  }
}
