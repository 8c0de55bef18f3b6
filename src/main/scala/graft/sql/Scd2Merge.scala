package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge: apply a batch of timestamped
  * attribute updates to a versioned dimension (rows carry
  * [valid_from, valid_to) validity, open rows have NULL valid_to),
  * closing superseded versions and opening new ones — the warehouse
  * MERGE-INTO-with-history operation, as a plain deterministic DataFrame
  * transform (no table format required).
  *
  * Semantics per key, processing updates in time order:
  *   - an update whose payload EQUALS the currently-open payload is a
  *     no-op (consecutive-duplicate suppression — the property that keeps
  *     version tables from bloating under idempotent re-ingest);
  *   - otherwise the open version closes at the update's time and a new
  *     open version starts there;
  *   - already-closed history rows pass through untouched.
  *
  * Scale: closed rows never shuffle (pass-through union); the open
  * rows + updates shuffle ONCE on the key for a per-key ordered window
  * (lag for duplicate suppression, lead for the close time) — the same
  * cost class as any keyed window, with version chains bounded by the
  * update batch, not history. Duplicate (key, time) updates must be
  * resolved upstream (the deliberate contract — silently picking one
  * hides an ingest bug).
  */
class Scd2Merge(
    keyCol: String,
    fromCol: String = "valid_from",
    toCol: String = "valid_to") {

  /** New dimension state with `payloadCol` versioned by `tsCol` updates.
    * Output columns: (keyCol, payloadCol, fromCol, toCol).
    */
  def apply(
      dim: DataFrame,
      updates: DataFrame,
      payloadCol: String,
      tsCol: String): DataFrame = {
    val closed = dim.where(col(toCol).isNotNull)
      .select(col(keyCol), col(payloadCol), col(fromCol), col(toCol))
    // `__side` breaks (key, time) ties between the open dim row and an
    // update carrying the SAME timestamp as its valid_from: the dim row
    // sorts first, so the update deterministically supersedes it (or is
    // suppressed as a duplicate) instead of lag/lead ordering the two
    // nondeterministically. Duplicate same-time UPDATES remain the
    // caller's contract (both would get __side = 1).
    val open = dim.where(col(toCol).isNull)
      .select(col(keyCol), col(payloadCol), col(fromCol).as("__t"),
        lit(0).as("__side"))
    val ups = updates.select(col(keyCol), col(payloadCol),
      col(tsCol).cast("long").as("__t"), lit(1).as("__side"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__side"))
    // loud guard: an update timestamped BEFORE its key's open version
    // start would insert a version UNDER the existing one — overlapping
    // [from, to) validity, i.e. silently corrupted history (backfill
    // against closed history needs a rebuild, not a merge). The check is
    // a second window over the SAME partitioning — no extra shuffle.
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val openFrom = max(when(col("__side") === 0, col("__t"))).over(wAll)
    val chain = open.unionByName(ups)
      // per-key flag computed BEFORE duplicate suppression (the offending
      // update itself might be suppressed, but its key always keeps at
      // least its first row, which carries the flag forward)
      .withColumn("__bad",
        max(when(col("__side") === 1 && col("__t") < openFrom, col("__t")))
          .over(wAll))
      .withColumn("__prev", lag(col(payloadCol), 1).over(w))
      // keep version starts: the first row per key, and every payload change
      .where(col("__prev").isNull || !(col(payloadCol) <=> col("__prev")))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      // the guard lives INSIDE the fromCol output expression so column
      // pruning can never drop it (the GroupedNtile lesson: a guard in
      // its own never-referenced column silently disappears)
      .select(col(keyCol), col(payloadCol),
        when(col("__bad").isNotNull, raise_error(concat(
          lit("Scd2Merge: update at "), col("__bad").cast("string"),
          lit(s" precedes the open version's $fromCol for $keyCol="),
          col(keyCol).cast("string"),
          lit(" — merging it would create overlapping validity; rebuild instead"))
          ).cast("long"))
          .otherwise(col("__t")).as(fromCol),
        col("__next").as(toCol))
    closed.unionByName(chain)
  }
}
