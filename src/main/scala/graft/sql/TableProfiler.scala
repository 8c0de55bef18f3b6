package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass column profiler ("ANALYZE TABLE" as a query): row count,
  * null count, distinct count, and min/max per column, emitted in long
  * format — the data-quality prepass every large-scale pipeline runs before
  * trusting a new drop of input.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale design: ONE aggregation job over the scan produces every statistic
  * (a per-column loop of `df.select(...).distinct.count()` would re-scan
  * the table k times). Exact distinct counts plan through Catalyst's Expand
  * (one scan, k-way row expansion before the partial agg) — acceptable to a
  * few dozen columns; `approx = true` swaps in `approx_count_distinct`
  * (HyperLogLog++ partial aggregates, no Expand) for the true 100 TB path
  * where ±2% on distinct counts is the right trade. Numeric min/max
  * surface as doubles, string min/max as strings; the long format comes
  * from exploding one literal-built array of structs over the single
  * aggregated row — no shuffle after the agg.
  */
class TableProfiler(approx: Boolean = false) {

  /** (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    * max_str) — one row per profiled column.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val nd =
        if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__nn"),
        nd.as(s"${c}__nd"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)

    val rows = cols.map { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      val (minNum, maxNum, minStr, maxStr) =
        if (numeric)
          (col(s"${c}__min").cast("double"), col(s"${c}__max").cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        else
          (lit(null).cast("double"), lit(null).cast("double"),
            col(s"${c}__min").cast("string"), col(s"${c}__max").cast("string"))
      struct(
        lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
