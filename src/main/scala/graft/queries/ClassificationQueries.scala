package graft.queries

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.classification.LocalLogisticRegression

/** LocalLogisticRegression end-to-end: deterministic features from orders,
  * single-partition input so the LOCAL training path runs, coefficients
  * emitted as rows. No SQL oracle (DuckDB can't fit an LR) → rows-only
  * check; coefficient-level verification lives in the glmnet golden specs.
  */
object ClassificationQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q27_local_lr" -> ((s, dir) => {
      val df = Tables.orders(s, dir).select(
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("label"),
        (col("o_totalprice") / 100000.0).as("f1"),
        ((col("o_orderkey") % 97) / 97.0).as("f2"),
        ((col("o_custkey") % 13) / 13.0).as("f3"))
      val assembled = new VectorAssembler()
        .setInputCols(Array("f1", "f2", "f3")).setOutputCol("features")
        .transform(df)
        .coalesce(1) // single partition → local in-executor training path
      val model = new LocalLogisticRegression().setMaxIter(50).fit(assembled)
      val rows = ("intercept", model.intercept) +:
        Array("f1", "f2", "f3").zipWithIndex.map { case (f, i) =>
          (f, model.coefficients(i))
        }.toSeq
      import s.implicits._
      rows.toDF("feature", "weight")
        .select(col("feature"), round(col("weight"), 4).as("weight"))
    })
  )

  val oracles: Map[String, String] = Map.empty
}
