package graft.queries

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.classification.{LocalLogisticRegression, LocalLogisticRegressionModel}

/** LocalLogisticRegression end-to-end: deterministic features from orders,
  * single-partition input so the LOCAL training path runs, coefficients
  * emitted as rows. DuckDB can't fit an LR, so the oracle is a COMMITTED
  * GOLDEN of the rounded coefficients (fingerprinted per SF by orders row
  * count, regenerated via graft.tools.MakeGoldens); the trainer itself is
  * pinned by the R/glmnet golden specs.
  *
  * q41 covers the SCORING path with a hash-checked oracle: a model with
  * fixed coefficients transforms the same feature frame, and DuckDB
  * replays margin → sigmoid → threshold exactly.
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
    }),

    // scoring path, oracle-checked: fixed coefficients over the same
    // deterministic features; margin accumulated intercept-first then in
    // index order, matching the oracle's left-to-right sum.
    "q41_lr_score" -> ((s, dir) => {
      val df = Tables.orders(s, dir).select(
        col("o_orderkey"),
        (col("o_totalprice") / 100000.0).as("f1"),
        ((col("o_orderkey") % 97) / 97.0).as("f2"),
        ((col("o_custkey") % 13) / 13.0).as("f3"))
      val assembled = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("f1", "f2", "f3")).setOutputCol("features")
        .transform(df)
      val model = new LocalLogisticRegressionModel("q41",
        org.apache.spark.ml.linalg.Vectors.dense(0.8, -1.2, 0.5), -0.3)
      model.transform(assembled)
        .select(col("o_orderkey"),
          round(col("rawPrediction"), 6).as("margin"),
          round(col("probability"), 6).as("probability"),
          col("prediction"))
    }),

    // kNN label propagation: every 20th embedding classified by the
    // majority label of its 5 nearest labeled neighbors (leave-one-out:
    // self excluded); vote ties toward the smallest label
    "q112_knn_classify" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      new graft.classification.KnnClassifier(k = 5)
        .predict(e.where(col("vec_id") % 20 === 0), e)
    })
  )

  val oracles: Map[String, String] = Map(
    "q112_knn_classify" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 20 = 0),
        |ranked AS (
        |  SELECT qid, label,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY list_cosine_similarity(qv, v) DESC, vec_id) AS rnk
        |  FROM q JOIN e ON vec_id != qid
        |), votes AS (
        |  SELECT qid AS query_id, label, count(*) AS votes
        |  FROM ranked WHERE rnk <= 5 GROUP BY 1, 2
        |), win AS (
        |  SELECT query_id, label, votes,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, label) AS rn
        |  FROM votes
        |)
        |SELECT query_id, label AS predicted, votes FROM win WHERE rn = 1""".stripMargin,
    "q41_lr_score" ->
      """WITH f AS (
        |  SELECT o_orderkey,
        |         o_totalprice / 100000.0 AS f1,
        |         (o_orderkey % 97) / 97.0 AS f2,
        |         (o_custkey % 13) / 13.0 AS f3
        |  FROM orders
        |), m AS (
        |  SELECT o_orderkey, -0.3 + 0.8 * f1 + -1.2 * f2 + 0.5 * f3 AS margin FROM f
        |)
        |SELECT o_orderkey,
        |       round(margin, 6) AS margin,
        |       round(1.0 / (1.0 + exp(-margin)), 6) AS probability,
        |       CAST(CASE WHEN 1.0 / (1.0 + exp(-margin)) > 0.5 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS prediction
        |FROM m""".stripMargin,
    // committed golden (see the class comment): the per-SF coefficient
    // rows are selected by the orders-count fingerprint; guard row makes
    // a missing fingerprint an explicit marker mismatch, never a silent
    // empty result
    "q27_local_lr" ->
      s"""WITH g AS (
        |  SELECT * FROM read_parquet('${Goldens.path("q27_lr")}/*.parquet')
        |), n AS (SELECT count(*) AS nc FROM orders)
        |SELECT feature, weight FROM g, n WHERE g.n_orders = n.nc
        |UNION ALL
        |SELECT 'MISSING_GOLDEN_FINGERPRINT_RERUN_MakeGoldens', -1.0
        |WHERE NOT EXISTS (SELECT 1 FROM g, n WHERE g.n_orders = n.nc)""".stripMargin
  )
}
