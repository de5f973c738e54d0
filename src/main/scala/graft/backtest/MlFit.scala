package graft.backtest

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib walk-forward model fitting — the scalable analog of the one
  * reference call with no engine counterpart until now
  * (ml_strategy.py:412 train_model fits an sklearn classifier on the
  * engineered features; :437 walk_forward_validation refits it per
  * anchored fold). Test-only, like the streaming layer: a model fit has
  * no set-level DuckDB oracle, so this is not a `SparkEntry` query —
  * MlFitSpec pins it instead (fold-boundary parity with
  * q_walk_forward_folds, a planted separable signal recovered at
  * AUC ≈ 1 with the dominant coefficient on the planted feature, and
  * run-to-run coefficient determinism).
  *
  * Scale shape: the fold LOOP is driver-side over the tiny fold table
  * (symbols × 5 rows — the same table q_walk_forward_folds emits); each
  * fit is a distributed MLlib job over that fold's training window, and
  * the label/feature prep is the session-memoized q_ml_features frame.
  * That is exactly how a production walk-forward runs on a cluster:
  * few sequential fits, each internally data-parallel.
  */
object MlFit {

  /** (features-non-null, label) prep: label = next-bar direction
    * (fwd > 0), null feature/forward rows dropped — the reference's
    * dropna before fit.
    */
  def trainingFrame(feats: DataFrame): DataFrame = {
    val nonNull = (BacktestPack.FeatureCols.map(col(_).isNotNull) :+
      col("fwd").isNotNull).reduce(_ && _)
    feats.filter(nonNull).withColumn("label", (col("fwd") > 0).cast("double"))
  }

  def assemble(df: DataFrame): DataFrame =
    new VectorAssembler()
      .setInputCols(BacktestPack.FeatureCols.toArray)
      .setOutputCol("features")
      .transform(df)

  /** Deterministic logistic fit on an already-labeled frame (L2, fixed
    * iteration budget — LBFGS on a convex loss from a fixed init is
    * run-to-run stable).
    */
  def fitLogistic(labeled: DataFrame): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(50)
      .setRegParam(1e-3)
      .setStandardization(true)
      .fit(assemble(labeled))

  def auc(model: LogisticRegressionModel, labeled: DataFrame): Double =
    if (labeled.isEmpty) Double.NaN
    else new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC")
      .evaluate(model.transform(assemble(labeled)))

  /** One result row per walk-forward fold: the fold boundaries (byte-
    * identical to q_walk_forward_folds — both derive from the same
    * registered query), the fitted coefficient vector, and train/test
    * AUC. `onlySymbol` restricts the fold loop (a spec-speed knob; a
    * deployment passes None).
    */
  def walkForwardLogistic(s: SparkSession, d: String,
                          onlySymbol: Option[String] = None): DataFrame = {
    import s.implicits._
    val feats = MlFeatures.cached(s, d)
    val folds = BacktestPack.queries("q_walk_forward_folds")(s, d)
      .collect() // symbols × 5 rows — the fold table is driver-sized by design
      .toSeq.map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      }
      .filter { case (sym, _, _, _, _) => onlySymbol.forall(_ == sym) }
    val rows = folds.map { case (sym, splitId, trainSize, testStart, testEnd) =>
      val symFeats = trainingFrame(feats.filter(col("symbol") === sym))
      val train = symFeats.filter(col("rn") <= trainSize)
      val test = symFeats.filter(col("rn") >= testStart && col("rn") <= testEnd)
      val model = fitLogistic(train)
      (sym, splitId, trainSize, testStart, testEnd,
        model.coefficients.toArray.toSeq, model.intercept,
        auc(model, train), auc(model, test))
    }
    rows.toDF("symbol", "split_id", "train_size", "test_start_rn",
      "test_end_rn", "coefficients", "intercept", "train_auc", "test_auc")
  }
}
