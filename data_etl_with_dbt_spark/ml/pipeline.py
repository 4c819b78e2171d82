"""ML pipeline parity (reference ``Data-Insights/train.py`` + ``AI.py`` —
SURVEY.md §3.3): feature extraction from the modeled table, RandomForest
regression, evaluation, save/load, and batch scoring.

Spark-first: the sklearn single-process fit becomes ``pyspark.ml`` (driver
coordinates, executors build trees on partitioned data); scoring is
``model.transform`` — no collect, no per-row Python.
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import RandomForestRegressionModel, RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Feature order is significant for inference parity (AI.py:13-16).
FEATURE_COLUMNS = [
    "trip_distance",
    "passenger_count",
    "trip_duration_minutes",
    "avg_speed_mph",
    "rate_code_id",
    "payment_type",
]
LABEL_COLUMN = "fare_amount"


def extract_training_frame(core: DataFrame, limit: int = 100_000) -> DataFrame:
    """The reference's extraction query (train.py:26-34): narrow projection,
    positivity filters, capped size. The LIMIT is an arbitrary subset in the
    reference too (no ORDER BY) — callers needing determinism sort first."""
    return (
        core.where(
            (F.col(LABEL_COLUMN) > 0)
            & (F.col("trip_distance") > 0)
            & (F.col("trip_duration_minutes") > 0)
        )
        .select(*FEATURE_COLUMNS, LABEL_COLUMN)
        .limit(limit)
    )


def train_fare_model(
    training: DataFrame,
    num_trees: int = 200,
    seed: int = 42,
    test_fraction: float = 0.2,
    algorithm: str = "rf",
):
    """Train the fare regressor (train.py:40-52): 80/20 split (row-level;
    exact membership differs from sklearn's index split — assertions belong
    on sizes/metrics, not row identity), RandomForest(200 trees, seed 42),
    MSE on the held-out split (the reference computes MSE and mislabels it
    RMSE — we keep the metric and fix the label).

    ``algorithm='gbt'`` swaps in gradient-boosted trees (``num_trees``
    becomes the boosting iteration count) — the usual accuracy upgrade
    over a forest on tabular regression, at the cost of SEQUENTIAL
    boosting rounds: each iteration is a distributed job, so wall time
    grows with iterations however large the cluster; the forest's trees
    train in parallel. Same split, evaluator, and metrics either way.

    Returns (fitted PipelineModel-like tuple, metrics dict).
    """
    assembler = VectorAssembler(
        inputCols=FEATURE_COLUMNS, outputCol="features", handleInvalid="skip"
    )
    train_df, test_df = training.randomSplit(
        [1.0 - test_fraction, test_fraction], seed=seed
    )
    # Each half feeds two actions (fit/score + count); cache so the split
    # scan runs once per half instead of twice.
    train_df = train_df.cache()
    test_df = test_df.cache()
    if algorithm == "gbt":
        from pyspark.ml.regression import GBTRegressor

        est = GBTRegressor(
            featuresCol="features",
            labelCol=LABEL_COLUMN,
            predictionCol="prediction",
            maxIter=min(num_trees, 50),
            seed=seed,
        )
    elif algorithm == "rf":
        est = RandomForestRegressor(
            featuresCol="features",
            labelCol=LABEL_COLUMN,
            predictionCol="prediction",
            numTrees=num_trees,
            seed=seed,
        )
    else:
        raise ValueError(f"algorithm must be rf|gbt, got {algorithm!r}")
    model = est.fit(assembler.transform(train_df))
    predictions = model.transform(assembler.transform(test_df))
    evaluator = RegressionEvaluator(
        labelCol=LABEL_COLUMN, predictionCol="prediction", metricName="mse"
    )
    mse = evaluator.evaluate(predictions)
    # Both split sizes in ONE job: tag each cached half and count the union,
    # instead of two separate count() actions.
    side_counts = {
        r["side"]: r["count"]
        for r in train_df.select(F.lit("train").alias("side"))
        .unionAll(test_df.select(F.lit("test").alias("side")))
        .groupBy("side")
        .count()
        .collect()
    }
    metrics = {
        "mse": mse,
        # sqrt of the evaluated MSE — identical to a second rmse evaluation
        # pass without re-scanning the predictions.
        "rmse": mse**0.5,
        "n_train": side_counts.get("train", 0),
        "n_test": side_counts.get("test", 0),
    }
    train_df.unpersist()
    test_df.unpersist()
    return model, metrics


def save_model(model, path: str) -> None:
    """Model artifact sink (reference S9: joblib.dump → ml writer)."""
    model.write().overwrite().save(path)


def load_model(path: str):
    """Load a saved fare model: the artifact's metadata names its class,
    so dispatch on THAT — a blind try-RF-then-GBT would mask the real
    error of a corrupt/partial artifact behind a misleading GBT class
    mismatch."""
    import glob
    import json
    import os

    from pyspark.ml.regression import GBTRegressionModel

    cls = None
    parts = sorted(glob.glob(os.path.join(path, "metadata", "part-*")))
    if parts:
        with open(parts[0]) as fh:
            cls = json.loads(fh.readline()).get("class", "")
    if cls and "GBT" in cls:
        return GBTRegressionModel.load(path)
    return RandomForestRegressionModel.load(path)


def predict_batch(
    model, df: DataFrame, round_to: int = 2, handle_invalid: str = "skip"
) -> DataFrame:
    """Batch scoring (reference U4/F8): assemble features, transform, round.
    Distributed end to end — the loaded model ships to executors once.

    ``handle_invalid='skip'`` (the default) DROPS rows with NULL features
    from the output — callers must join predictions back by id, never zip
    by position. Pass ``'error'`` to fail loudly on bad rows instead, or
    ``'keep'`` to score them (tree models route NaN features down a
    default split)."""
    assembler = VectorAssembler(
        inputCols=FEATURE_COLUMNS, outputCol="features", handleInvalid=handle_invalid
    )
    return (
        model.transform(assembler.transform(df))
        .withColumn("predicted_fare", F.round(F.col("prediction"), round_to))
        .drop("features", "prediction")
    )


def feature_importances(model, feature_cols: list[str] | None = None) -> list[dict]:
    """Impurity-based feature importances from a fitted tree-ensemble
    regressor, named against the assembler's input columns — the model-
    debugging surface the reference's sklearn flow gets from
    ``feature_importances_``. Returns ``[{feature, importance}, ...]``
    sorted by importance descending (driver-side: one tiny dense vector,
    no data pass)."""
    cols = feature_cols if feature_cols is not None else FEATURE_COLUMNS
    imps = model.featureImportances.toArray().tolist()
    ranked = sorted(zip(cols, imps), key=lambda kv: (-kv[1], kv[0]))
    return [{"feature": f, "importance": float(v)} for f, v in ranked]
