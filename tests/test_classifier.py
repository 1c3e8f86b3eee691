"""Broadcast-model batch classifier (the reference's XGBoost txt-layer
pattern, txtlayer_classifier.py:26-57, without the pickled artifact)."""

import numpy as np
import pandas as pd

from dedoc_spark.operators.classifier import (
    LogisticModel,
    features_frame,
    score_text_quality,
    synthetic_training_set,
    train_default_model,
)


def test_model_separates_text_from_garbage():
    model = train_default_model()
    texts, labels = synthetic_training_set()
    proba = model.predict_proba(features_frame(pd.Series(texts)))
    acc = float(np.mean((proba >= 0.5) == np.array(labels, dtype=bool)))
    assert acc >= 0.95  # trivially separable classes


def test_train_is_deterministic():
    m1, m2 = train_default_model(), train_default_model()
    assert np.array_equal(m1.weights, m2.weights) and m1.bias == m2.bias


def test_spark_batch_predict_not_per_row(spark):
    """The accumulator counts BATCH predicts: with hundreds of rows across a
    few partitions, the model must run orders of magnitude fewer times than
    the row count (never per row), and scores must equal the driver-side
    numpy computation exactly."""
    model = train_default_model()
    texts, _ = synthetic_training_set(300)
    rows = [(f"u{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "url string, text string").repartition(4)
    counter = spark.sparkContext.accumulator(0)
    got = {r.url: r.quality_proba for r in
           score_text_quality(df, model, batch_counter=counter).collect()}
    assert len(got) == len(rows)
    assert 0 < counter.value <= 8  # ≤ partitions × arrow-batches, ≪ 300 rows
    want = model.predict_proba(features_frame(pd.Series(texts)))
    for (url, _), w in zip(rows, want):
        assert got[url] == round(float(w), 6)


def test_broadcast_ships_weights_not_closure_heavy_state(spark):
    """Scoring works on a model reconstructed from broadcast weights — the
    executor-side object is a fresh LogisticModel per task."""
    model = train_default_model()
    df = spark.createDataFrame([("a", "the quick brown fox jumps")], "url string, text string")
    out = score_text_quality(df, model).collect()
    assert len(out) == 1 and out[0].is_good
    # driver model untouched by executor-side predicts
    assert isinstance(model, LogisticModel)


def test_model_save_load_roundtrip(tmp_path):
    from dedoc_spark.operators.classifier import load_model, save_model

    m = train_default_model()
    path = str(tmp_path / "model.json")
    save_model(m, path)
    m2 = load_model(path)
    texts, _ = synthetic_training_set(40)
    X = features_frame(pd.Series(texts))
    assert np.array_equal(m.predict_proba(X), m2.predict_proba(X))
