"""Broadcast-model batch classifier — the worked example of the pattern the
reference uses for its XGBoost txt-layer-correctness model
(pdf_auto_reader/txtlayer_classifier.py:26-57 loads one model and predicts
over a whole feature DataFrame; features per
txtlayer_feature_extractor.py:10-60).

Spark shape: the trained model (a plain numpy weight vector) is broadcast
once; a mapInPandas stage computes the feature matrix VECTORIZED per Arrow
batch and scores it with one matrix product per batch — never a per-row
model call. The same pattern drops in for any sklearn/xgboost artifact:
broadcast the pickled model, call model.predict(features) per batch.

Everything is deterministic: fixed synthetic corpus, fixed zero-init
gradient descent, no RNG.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd

FEATURE_NAMES = [
    "letters_proportion",
    "digits_proportion",
    "special_proportion",
    "trash_proportion",
    "mean_word_length",
    "mean_char_ord",
]

_SPECIAL = set("<>~!@#$%^&*_+-/\"|?.,:;'`=")


def features_frame(texts: pd.Series) -> np.ndarray:
    """Vectorized feature matrix (n_texts × len(FEATURE_NAMES)) — the
    txtlayer_feature_extractor.py proportions subset, computed with pandas
    str ops + numpy (no per-row Python in the Spark path)."""
    s = texts.fillna("").astype(str)
    length = s.str.len().clip(lower=1).to_numpy(dtype=np.float64)
    letters = s.str.count(r"[A-Za-zА-Яа-яё]").to_numpy(dtype=np.float64)
    digits = s.str.count(r"[0-9]").to_numpy(dtype=np.float64)
    special = s.str.count(r"[<>~!@#$%^&*_+\-/\"|?.,:;'`=]").to_numpy(dtype=np.float64)
    trash = s.str.count(r"[\x00-\x20\xa0-ͯ]").to_numpy(dtype=np.float64)
    # mean word length / mean char ordinal: bounded loops over short strings,
    # still batch-level numpy ops per column
    mean_word = np.array(
        [float(np.mean([len(w) for w in t.split()])) if t.split() else 0.0 for t in s],
        dtype=np.float64,
    )
    mean_ord = np.array(
        [float(np.mean([ord(c) for c in t])) if t else 0.0 for t in s], dtype=np.float64
    )
    return np.column_stack(
        [
            letters / length,
            digits / length,
            special / length,
            trash / length,
            mean_word / 10.0,
            mean_ord / 1000.0,
        ]
    )


class LogisticModel:
    """Pure-numpy logistic regression: weights + bias, batch predict."""

    def __init__(self, weights: np.ndarray, bias: float) -> None:
        self.weights = weights
        self.bias = bias
        self.batch_calls = 0  # diagnostics: how many BATCH predicts ran

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        self.batch_calls += 1
        return 1.0 / (1.0 + np.exp(-(X @ self.weights + self.bias)))


def train_logistic(
    X: np.ndarray, y: np.ndarray, epochs: int = 300, lr: float = 1.0
) -> LogisticModel:
    """Deterministic full-batch gradient descent from zero init."""
    w = np.zeros(X.shape[1], dtype=np.float64)
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * float(g.mean())
    return LogisticModel(w, b)


def synthetic_training_set(n: int = 200) -> Tuple[List[str], List[int]]:
    """Deterministic good-text vs extraction-garbage corpus (the two classes
    the reference's txt-layer model separates: real text layer vs mojibake)."""
    words = "the quick brown fox jumps over lazy dog spark extract document text layer".split()
    goods, bads = [], []
    for i in range(n // 2):
        goods.append(" ".join(words[(i + j) % len(words)] for j in range(8 + i % 5)))
        # garbage: control chars, symbol soup, digit runs — deterministic
        bads.append(
            "".join(chr(33 + ((i * 7 + j * 13) % 14)) for j in range(30))
            + chr(1) * (i % 4)
            + str(i) * 3
        )
    texts = goods + bads
    labels = [1] * len(goods) + [0] * len(bads)
    return texts, labels


def save_model(model: LogisticModel, path: str) -> None:
    """Persist as JSON (the same artifact shape the reference downloads for
    its XGBoost txtlayer model — a json file loaded once per process,
    txtlayer_classifier.py:30-38)."""
    import json

    with open(path, "w") as f:
        json.dump({"weights": model.weights.tolist(), "bias": model.bias,
                   "features": FEATURE_NAMES}, f)


def load_model(path: str) -> LogisticModel:
    import json

    with open(path) as f:
        d = json.load(f)
    if d.get("features") != FEATURE_NAMES:
        raise ValueError("model trained on a different feature set")
    return LogisticModel(np.asarray(d["weights"], dtype=np.float64), float(d["bias"]))


def train_default_model() -> LogisticModel:
    texts, labels = synthetic_training_set()
    X = features_frame(pd.Series(texts))
    return train_logistic(X, np.array(labels, dtype=np.float64))


def score_text_quality(df, model: LogisticModel, text_col: str = "text", id_col: str = "url", batch_counter=None):
    """Broadcast-model scoring stage: one Arrow batch → one feature matrix →
    one matrix product. Returns (id_col, quality_proba, is_good).

    batch_counter: optional Spark accumulator incremented once per BATCH
    predict — lets tests assert the model is never called per row."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((model.weights, model.bias))
    id_type = df.schema[id_col].dataType.simpleString()

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, b = bc.value
        local = LogisticModel(w, b)
        for pdf in it:
            X = features_frame(pdf[text_col])
            proba = local.predict_proba(X)
            if batch_counter is not None:
                batch_counter.add(1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "quality_proba": np.round(proba, 6),
                    "is_good": proba >= 0.5,
                }
            )

    schema = f"{id_col} {id_type}, quality_proba double, is_good boolean"
    return df.select(id_col, text_col).mapInPandas(fn, schema)
