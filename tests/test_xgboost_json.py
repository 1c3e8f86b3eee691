"""Pure-numpy XGBoost-JSON inference (operators/xgboost_json.py).

The reference's classifiers are PUBLIC XGBClassifier artifacts
(huggingface.co/dedoc/line_type_classifiers, zip of classifier.json +
parameters.json — abstract_pickled_classifier.py:25-52); these tests
exercise every accepted shape with in-repo fixtures and cross-check the
vectorized traversal against an independent per-row walker."""

import io
import json
import math
import random
import zipfile

import numpy as np
import pytest

from dedoc_spark.operators.xgboost_json import XGBoostJsonModel, load_xgboost_json


def _tree_arrays(left, right, default_left, split_idx, split_cond):
    return {
        "left_children": left,
        "right_children": right,
        "default_left": default_left,
        "split_indices": split_idx,
        "split_conditions": split_cond,
    }


def _save_model_doc(trees, tree_info, num_class, objective, base_score=0.5,
                    num_feature=None, attributes=None):
    lmp = {"num_class": str(num_class), "base_score": str(base_score)}
    if num_feature is not None:
        lmp["num_feature"] = str(num_feature)
    return {
        "learner": {
            "attributes": attributes or {},
            "learner_model_param": lmp,
            "objective": {"name": objective},
            "gradient_booster": {
                "name": "gbtree",
                "model": {"trees": trees, "tree_info": tree_info},
            },
        },
        "version": [2, 0, 0],
    }


# one stump: x0 < 1.0 ? -0.4 : 0.7, missing goes left
STUMP = _tree_arrays([1, -1, -1], [2, -1, -1], [1, 0, 0], [0, 0, 0], [1.0, -0.4, 0.7])


def test_binary_logistic_stump_with_base_score_transform():
    """binary:logistic margins add logit(base_score); sklearn-shaped
    proba [1-p, p]."""
    doc = _save_model_doc([STUMP], [0], 0, "binary:logistic", base_score=0.75)
    model, params = load_xgboost_json(doc)
    assert params == {}
    X = np.array([[0.0], [2.0], [np.nan]])
    base = math.log(0.75 / 0.25)
    expected = [base - 0.4, base + 0.7, base - 0.4]  # NaN → default_left
    np.testing.assert_allclose(model.predict_margin(X)[:, 0], expected)
    proba = model.predict_proba(X)
    np.testing.assert_allclose(proba[:, 1], 1 / (1 + np.exp(-np.array(expected))))
    np.testing.assert_allclose(proba.sum(axis=1), 1.0)
    # logit(0.75)≈1.10 keeps every margin positive → class "1" throughout
    assert model.predict(X) == ["1", "1", "1"]
    # with the neutral base_score the stump's own sign decides
    neutral, _ = load_xgboost_json(
        _save_model_doc([STUMP], [0], 0, "binary:logistic", base_score=0.5)
    )
    assert neutral.predict(X) == ["0", "1", "0"]


def test_multiclass_softprob_tree_info_grouping():
    """multi:softprob sums each tree into its tree_info class; softmax is
    shift-invariant so the identity base_score drops out."""
    t0 = _tree_arrays([-1], [-1], [0], [0], [2.0])   # class 0: +2
    t1 = _tree_arrays([-1], [-1], [0], [0], [0.5])   # class 1: +0.5
    t2 = _tree_arrays([-1], [-1], [0], [0], [1.0])   # class 0 again: +1
    doc = _save_model_doc([t0, t1, t2], [0, 1, 0], 2, "multi:softprob")
    model, _ = load_xgboost_json(doc, classes=["alpha", "beta"])
    X = np.zeros((1, 3))
    m = model.predict_margin(X)[0]
    np.testing.assert_allclose(m, [0.5 + 3.0, 0.5 + 0.5])
    p = model.predict_proba(X)[0]
    z = np.exp([3.0, 0.5])
    np.testing.assert_allclose(p, z / z.sum())
    assert model.predict(X) == ["alpha"]


def test_dump_format_matches_save_model_format():
    """The nested get_dump(dump_format='json') encoding of the same stump
    predicts identically to the flat save_model encoding."""
    dump = [
        {
            "nodeid": 0,
            "split": "f0",
            "split_condition": 1.0,
            "yes": 1,
            "no": 2,
            "missing": 1,
            "children": [{"nodeid": 1, "leaf": -0.4}, {"nodeid": 2, "leaf": 0.7}],
        }
    ]
    flat_model, _ = load_xgboost_json(
        _save_model_doc([STUMP], [0], 0, "binary:logistic")
    )
    dump_model, _ = load_xgboost_json(dump, objective="binary:logistic", num_class=1)
    X = np.array([[0.0], [2.0], [np.nan], [0.999], [1.0]])
    np.testing.assert_allclose(
        dump_model.predict_margin(X), flat_model.predict_margin(X)
    )


def test_reference_zip_artifact_shape():
    """The huggingface dedoc/line_type_classifiers layout: a zip holding
    classifier.json + parameters.json loads in one call; class names come
    from parameters.json's 'classes' (or the caller)."""
    doc = _save_model_doc([STUMP], [0], 0, "binary:logistic", num_feature=1)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("classifier.json", json.dumps(doc))
        zf.writestr(
            "parameters.json", json.dumps({"window_size": 25, "classes": ["no", "yes"]})
        )
    model, params = load_xgboost_json(buf.getvalue())
    assert params["window_size"] == 25
    assert model.classes == ["no", "yes"]
    assert model.num_feature == 1
    assert model.predict(np.array([[5.0]])) == ["yes"]
    with pytest.raises(ValueError, match="features"):
        model.predict_margin(np.zeros((1, 3)))


def test_sklearn_attribute_classes_restored():
    doc = _save_model_doc(
        [STUMP], [0], 0, "binary:logistic",
        attributes={"scikit_learn": json.dumps({"classes_": ["raw_text", "header"]})},
    )
    model, _ = load_xgboost_json(doc)
    assert model.classes == ["raw_text", "header"]


def _walk_one(tree, row):
    """Independent scalar traversal straight from the documented format."""
    i = 0
    while tree["left_children"][i] != -1:
        v = row[tree["split_indices"][i]]
        if math.isnan(v):
            go_left = bool(tree["default_left"][i])
        else:
            go_left = v < tree["split_conditions"][i]
        i = tree["left_children"][i] if go_left else tree["right_children"][i]
    return tree["split_conditions"][i]


def _random_tree(rng, n_features, depth):
    """Complete binary tree of the given depth in save_model layout."""
    n_internal = 2 ** depth - 1
    n_nodes = 2 ** (depth + 1) - 1
    left, right, dl, si, sc = [], [], [], [], []
    for i in range(n_nodes):
        if i < n_internal:
            left.append(2 * i + 1)
            right.append(2 * i + 2)
            dl.append(rng.randint(0, 1))
            si.append(rng.randrange(n_features))
            sc.append(round(rng.uniform(-2, 2), 3))
        else:
            left.append(-1)
            right.append(-1)
            dl.append(0)
            si.append(0)
            sc.append(round(rng.uniform(-1, 1), 3))
    return _tree_arrays(left, right, dl, si, sc)


def test_vectorized_traversal_matches_scalar_walker():
    """200 random rows (with NaNs) × 12 random depth-3 trees × 3 classes:
    the vectorized numpy traversal agrees with the scalar reference
    walker on every (row, tree) margin."""
    rng = random.Random(20260817)
    n_features, n_class = 6, 3
    trees = [_random_tree(rng, n_features, 3) for _ in range(12)]
    tree_info = [i % n_class for i in range(12)]
    doc = _save_model_doc(trees, tree_info, n_class, "multi:softprob")
    model, _ = load_xgboost_json(doc)
    X = np.array(
        [
            [
                float("nan") if rng.random() < 0.15 else rng.uniform(-3, 3)
                for _ in range(n_features)
            ]
            for _ in range(200)
        ]
    )
    got = model.predict_margin(X)
    for r in range(X.shape[0]):
        want = [0.5] * n_class
        for tree, g in zip(trees, tree_info):
            want[g] += _walk_one(tree, X[r])
        np.testing.assert_allclose(got[r], want, rtol=1e-12)


def test_load_labeler_dispatches_xgboost_artifacts(tmp_path):
    """operators.line_labeler.load_labeler accepts the XGBoost shapes
    beside its own softmax JSON and returns a predict(texts) labeler —
    the extractors' ``labels`` hook needs nothing else."""
    from dedoc_spark.operators.line_labeler import FEATURE_NAMES, load_labeler

    nf = len(FEATURE_NAMES)
    # stump on feature 0 (line_id_norm): first-half lines → 'header'
    stump = _tree_arrays([1, -1, -1], [2, -1, -1], [1, 0, 0], [0, 0, 0], [0.5, 1.0, -1.0])
    doc = _save_model_doc(
        [stump], [0], 0, "binary:logistic", num_feature=nf,
        attributes={"scikit_learn": json.dumps({"classes_": ["raw_text", "header"]})},
    )
    zpath = tmp_path / "law.zip"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("classifier.json", json.dumps(doc))
        zf.writestr("parameters.json", "{}")
    zpath.write_bytes(buf.getvalue())

    labeler = load_labeler(str(zpath))
    labels = labeler.predict(["первая строка", "вторая", "третья", "четвертая"])
    assert labels == ["header", "header", "raw_text", "raw_text"]

    jpath = tmp_path / "law.json"
    jpath.write_text(json.dumps(doc))
    assert load_labeler(str(jpath)).predict(["a", "b"]) == ["header", "raw_text"]
