"""Trained open stand-ins for the pickled line classifiers
(operators/line_labeler.py; reference artifacts are internal, VERDICT r4
"Next round" #8). Held-out accuracy must beat the regex stand-in on the
noisy corpus and match it on the clean one; the model drops into the
extractors through the existing ``labels`` argument."""

import numpy as np

from dedoc_spark.operators.line_labeler import (
    FEATURE_NAMES,
    line_features,
    load_labeler,
    predict_labels_with_model,
    save_labeler,
    train_line_labeler,
)


def test_features_shape_and_determinism():
    texts = ["Статья 1. Общие положения", "1. Первый пункт.", "", "а) подпункт;"]
    X1 = line_features(texts)
    X2 = line_features(texts)
    assert X1.shape == (4, len(FEATURE_NAMES))
    assert np.array_equal(X1, X2)
    named = FEATURE_NAMES.index("named_regexp")
    assert X1[0, named] == 1.0 and X1[1, named] == 0.0


def test_trained_beats_regex_on_noise_matches_on_clean():
    for doctype in ("law", "tz", "diploma"):
        _, clean = train_line_labeler(doctype, noisy=False)
        assert clean["model_accuracy"] >= clean["regex_accuracy"] - 0.01, clean
        assert clean["model_accuracy"] >= 0.97, clean
        _, noisy = train_line_labeler(doctype, noisy=True)
        assert noisy["model_accuracy"] > noisy["regex_accuracy"], noisy
        assert noisy["model_accuracy"] >= 0.95, noisy


def test_training_is_deterministic():
    m1, r1 = train_line_labeler("law")
    m2, r2 = train_line_labeler("law")
    assert r1 == r2
    assert np.array_equal(m1.weights, m2.weights)


def test_save_load_roundtrip(tmp_path):
    model, _ = train_line_labeler("tz")
    path = str(tmp_path / "tz_labeler.json")
    save_labeler(model, path)
    loaded = load_labeler(path)
    texts = ["1. Введение ...... 3", "Раздел 1. Общие положения", "просто текст"]
    assert loaded.predict(texts) == model.predict(texts)


def test_model_swaps_into_extractor_via_labels_arg():
    """The ``labels`` argument contract: on a clean law fixture the trained
    model's labels reproduce the regex stand-in's structure exactly."""
    from dedoc_spark.core.law_structure import extract_law_structure
    from dedoc_spark.core.model import Line

    texts = [
        "ФЕДЕРАЛЬНЫЙ ЗАКОН",
        "О порядке",
        "Статья 1. Общие положения",
        "1. Первый пункт закона.",
        "а) первый подпункт;",
        "Статья 2. Прочее",
        "Президент Российской Федерации",
    ]
    model, _ = train_line_labeler("law")
    with_model = extract_law_structure(
        [Line(line=t) for t in texts],
        labels=predict_labels_with_model(model, [Line(line=t) for t in texts]),
    )
    with_regex = extract_law_structure([Line(line=t) for t in texts])
    def shape(lines):
        return [
            (ln.line, (ln.hl.level_1, ln.hl.level_2, ln.hl.line_type) if ln.hl else None)
            for ln in lines
        ]

    assert shape(with_model) == shape(with_regex)


def test_use_trained_labelers_param():
    """use_trained_labelers routes extract_document's law/tz/diploma label
    predictions through the trained models; on clean fixtures the output
    matches the regex stand-in byte-for-byte (clean accuracy 1.0), and
    the default (param off) is the unchanged regex path."""
    from dedoc_spark.core.document import extract_document

    text = (
        "ФЕДЕРАЛЬНЫЙ ЗАКОН\n"
        "О порядке\n"
        "Статья 1. Общие положения\n"
        "1. Первый пункт закона.\n"
        "а) первый подпункт;\n"
        "Президент Российской Федерации\n"
    )
    base = extract_document("law.txt", text.encode(), None, params={"document_type": "law"})
    trained = extract_document(
        "law.txt", text.encode(), None,
        params={"document_type": "law", "use_trained_labelers": "true"},
    )
    assert trained["error"] is None
    assert trained["text_extracted"] == base["text_extracted"]
    assert trained["tree_json"] == base["tree_json"]


def test_packaged_artifacts_exist_and_match_training():
    """Build-time artifacts (scripts/train_labelers.py → dedoc_spark/
    models/) are what get_labeler loads — and training is deterministic,
    so a fresh train reproduces the packaged weights exactly."""
    import os

    import numpy as np

    from dedoc_spark.operators.line_labeler import (
        get_labeler,
        load_labeler,
        packaged_model_path,
        train_line_labeler,
    )

    for doctype in ("law", "tz", "diploma"):
        path = packaged_model_path(doctype)
        assert os.path.isfile(path), f"run scripts/train_labelers.py ({path})"
        packaged = load_labeler(path)
        fresh = train_line_labeler(doctype)[0]
        np.testing.assert_allclose(packaged.weights, fresh.weights, atol=1e-12)
        np.testing.assert_allclose(packaged.bias, fresh.bias, atol=1e-12)
        assert packaged.classes == fresh.classes
        assert get_labeler(doctype).classes == packaged.classes


def test_workers_load_identical_weights_without_training(spark):
    """Ship-once discipline (VERDICT r5 #2): every python worker resolves
    get_labeler from the packaged artifact — identical weights on each,
    and no train_line_labeler call on the worker path."""
    import hashlib

    from pyspark.sql import functions as F

    def probe(it):
        import pandas as pd

        from dedoc_spark.operators import line_labeler as ll

        # fail loudly if any worker falls back to training
        def boom(*a, **k):
            raise AssertionError("train_line_labeler reached on worker path")

        ll.train_line_labeler = boom
        ll._TRAINED_CACHE.clear()
        for pdf in it:
            model = ll.get_labeler("law")
            digest = hashlib.md5(model.weights.tobytes() + model.bias.tobytes()).hexdigest()
            yield pd.DataFrame({"part": [int(pdf["part"].iloc[0])], "digest": [digest]})

    df = spark.range(8).withColumnRenamed("id", "part").repartition(8, "part")
    rows = df.mapInPandas(probe, "part long, digest string").collect()
    digests = {r.digest for r in rows}
    # hash-partitioning may leave some of the 8 partitions empty — require
    # several independent workers probed and ALL agreeing on the weights
    assert len(rows) >= 2 and len(digests) == 1
