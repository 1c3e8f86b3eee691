"""Trained open stand-ins for the reference's pickled line classifiers.

The reference labels document lines (law/foiv_law: structure_unit /
application / cellar / raw_text; tz: toc / item / raw_text; diploma:
named_item / list_item / title / raw_text) with downloaded XGBoost
artifacts (abstract_pickled_classifier.py:25-52) that are internal to the
reference project. The repo's extractors therefore ship deterministic
REGEX stand-ins (law_structure.predict_law_labels,
tz_diploma.predict_tz_labels / predict_diploma_labels) and accept a
``labels`` argument so a trained model can drop in.

This module provides that trained drop-in, built entirely from public
knowledge: a pure-numpy multinomial logistic model over a text-only port
of the reference's own line features (law_text_features.py:88-177 —
ends-with punctuation, bracket balance, roman/named/item/subitem starts,
application-begin, char-class percentages, prev-line context,
lines_from_named) plus a few case/spacing-LENIENT variants of the same
signals (documented additions: the strict reference regexps break under
OCR-ish noise — e.g. ``named_regexp`` rejects "СТАТЬЯ 5." because it
requires "Статья" capitalization — and the lenient features let the
model degrade gracefully where the regex stand-in cannot).

Training corpora are synthesized deterministically from the label
grammar of each doctype (the generator KNOWS the true class of every
line it emits, so held-out accuracy is meaningful and not circular with
the regex rules), with a noise channel that perturbs case, spacing and
trailing text. ``train_line_labeler`` reports held-out accuracy of the
trained model AND of the regex stand-in on the same lines — the table
in COVERAGE.md is generated from exactly this function.

Everything here is numpy/pandas only — no Spark imports — so the same
model runs in unit tests and inside mapInPandas via a broadcast.
"""

from __future__ import annotations

import json
import os
import random
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# --- features ----------------------------------------------------------------

# strict reference regexps (cited ports live in core/law_structure.py)
from dedoc_spark.core.law_structure import (
    _CELLAR_RE,
    named_regexp,
    regexp_application_begin,
    regexps_item_with_bracket,
    regexps_subitem,
    roman_regexp,
)

_YEAR_RE = re.compile(r"(19\d{2}|20\d{2})")  # utils_reg regexps_year shape
_ITEM_RE = re.compile(r"^\s*(\d{1,3}\.)+\s*[a-zA-Zа-яА-ЯёЁ]")
# lenient variants (additions, see module docstring)
_LENIENT_NAMED_RE = re.compile(r"^\s*(статья|глава|часть|раздел)\b")
_LENIENT_APP_RE = re.compile(r"^\s*[\"']?(приложение|утвержден)")
_LENIENT_CELLAR_RE = re.compile(
    r"^\s*(президент|председатель|министр|мэр|губернатор|врио|москва, кремль)"
)
_LENIENT_ITEM_RE = re.compile(r"^\s*\d{1,3}\s*[.)}]")
_LENIENT_SUBITEM_RE = re.compile(r"^\s*[а-яё]\s*[)}]")
_BULLET_RE = re.compile(r"^\s*(-|—|−|–|•|\*|●|>)\s")
_ENDS_NUM_RE = re.compile(r"\d+\s*$")
_DOTS_LEADER_RE = re.compile(r"\.{3,}|(\. ){3,}")

FEATURE_NAMES: List[str] = [
    # reference one-line features (law_text_features.py:117-177, text-only)
    "line_id_norm",
    "lines_from_named",
    "num_year_regexp",
    "endswith_dot",
    "endswith_semicolon",
    "endswith_colon",
    "endswith_comma",
    "startswith_bracket",
    "bracket_num",
    "roman_regexp",
    "startswith_quote",
    "year_regexp",
    "regexp_application_begin",
    "named_regexp",
    "item_regexp",
    "subitem_regexp",
    "subitem_regexp_len",
    "subitem_regexp_num",
    "supper_percent",
    "letter_percent",
    "number_percent",
    "is_capitalized",
    # reference prev-line context (law_text_features.py:88-115)
    "prev_line_ends",
    "prev_ends_with_colon",
    "prev_starts_with_article",
    "prev_is_space",
    # lenient additions (noise robustness, module docstring)
    "lenient_named",
    "lenient_application",
    "lenient_cellar",
    "lenient_item",
    "lenient_subitem",
    "bullet_start",
    "ends_with_number",
    "dots_leader",
    "len_norm",
    # ListFeaturesExtractor window features (core/list_features.py port of
    # list_features_extractor.py:48-86 — the reference concatenates these
    # onto the text features, law_text_features.py:52-53)
    "same_indent_25",
    "predecessor_num_same_indent_25",
    "predecessor_num_25",
]


def line_features(texts: Sequence[str]) -> np.ndarray:
    """Feature matrix for one DOCUMENT's lines, in order (context features
    need the sequence)."""
    from dedoc_spark.core.list_features import list_features_one_document

    n = len(texts)
    X = np.zeros((n, len(FEATURE_NAMES)), dtype=np.float64)
    col = {name: i for i, name in enumerate(FEATURE_NAMES)}
    window_feats = list_features_one_document(texts)
    lines_from_named = 0
    for i, raw in enumerate(texts):
        strip = raw.strip()
        low = raw.lower()
        low_strip = strip.lower()
        length = len(strip) + 1
        if named_regexp.match(strip):
            lines_from_named = 0
        row = X[i]
        row[col["line_id_norm"]] = i / max(n, 1)
        row[col["lines_from_named"]] = min(lines_from_named, 20) / 20.0
        lines_from_named += 1
        row[col["num_year_regexp"]] = len(_YEAR_RE.findall(raw))
        row[col["endswith_dot"]] = float(strip.endswith("."))
        row[col["endswith_semicolon"]] = float(strip.endswith(";"))
        row[col["endswith_colon"]] = float(strip.endswith(":"))
        row[col["endswith_comma"]] = float(strip.endswith(","))
        row[col["startswith_bracket"]] = float(strip.startswith(("(", "{")))
        bracket_cnt = 0
        for ch in raw:
            if ch == "(":
                bracket_cnt += 1
            elif ch == ")":
                bracket_cnt = max(0, bracket_cnt - 1)
        row[col["bracket_num"]] = bracket_cnt
        row[col["roman_regexp"]] = float(bool(roman_regexp.match(raw)) and len(strip) > 3)
        row[col["startswith_quote"]] = float(strip.startswith(('"', "'", "«")))
        row[col["year_regexp"]] = float("год" in low)
        row[col["regexp_application_begin"]] = float(
            bool(regexp_application_begin.match(low_strip))
        )
        row[col["named_regexp"]] = float(bool(named_regexp.match(strip)))
        row[col["item_regexp"]] = float(
            bool(_ITEM_RE.match(low)) or bool(regexps_item_with_bracket.match(low))
        )
        m = regexps_subitem.match(raw)
        row[col["subitem_regexp"]] = float(bool(regexps_subitem.match(low)))
        if m:
            row[col["subitem_regexp_len"]] = len(m.group())
            row[col["subitem_regexp_num"]] = ord(m.group().strip()[:-1]) - ord("а")
        row[col["supper_percent"]] = sum(1 for c in strip if c.isupper()) / length
        row[col["letter_percent"]] = sum(1 for c in strip if c.isalpha()) / length
        row[col["number_percent"]] = sum(1 for c in strip if c.isnumeric()) / length
        row[col["is_capitalized"]] = float(bool(strip) and strip[0].isupper())
        if i >= 1:
            prev = texts[i - 1]
            row[col["prev_line_ends"]] = float(prev.endswith((".", ";")))
            row[col["prev_ends_with_colon"]] = float(prev.endswith(":"))
            row[col["prev_starts_with_article"]] = float(
                prev.lower().strip().startswith("статья")
            )
            row[col["prev_is_space"]] = float(bool(prev) and prev.isspace())
        row[col["lenient_named"]] = float(bool(_LENIENT_NAMED_RE.match(low)))
        row[col["lenient_application"]] = float(bool(_LENIENT_APP_RE.match(low_strip)))
        row[col["lenient_cellar"]] = float(bool(_LENIENT_CELLAR_RE.match(low_strip)))
        row[col["lenient_item"]] = float(bool(_LENIENT_ITEM_RE.match(raw)))
        row[col["lenient_subitem"]] = float(bool(_LENIENT_SUBITEM_RE.match(low)))
        row[col["bullet_start"]] = float(bool(_BULLET_RE.match(raw)))
        row[col["ends_with_number"]] = float(bool(_ENDS_NUM_RE.search(strip)))
        row[col["dots_leader"]] = float(bool(_DOTS_LEADER_RE.search(strip)))
        row[col["len_norm"]] = min(len(strip), 200) / 200.0
        for name, value in window_feats[i].items():
            row[col[name]] = value
    return X


# --- model -------------------------------------------------------------------


class SoftmaxModel:
    """Pure-numpy multinomial logistic regression over line_features."""

    def __init__(self, weights: np.ndarray, bias: np.ndarray, classes: List[str]) -> None:
        self.weights = weights  # (n_features, n_classes)
        self.bias = bias  # (n_classes,)
        self.classes = classes

    def predict(self, texts: Sequence[str]) -> List[str]:
        if not texts:
            return []
        X = line_features(texts)
        scores = X @ self.weights + self.bias
        return [self.classes[int(k)] for k in scores.argmax(axis=1)]


def train_softmax(
    X: np.ndarray,
    y: np.ndarray,
    classes: List[str],
    epochs: int = 400,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> SoftmaxModel:
    """Deterministic full-batch gradient descent from zero init (same
    discipline as classifier.train_logistic)."""
    n, f = X.shape
    k = len(classes)
    W = np.zeros((f, k), dtype=np.float64)
    b = np.zeros(k, dtype=np.float64)
    Y = np.zeros((n, k), dtype=np.float64)
    Y[np.arange(n), y] = 1.0
    for _ in range(epochs):
        z = X @ W + b
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - Y) / n
        W -= lr * (X.T @ g + l2 * W)
        b -= lr * g.sum(axis=0)
    return SoftmaxModel(W, b, list(classes))


def save_labeler(model: SoftmaxModel, path: str) -> None:
    with open(path, "w") as f:
        json.dump(
            {
                "weights": model.weights.tolist(),
                "bias": model.bias.tolist(),
                "classes": model.classes,
                "features": FEATURE_NAMES,
            },
            f,
        )


class XGBLineLabeler:
    """Adapter that makes an XGBoost-JSON artifact speak the labeler
    protocol (``predict(texts) -> labels``) expected by the extractors'
    ``labels`` argument.  ``feature_fn(texts) -> (n, f) matrix`` defaults
    to this module's line_features; a user replaying the reference's
    public artifacts (huggingface.co/dedoc/line_type_classifiers)
    supplies the reference feature extractor's output instead — the
    model's declared num_feature is checked either way."""

    def __init__(self, model, feature_fn=None) -> None:
        self.model = model
        self.classes = model.classes
        self._feature_fn = feature_fn or line_features

    def predict(self, texts: Sequence[str]) -> List[str]:
        if not texts:
            return []
        return self.model.predict(self._feature_fn(texts))


def load_labeler(path: str, feature_fn=None):
    """Load a serialized labeler: this module's softmax JSON, or any
    public XGBoost artifact shape (save_model JSON / dump list / the
    reference's classifier.json+parameters.json zip) via
    operators.xgboost_json — both come back speaking ``predict(texts)``,
    so either drops into the extractors' ``labels`` hook."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head == b"PK\x03\x04":
        from dedoc_spark.operators.xgboost_json import load_xgboost_json

        return XGBLineLabeler(load_xgboost_json(path)[0], feature_fn)
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, list) or (isinstance(d, dict) and "learner" in d):
        from dedoc_spark.operators.xgboost_json import load_xgboost_json

        return XGBLineLabeler(load_xgboost_json(d)[0], feature_fn)
    if d.get("features") != FEATURE_NAMES:
        raise ValueError("labeler trained on a different feature set")
    return SoftmaxModel(
        np.asarray(d["weights"], dtype=np.float64),
        np.asarray(d["bias"], dtype=np.float64),
        list(d["classes"]),
    )


# --- synthetic corpora -------------------------------------------------------

_LAW_BODY_WORDS = (
    "федеральный закон настоящий порядок установленный орган власти субъект "
    "российской федерации правовой акт норма требование определяет вступает "
    "силу действие пункт условия документы представление сведения контроль"
).split()


def _sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_LAW_BODY_WORDS) for _ in range(n_words))


def _noise(rng: random.Random, text: str, noisy: bool) -> str:
    """OCR-ish perturbations the strict reference regexps do not survive:
    full-uppercase flips, a space wedged into the list marker, trailing
    page junk after an application line."""
    if not noisy:
        return text
    roll = rng.random()
    if roll < 0.25:
        return text.upper()
    if roll < 0.45:
        m = re.match(r"^(\s*\d+)([.)])(\s*)(.*)$", text)
        if m:
            return f"{m.group(1)} {m.group(2)}{m.group(3) or ' '}{m.group(4)}"
        return text
    if roll < 0.6:
        return text + "  " + str(rng.randint(1, 99))
    if roll < 0.75:
        return "  " + text
    return text


def synthetic_law_corpus(
    n_docs: int = 160, noisy: bool = True, seed: int = 17
) -> List[Tuple[List[str], List[str]]]:
    """Deterministic law-shaped documents with construction-time labels
    (structure_unit / application / cellar / raw_text)."""
    rng = random.Random(seed)
    docs: List[Tuple[List[str], List[str]]] = []
    for _ in range(n_docs):
        lines: List[str] = []
        labels: List[str] = []

        def emit(text: str, label: str, noisy_ok: bool = True) -> None:
            lines.append(_noise(rng, text, noisy and noisy_ok))
            labels.append(label)

        emit("ФЕДЕРАЛЬНЫЙ ЗАКОН", "raw_text", noisy_ok=False)
        emit(f"О внесении изменений в статью {rng.randint(1, 99)}", "raw_text")
        for art in range(1, rng.randint(2, 5)):
            emit(f"Статья {art}. {_sentence(rng, 3).capitalize()}", "structure_unit")
            for item in range(1, rng.randint(2, 5)):
                emit(f"{item}. {_sentence(rng, rng.randint(6, 14)).capitalize()}.", "structure_unit")
                if rng.random() < 0.4:
                    emit(f"{chr(ord('а') + rng.randint(0, 5))}) {_sentence(rng, 6)};", "structure_unit")
            if rng.random() < 0.5:
                emit(_sentence(rng, rng.randint(8, 16)).capitalize() + ".", "raw_text")
        emit("Президент Российской Федерации", "cellar")
        emit("Москва, Кремль", "cellar")
        if rng.random() < 0.7:
            emit(f"Приложение № {rng.randint(1, 9)}", "application")
            emit(f"{_sentence(rng, 10).capitalize()}.", "raw_text")
            emit(f"1. {_sentence(rng, 8).capitalize()}.", "structure_unit")
        docs.append((lines, labels))
    return docs


def synthetic_tz_corpus(
    n_docs: int = 160, noisy: bool = True, seed: int = 29
) -> List[Tuple[List[str], List[str]]]:
    """Deterministic tz-shaped documents (toc / item / raw_text)."""
    rng = random.Random(seed)
    docs: List[Tuple[List[str], List[str]]] = []
    for _ in range(n_docs):
        lines: List[str] = []
        labels: List[str] = []

        def emit(text: str, label: str, noisy_ok: bool = True) -> None:
            lines.append(_noise(rng, text, noisy and noisy_ok))
            labels.append(label)

        emit("ТЕХНИЧЕСКОЕ ЗАДАНИЕ", "raw_text", noisy_ok=False)
        emit("Содержание", "raw_text", noisy_ok=False)
        n_sections = rng.randint(3, 6)
        for s in range(1, n_sections + 1):
            # toc rows end with a page number after a dots leader — noise
            # here must not strip that invariant, so emit them clean
            emit(f"{s}. {_sentence(rng, 3).capitalize()} {'.' * rng.randint(4, 12)} {s + 2}", "toc", noisy_ok=False)
        for s in range(1, n_sections + 1):
            emit(f"Раздел {s}. {_sentence(rng, 3).capitalize()}", "item")
            for sub in range(1, rng.randint(2, 4)):
                emit(f"{s}.{sub} {_sentence(rng, rng.randint(5, 12)).capitalize()}", "item")
                if rng.random() < 0.5:
                    emit(f"- {_sentence(rng, 6)};", "item")
            if rng.random() < 0.6:
                emit(_sentence(rng, rng.randint(8, 18)).capitalize() + ".", "raw_text")
        docs.append((lines, labels))
    return docs


def synthetic_diploma_corpus(
    n_docs: int = 160, noisy: bool = True, seed: int = 43
) -> List[Tuple[List[str], List[str]]]:
    """Deterministic diploma-shaped documents (title / named_item /
    list_item / raw_text)."""
    rng = random.Random(seed)
    docs: List[Tuple[List[str], List[str]]] = []
    for _ in range(n_docs):
        lines: List[str] = []
        labels: List[str] = []

        def emit(text: str, label: str, noisy_ok: bool = True) -> None:
            lines.append(_noise(rng, text, noisy and noisy_ok))
            labels.append(label)

        emit("МИНИСТЕРСТВО НАУКИ И ВЫСШЕГО ОБРАЗОВАНИЯ", "title", noisy_ok=False)
        emit("Выпускная квалификационная работа", "title", noisy_ok=False)
        emit(f"на тему {_sentence(rng, 4)}", "title", noisy_ok=False)
        for s, name in enumerate(("Введение", "Раздел 1", "Заключение"), start=1):
            emit(f"{name}" if "Раздел" not in name else f"Раздел {s}. {_sentence(rng, 2).capitalize()}", "named_item")
            for _ in range(rng.randint(1, 3)):
                emit(_sentence(rng, rng.randint(8, 16)).capitalize() + ".", "raw_text")
            if rng.random() < 0.6:
                emit(f"{s}.{rng.randint(1, 3)} {_sentence(rng, 5).capitalize()}", "list_item")
                emit(f"- {_sentence(rng, 5)};", "list_item")
        docs.append((lines, labels))
    return docs


_CORPORA = {
    "law": synthetic_law_corpus,
    "tz": synthetic_tz_corpus,
    "diploma": synthetic_diploma_corpus,
}

_CLASSES = {
    "law": ["structure_unit", "application", "cellar", "raw_text"],
    "tz": ["toc", "item", "raw_text"],
    "diploma": ["title", "named_item", "list_item", "raw_text"],
}


def _regex_standin(doctype: str, texts: Sequence[str]) -> List[str]:
    """The shipped regex stand-in for a doctype, on bare strings."""
    from dedoc_spark.core.model import Line

    lines = [Line(line=t) for t in texts]
    if doctype == "law":
        from dedoc_spark.core.law_structure import predict_law_labels

        return predict_law_labels(lines)
    if doctype == "tz":
        from dedoc_spark.core.tz_diploma import predict_tz_labels

        return predict_tz_labels(lines)
    from dedoc_spark.core.tz_diploma import predict_diploma_labels

    return predict_diploma_labels(lines)


def train_line_labeler(
    doctype: str, noisy: bool = True, holdout_frac: float = 0.25
) -> Tuple[SoftmaxModel, Dict[str, float]]:
    """Train the doctype's labeler on the synthetic corpus and report
    held-out accuracy for the trained model and the regex stand-in on the
    SAME held-out documents. Returns (model, report)."""
    docs = _CORPORA[doctype](noisy=noisy)
    classes = _CLASSES[doctype]
    split = int(len(docs) * (1 - holdout_frac))
    train_docs, test_docs = docs[:split], docs[split:]

    def matrix(ds):
        Xs, ys = [], []
        for texts, labels in ds:
            Xs.append(line_features(texts))
            ys.extend(classes.index(l) for l in labels)
        return np.vstack(Xs), np.asarray(ys, dtype=np.int64)

    Xtr, ytr = matrix(train_docs)
    model = train_softmax(Xtr, ytr, classes)

    def accuracy(pred_fn):
        hit = tot = 0
        for texts, labels in test_docs:
            preds = pred_fn(texts)
            hit += sum(1 for p, l in zip(preds, labels) if p == l)
            tot += len(labels)
        return hit / max(tot, 1)

    report = {
        "doctype": doctype,
        "n_train_lines": int(len(ytr)),
        "n_test_docs": len(test_docs),
        "model_accuracy": round(accuracy(model.predict), 4),
        "regex_accuracy": round(accuracy(lambda ts: _regex_standin(doctype, ts)), 4),
    }
    return model, report


_TRAINED_CACHE: Dict[str, SoftmaxModel] = {}

# packaged artifacts: trained ONCE at build time (scripts/train_labelers.py)
# and shipped inside the package (spark-submit --py-files), so workers load
# ~ms of JSON instead of re-running the deterministic training per python
# process (up to ~64 s of redundant CPU on a cold 32-worker executor)
MODEL_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "models")


def packaged_model_path(doctype: str) -> str:
    return os.path.abspath(os.path.join(MODEL_DIR, f"{doctype}_labeler.json"))


def get_labeler(doctype: str) -> SoftmaxModel:
    """Process-cached model per doctype — the lazy singleton the
    ``use_trained_labelers`` parameter resolves to.  Loads the packaged
    build-time artifact; training happens here ONLY if the artifact is
    missing (a source checkout that never ran scripts/train_labelers.py —
    never on the shipped mapInPandas path)."""
    if doctype not in _TRAINED_CACHE:
        path = packaged_model_path(doctype)
        if os.path.isfile(path):
            _TRAINED_CACHE[doctype] = load_labeler(path)
        else:
            _TRAINED_CACHE[doctype] = train_line_labeler(doctype)[0]
    return _TRAINED_CACHE[doctype]


def predict_labels_with_model(model: SoftmaxModel, lines) -> List[str]:
    """Adapter for the extractors' ``labels`` argument: core Line objects
    in, label strings out."""
    return model.predict([ln.line for ln in lines])
