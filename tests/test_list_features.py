"""ListFeaturesExtractor family port (core/list_features.py; reference
list_features/ prefix classes + windowed extractor)."""

from dedoc_spark.core.list_features import (
    BracketPrefix,
    BulletPrefix,
    DottedPrefix,
    EmptyPrefix,
    LetterPrefix,
    get_prefix,
    list_features_one_document,
)


def test_get_prefix_dispatch_order():
    assert isinstance(get_prefix("- bullet item"), BulletPrefix)
    assert isinstance(get_prefix("а) letter item"), LetterPrefix)
    assert isinstance(get_prefix("1) bracket item"), BracketPrefix)
    assert isinstance(get_prefix("1.2.1 dotted item"), DottedPrefix)
    assert isinstance(get_prefix("plain text"), EmptyPrefix)
    # get_prefix lowercases: uppercase letter items still match
    assert isinstance(get_prefix("А) upper"), LetterPrefix)


def test_predecessor_semantics():
    # dotted (dotted_prefix.py:15-34, all three branches)
    assert get_prefix("1.2.1 x").predecessor(get_prefix("1.1.1 x")) is False
    assert get_prefix("2.2. x").predecessor(get_prefix("2.1. x"))
    assert get_prefix("1.2.1 x").predecessor(get_prefix("1.2. x"))  # first child
    assert get_prefix("1.3. x").predecessor(get_prefix("1.2.5. x"))  # deeper other
    # bracket: exactly +1
    assert get_prefix("2) x").predecessor(get_prefix("1) x"))
    assert not get_prefix("3) x").predecessor(get_prefix("1) x"))
    # letter: one ordinal apart, with the ё-between-е-and-ж order quirk
    assert get_prefix("б) x").predecessor(get_prefix("а) x"))
    assert get_prefix("ж) x").predecessor(get_prefix("ё) x"))
    assert get_prefix("ё) x").predecessor(get_prefix("е) x"))
    assert not get_prefix("г) x").predecessor(get_prefix("а) x"))
    # bullets: identical glyph only
    assert get_prefix("- x").predecessor(get_prefix("- y"))
    assert not get_prefix("- x").predecessor(get_prefix("• y"))
    # empty is never a predecessor
    assert not get_prefix("plain").predecessor(get_prefix("1) x"))


def test_window_features_fractions():
    texts = ["1. one", "2. two", "3. three", "prose line", "1) other list"]
    feats = list_features_one_document(texts, window_size=25)
    # "2. two" has predecessors/successors "1. one" and "3. three" among 4
    # neighbors → 2 / (4+1) = 0.4 (reference normalizes by window+1)
    assert feats[1]["predecessor_num_25"] == 2 / 5
    # prose line: no predecessors anywhere
    assert feats[3]["predecessor_num_25"] == 0.0
    # zero indents → every neighbor same-indent: 4/5
    assert feats[0]["same_indent_25"] == 4 / 5
    assert feats[1]["predecessor_num_same_indent_25"] == 2 / 5
