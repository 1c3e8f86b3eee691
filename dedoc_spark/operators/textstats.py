"""Text-analysis operators: language id, quality scoring, token counting,
fingerprinting, and the structure-pattern line classifier in relational
form. All pure column expressions (JVM-side, codegen-friendly)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dedoc_spark.core.structure import (
    BRACKET_RE,
    BULLET_RE,
    DOTTED_RE,
    LETTER_RE,
    ROMAN_RE,
)
from dedoc_spark.functions import (
    digit_mask,
    lang_id,
    normalized_fingerprint,
    quality_score,
    token_count,
)


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document text statistics: lang guess, token count, quality score,
    fingerprint."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        lang_id(c).alias("lang_guess"),
        token_count(c).alias("n_tokens"),
        quality_score(c).alias("quality"),
        normalized_fingerprint(c).alias("fingerprint"),
    )


def explode_lines(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split a raw text column into (id, line_id, line) rows. line_id is the
    0-based position — computed by posexplode, not a window (no shuffle)."""
    return df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias("line_id", "line")
    )


def classify_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Relational rendering of the default structure-extractor pattern chain
    (patterns 3..7 of SURVEY.md §2.10) as one CASE WHEN over the stripped,
    lower-cased line — whole-stage codegen, no UDF."""
    t = F.lower(F.trim(F.col(line_col)))
    line_type = (
        F.when(t.rlike(DOTTED_RE.pattern), F.lit("dotted_list"))
        .when(t.rlike(ROMAN_RE.pattern), F.lit("roman_list"))
        .when(t.rlike(BRACKET_RE.pattern), F.lit("bracket_list"))
        .when(t.rlike(LETTER_RE.pattern), F.lit("letter_list"))
        .when(t.rlike(BULLET_RE.pattern), F.lit("bullet_list"))
        .when(F.length(t) == 0, F.lit("empty"))
        .otherwise(F.lit("raw_text"))
    )
    dotted_depth = F.when(
        t.rlike(DOTTED_RE.pattern),
        F.size(F.filter(F.split(F.trim(F.regexp_extract(t, DOTTED_RE.pattern, 0)), r"\."), lambda x: F.length(x) > 0)),
    ).otherwise(F.lit(-1))
    return lines.withColumn("line_type", line_type).withColumn("dotted_depth", dotted_depth)


def boilerplate_patterns(
    lines: DataFrame,
    site_col: str = "site",
    doc_col: str = "url",
    line_col: str = "line",
    pos_col: str = "line_id",
    edge_window: int = 4,
    min_frac: float = 0.4,
) -> DataFrame:
    """Site-level boilerplate voting — the web-scale generalization of the
    reference's cross-page header/footer frequency voting
    (header_footers_analysis.py:84-155): digit-masked patterns of the first
    and last ``edge_window`` lines of each document, counted across the
    documents of a site; patterns present in ≥ min_frac of the site's
    documents are boilerplate. Pure groupBy aggregation — naturally Spark.
    """
    w_max = F.max(pos_col).over(Window.partitionBy(doc_col))
    edged = (
        lines.withColumn("max_pos", w_max)
        .filter((F.col(pos_col) < edge_window) | (F.col(pos_col) > F.col("max_pos") - edge_window))
        .select(
            F.col(site_col).alias("site"),
            F.col(doc_col).alias("doc"),
            digit_mask(F.col(line_col)).alias("pattern"),
        )
        .filter(F.length("pattern") > 0)
        .distinct()
    )
    site_docs = edged.select("site", "doc").distinct().groupBy("site").agg(F.count("*").alias("n_docs"))
    pattern_docs = edged.groupBy("site", "pattern").agg(F.count("*").alias("n_with_pattern"))
    return (
        pattern_docs.join(site_docs, "site")
        .withColumn("frac", F.round(F.col("n_with_pattern") / F.col("n_docs"), 6))
        .filter((F.col("frac") >= min_frac) & (F.col("n_docs") >= 2))
        .select("site", "pattern", "n_with_pattern", "n_docs", "frac")
    )


def remove_boilerplate(lines: DataFrame, patterns: DataFrame, site_col: str = "site", line_col: str = "line") -> DataFrame:
    """Anti-join the voted patterns back onto the lines (broadcast: the
    pattern table is tiny relative to the corpus)."""
    pat = patterns.select(
        F.col("site").alias("__bp_site"), F.col("pattern").alias("__bp_pattern")
    )
    return lines.join(
        F.broadcast(pat),
        on=[
            lines[site_col] == pat["__bp_site"],
            digit_mask(lines[line_col]) == pat["__bp_pattern"],
        ],
        how="left_anti",
    )


def gopher_quality_flags(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-rules quality gate (Rae et al. 2021, §A1.1 — the published
    web-corpus filter set), fully columnar:

      50 ≤ word count ≤ 100k; 3 ≤ mean word length ≤ 10;
      symbol-to-word ratio (# or …) ≤ 0.1;
      ≥ 80% of words contain an alphabetic character;
      ≥ 2 stopword hits (of the canonical 8).

    Returns the per-rule booleans plus the conjunction ``gopher_pass`` so a
    corpus filter is one `.filter("gopher_pass")` — every expression is
    JVM-side and mirrored verbatim by the q32 oracle."""
    c = F.col(text_col)
    words = F.split(F.trim(c), r"\s+")
    n_words = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(words))
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.aggregate(words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)) / n_words
    )
    symbols = F.regexp_count(c, F.lit(r"[#…]")) + F.regexp_count(c, F.lit(r"\.\.\."))
    symbol_ratio = F.when(n_words == 0, F.lit(1.0)).otherwise(symbols / n_words)
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-zА-Яа-яё]")))
    alpha_frac = F.when(n_words == 0, F.lit(0.0)).otherwise(alpha_words / n_words)
    stop_hits = F.regexp_count(
        F.lower(c), F.lit(r"\b(the|be|to|of|and|that|have|with)\b")
    )
    flags = {
        "ok_word_count": (n_words >= 50) & (n_words <= 100_000),
        "ok_mean_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "ok_symbol_ratio": symbol_ratio <= 0.1,
        "ok_alpha_words": alpha_frac >= 0.8,
        "ok_stopwords": stop_hits >= 2,
    }
    out = df.select(F.col(id_col), *[v.alias(k) for k, v in flags.items()])
    gopher_pass = None
    for k in flags:
        gopher_pass = F.col(k) if gopher_pass is None else gopher_pass & F.col(k)
    return out.withColumn("gopher_pass", gopher_pass)


def c4_line_flags(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """C4-rules line filter (Raffel et al. 2020 §2.2), per exploded line:

      ends in terminal punctuation (.!?" or »); ≥ 3 words; no "javascript";
      not boilerplate ("lorem ipsum", cookie notice); no curly brace.

    Returns (id, line_id, line, keep) — `.filter("keep")` then re-aggregate
    for the cleaned corpus. All JVM-side expressions, q33-mirrored."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_id", "line"),
    )
    line = F.col("line")
    low = F.lower(line)
    n_words = F.when(F.length(F.trim(line)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(line), r"\s+"))
    )
    keep = (
        F.trim(line).rlike(r'[.!?"»]$')
        & (n_words >= 3)
        & ~low.contains("javascript")
        & ~low.contains("lorem ipsum")
        & ~low.contains("cookie")
        & ~line.contains("{")
    )
    return lines.select(F.col(id_col), F.col("line_id").cast("long").alias("line_id"), "line", keep.alias("keep"))


def c4_clean_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cleaned document text: kept lines re-joined in line order (docs with
    no surviving line drop out, as in C4)."""
    kept = c4_line_flags(df, text_col, id_col).filter(F.col("keep"))
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_id", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text")
        )
    )


def gopher_repetition_flags(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1, second half):

      duplicate-line fraction ≤ 0.30 (share of lines that repeat within
      the document) and top-bigram token coverage ≤ 0.20 (tokens claimed
      by the single most frequent word 2-gram).

    One doc-id exchange per side, established UP FRONT by an explicit
    repartition: every downstream aggregation groups on the doc id or a
    superset of it, so the id partitioning satisfies all of them and
    the (id, line)/(id, shingle) partial-agg exchanges, the second-level
    id exchanges, and the outer join's exchanges all disappear
    (audited: 5 -> 2 Exchange). Bigrams are built with an array
    transform over the MATERIALIZED token array — the repartition is an
    optimizer boundary, so the lambda indexes the computed array
    instead of re-evaluating the tokenizer per element (the documented
    word_shingles trap). Returns the fractions (rounded 6) plus
    rep_pass; q35 mirrors it."""
    from dedoc_spark.functions import word_tokens

    n_part = df.sparkSession.sparkContext.defaultParallelism
    lines = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(n_part, F.col(id_col))
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line"))
        .filter(F.length(F.trim("line")) > 0)
    )
    line_stats = (
        lines.groupBy(id_col, "line")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_lines"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_lines"),
        )
        .select(
            F.col(id_col),
            F.round(F.col("dup_lines") / F.col("n_lines"), 6).alias("dup_line_frac"),
        )
    )
    # same shingle semantics as shingle_rows(n=2): docs with < 2 tokens
    # contribute ONE shingle of all their tokens
    toks = df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    ).repartition(n_part, F.col(id_col))
    shingles = F.when(
        F.size("__toks") < 2, F.array(F.concat_ws(" ", "__toks"))
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(__toks) - 1),"
            " i -> concat(__toks[i-1], ' ', __toks[i]))"
        )
    )
    bigrams = toks.select(F.col(id_col), F.explode(shingles).alias("shingle"))
    bigram_stats = (
        bigrams.groupBy(id_col, "shingle")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("max_cnt"), F.sum("cnt").alias("n_bigrams"))
        .select(
            F.col(id_col),
            F.round(F.col("max_cnt") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
        )
    )
    out = line_stats.join(bigram_stats, id_col, "outer").fillna(0.0)
    return out.withColumn(
        "rep_pass", (F.col("dup_line_frac") <= 0.30) & (F.col("top_bigram_frac") <= 0.20)
    )


def winnow_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    seed: int = 4242,
):
    """Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken
    2003, the MOSS algorithm): normalize (lower, strip non-alnum), hash
    every char k-gram, slide a ``window`` over the hash sequence and keep
    the minimum of each window (rightmost on ties) — the guarantee is any
    shared substring of length ≥ k + window − 1 produces a shared
    fingerprint. Returns distinct (id, fp) rows.

    Relational shape: posexplode of the normalized text's CHARS (one row
    per position — NOT a transform(sequence(...)) lambda, which is
    interpreted per element and re-evaluates the normalization subtree,
    the measured O(n²) HOF trap from CLAUDE.md), k-grams assembled with
    window leads, then ONE logical window pass partitioned by the doc id
    (gram-lead and min-window share the same exchange + sort) — a single
    shuffle on the id, linear in text length. The rightmost-min tie-break
    is encoded arithmetically (key = h·2^31 + (2^31−1 − pos)) so the same
    integer expression runs in the DuckDB oracle. The encoding is exact
    for any representable document: h < 2^32 and pos < 2^31 give
    max(key) = (2^32−1)·2^31 + (2^31−1) = 2^63−1, the signed-bigint
    maximum, and a JVM string can never exceed 2^31 chars so the position
    term can't go negative."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^0-9a-zа-яё]+", "")
    # id-partition BEFORE the per-char explode: the gram/min windows need
    # id-clustering either way, and shuffling one (id, norm) row per
    # document moves ~20x fewer bytes than the exploded per-char rows
    base = (
        df.select(F.col(id_col), norm.alias("__norm"))
        .filter(F.length("__norm") >= k)
        .repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    )
    # "(?!^)" splits BETWEEN every pair of chars — no empty lead/tail cells
    chars = base.select(
        F.col(id_col), F.posexplode(F.split("__norm", r"(?!^)")).alias("pos", "c")
    )
    wo = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat(*[F.lead("c", j).over(wo) if j else F.col("c") for j in range(k)])
    # length==k drops both the null tails (concat is null-intolerant) and the
    # short grams seeded by split's TRAILING EMPTY element (Spark's split
    # keeps it; the empty cell contributes no chars but truncates the last
    # window's concat to k−1 chars)
    grams = (
        chars.select(F.col(id_col), "pos", gram.alias("g"))
        .filter(F.length("g") == k)
        .select(
            F.col(id_col),
            "pos",
            F.conv(F.substring(F.md5(F.concat(F.col("g"), F.lit(f"#{seed}"))), 1, 8), 16, 10)
            .cast("bigint")
            .alias("hs"),
        )
    )
    key = F.col("hs").cast("bigint") * F.lit(2147483648) + (
        F.lit(2147483647) - F.col("pos")
    )
    keyed = grams.select(F.col(id_col), "pos", key.alias("key"))
    w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(window - 1), 0)
    sel = keyed.select(
        F.col(id_col), "pos", F.min("key").over(w).alias("mkey")
    ).filter(F.col("pos") >= window - 1)
    # `div`, NOT `/` + floor: bigint `/` is DOUBLE division, and mkey ≈ h·2^31
    # exceeds the 52-bit double mantissa — the rounded quotient floors to h±1
    return sel.select(
        F.col(id_col), F.expr("mkey div 2147483648").cast("bigint").alias("fp")
    ).distinct()
