"""Column-expression helpers shared by operators and the driver queries.

Everything here is a pure pyspark.sql.functions composition — JVM-side,
whole-stage-codegen friendly, no Python in the hot path. Each helper has
an exact ANSI-SQL (DuckDB) twin used by the correctness oracles in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- scalar function inventory (SURVEY.md §2.9) ----------------------------


def digit_mask(col: Column) -> Column:
    """Header/footer pattern mask (header_footers_analysis.py:11-12):
    lower, trim, digits → '@'."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\d+", "@")


def normalized_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-collapsed lower-cased text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank → 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def sentences(col: Column) -> Column:
    """Sentence segmentation (punkt-lite, RE2-compatible): split after
    terminal punctuation runs followed by whitespace, trim, drop empties.
    Good enough for sentence-count quality gates (C4 drops pages with < 5
    sentences); not a linguistic segmenter."""
    marked = F.regexp_replace(col, r"([.!?]+)\s+", "$1\x1f")
    return F.filter(
        F.transform(F.split(marked, "\x1f"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )


# PII patterns kept RE2-compatible (no lookarounds) so the DuckDB oracle
# can run the identical regexes; order matters — emails before phones so
# digits inside addresses aren't half-redacted
_PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\- ()]{7,}\d", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Training-data PII scrub: emails, IPv4 addresses and phone-like digit
    runs replaced with typed placeholders — chained JVM-side
    regexp_replace, mirrored verbatim by the q37 oracle."""
    out = col
    for pattern, token in _PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


_BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """Token count under a GPT-2-style BPE pretokenizer regex (contraction
    suffixes, space-prefixed letter/digit/symbol runs, whitespace runs —
    the RE2-compatible form without the trailing-space lookahead). Counts
    pretokens, the unit BPE merges operate on — a closer proxy for LLM
    token budgets than whitespace words. JVM-side regexp_count; q36 mirrors
    it in DuckDB verbatim."""
    return F.regexp_count(col, F.lit(_BPE_PRETOKEN_RE))


def word_tokens(col: Column) -> Column:
    """Lower-cased word tokens (BPE-ish regex: letters+digits runs)."""
    return F.filter(
        F.split(F.lower(col), r"[^0-9a-zа-яё]+"), lambda t: F.length(t) > 0
    )


def cyrillic_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(F.lower(col), r"[а-яё]", ""))


def latin_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(F.lower(col), r"[a-z]", ""))


def lang_id(col: Column) -> Column:
    """N-gram-free heuristic language id: script-count vote (ru/en/unknown)."""
    cyr = cyrillic_count(col)
    lat = latin_count(col)
    return (
        F.when((cyr == 0) & (lat == 0), F.lit("unknown"))
        .when(cyr >= lat, F.lit("ru"))
        .otherwise(F.lit("en"))
    )


# stopword alternations per language — the n-gram-heuristic language id
# (kept short + high-frequency so counts separate languages decisively)
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|is|that|with)\b",
    "de": r"\b(der|die|und|das|ist|nicht|ein)\b",
    "fr": r"\b(le|la|les|des|est|une|dans)\b",
    "es": r"\b(el|los|las|una|que|por|con)\b",
}


def lang_id_multi(col: Column) -> Column:
    """Multi-language id: Cyrillic script dominance → ru; otherwise the
    language with the most stopword hits (fixed en→de→fr→es tie-break, no
    hits → unknown). Pure column expressions (regexp_count is JVM-side),
    mirrored verbatim by the DuckDB oracle."""
    low = F.lower(col)
    cyr = cyrillic_count(col)
    lat = latin_count(col)
    c = {lang: F.regexp_count(low, F.lit(pat)) for lang, pat in LANG_STOPWORDS.items()}
    return (
        F.when((cyr > lat) & (cyr > 0), F.lit("ru"))
        .when((c["en"] == 0) & (c["de"] == 0) & (c["fr"] == 0) & (c["es"] == 0), F.lit("unknown"))
        .when((c["en"] >= c["de"]) & (c["en"] >= c["fr"]) & (c["en"] >= c["es"]), F.lit("en"))
        .when((c["de"] >= c["fr"]) & (c["de"] >= c["es"]), F.lit("de"))
        .when(c["fr"] >= c["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def alpha_ratio(col: Column) -> Column:
    alpha = F.length(col) - F.length(F.regexp_replace(F.lower(col), r"[a-zа-яё]", ""))
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.round(alpha / F.length(col), 6)
    )


def punct_ratio(col: Column) -> Column:
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?()\[\]\"']", ""))
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.round(punct / F.length(col), 6)
    )


def mean_word_len(col: Column) -> Column:
    toks = word_tokens(col)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.round(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            6,
        )
    )


def quality_score(col: Column) -> Column:
    """Composite text-quality score in [0,1]: alpha density, moderate word
    length, low punctuation density (length/punct/stopword-style ratios)."""
    wl = mean_word_len(col)
    wl_term = F.when((wl >= 3) & (wl <= 10), F.lit(0.4)).otherwise(F.lit(0.0))
    return F.round(alpha_ratio(col) * 0.4 + wl_term + (0.2 - F.least(punct_ratio(col), F.lit(0.2))), 6)


_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="


# two-label public suffixes that take a third label as the registered
# domain (public-suffix-list subset: the high-traffic ccTLD second levels)
_TWO_LABEL_SUFFIX_RE = (
    r"(?:co|com|org|net|gov|edu|ac)\.(?:uk|jp|au|nz|za|in|br|kr|id|il|mx|tr|ru|ua|pl)$"
)


def registered_domain(col: Column) -> Column:
    """Registered domain of a URL: host minus subdomains, with a
    public-suffix-lite rule for two-label ccTLD suffixes (example.co.uk
    stays example.co.uk, a.b.example.com → example.com). The per-site key
    for crawl rollups and boilerplate voting."""
    host = F.lower(F.regexp_extract(col, r"^[^:/?#]+://([^/?#:]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    two = F.regexp_extract(host, r"([^.]+\." + _TWO_LABEL_SUFFIX_RE + r")", 1)
    one = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).otherwise(F.when(one != "", one).otherwise(host))


def normalized_url(col: Column) -> Column:
    """Canonical URL for url-level dedup of a crawl: lowercase scheme+host,
    default port stripped, fragment dropped, tracking params removed,
    remaining query params sorted, empty path → '/'. Pure column
    expressions, mirrored by the q34 oracle."""
    u = F.regexp_replace(col, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([^:/?#]+)://", 1))
    after = F.regexp_replace(u, r"^[^:/?#]+://", "")
    host = F.lower(F.regexp_extract(after, r"^([^/?#]+)", 1))
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).otherwise(host)
    host = F.when(scheme == "https", F.regexp_replace(host, ":443$", "")).otherwise(host)
    path_query = F.regexp_replace(after, r"^[^/?#]+", "")
    path = F.regexp_extract(path_query, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(path_query, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_PARAM_RE),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )


def hash32(col: Column, seed: int) -> Column:
    """Deterministic 32-bit hash as bigint: first 8 hex chars of
    md5(value || '#' || seed). Same formula is expressible in DuckDB as
    ('0x' || substr(md5(v || '#' || seed), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 8), 16, 10).cast("bigint")


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text (array<string>).

    WARNING: higher-order-function formulation — interpreted per element
    and the lambda re-evaluates the tokenizer subtree (measured O(n²):
    ~20k shingles/s). Fine for small arrays; for anything at scale use
    ``shingle_rows`` (posexplode + window lead, whole-stage codegen)."""
    toks = word_tokens(col)
    ngrams = F.when(
        F.size(toks) < n, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return F.array_distinct(ngrams)


def shingle_rows(df, text_col: str, id_col: str, n: int = 3):
    """Word n-gram shingles as rows (id, shingle) — the scale path.

    Tokenize once per row, posexplode, then a window lead() builds each
    n-gram in codegen; documents with < n tokens contribute one shingle of
    all their tokens (same semantics as word_shingles / the DuckDB oracle
    CASE). One shuffle, partitioned by the document id, taken AFTER the
    explode — measured at sf1.0: a pre-explode repartition of the
    (id, token-array) rows was 1.2-1.4 s SLOWER for q07/q43 than letting
    the window's own exchange move the exploded rows (the per-CHAR winnow
    stream is the opposite and keeps its pre-explode exchange; decide per
    operator by measurement, not by byte-count intuition).
    """
    from pyspark.sql.window import Window

    toks_df = df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("__toks"))
    small = toks_df.filter(F.size("__toks") < n).select(
        F.col(id_col), F.concat_ws(" ", "__toks").alias("shingle")
    )
    exploded = (
        toks_df.filter(F.size("__toks") >= n)
        .select(F.col(id_col), F.posexplode("__toks").alias("__pos", "__tok"))
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    # materialize all leads BEFORE filtering — a lead computed after the
    # filter would skip rows and corrupt the n-grams
    grams = exploded.select(
        F.col(id_col),
        F.col("__tok").alias("__g0"),
        *[F.lead("__tok", k).over(w).alias(f"__g{k}") for k in range(1, n)],
    )
    big = grams.filter(F.col(f"__g{n - 1}").isNotNull()).select(
        F.col(id_col), F.concat_ws(" ", *[F.col(f"__g{k}") for k in range(n)]).alias("shingle")
    )
    return big.unionByName(small)


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: array of num_hashes minima of hash32(shingle, j)."""
    return F.array(
        *[F.array_min(F.transform(shingles, lambda s: hash32(s, j))) for j in range(num_hashes)]
    )


# --- embeddings -------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
