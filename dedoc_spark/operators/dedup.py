"""Deduplication operators for the 100 TB training-data path.

All variants are declarative DataFrame compositions (no Python UDFs):

  exact_dedup          hash-groupBy — one shuffle on the content hash
  minhash_lsh_pairs    shingle → minhash → band → bucket-join — the scale
                       path: candidate pairs come from equi-joins on band
                       keys, never from a cross join
  ngram_jaccard_pairs  exact verification of candidate pairs (or small
                       blocked self-join)
  simhash              64-bit simhash via bit-counted token hashes
  embedding_near_dup   cosine > threshold pairs within LSH-ish buckets

Scale notes: minhash banding makes the self-join linear in the number of
colliding pairs; the band-key join shuffles on (band_idx, band_hash) which
is uniformly distributed by construction. AQE skew-join covers pathological
buckets (e.g. empty documents all colliding) — we also cap bucket size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedoc_spark.functions import (
    cosine,
    hash32,
    normalized_fingerprint,
    word_tokens,
)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by normalized-content hash: one row per group
    with the representative (min id) and the group size."""
    return (
        df.select(F.col(id_col), normalized_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("rep_id"), F.count("*").alias("dup_count"))
    )


def with_minhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures via row-based shingles + partial-agg minima
    (codegen path; see functions.shingle_rows) assembled into an array."""
    from dedoc_spark.functions import shingle_rows

    sh = shingle_rows(df, text_col, id_col, shingle_n)
    mins = sh.groupBy(id_col).agg(
        *[
            F.min(hash32(F.col("shingle"), j)).alias(f"__h{j}")
            for j in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col), F.array(*[F.col(f"__h{j}") for j in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Signature split into ``bands`` bands of num_hashes/bands rows; documents
    sharing any full band collide. Returns distinct (a, b) id pairs, a < b.
    Buckets larger than max_bucket are dropped (degenerate content) — the
    cap is logged in the plan as a filter, not silently inside a UDF.
    """
    rows_per_band = num_hashes // bands
    sigs = with_minhash(df, text_col, id_col, num_hashes, shingle_n)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(",", *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)])
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    # cap degenerate buckets before the self-join
    bucket_sizes = banded.groupBy("band_idx", "band_key").agg(F.count("*").alias("sz"))
    banded = banded.join(
        bucket_sizes.filter(F.col("sz") <= max_bucket).select("band_idx", "band_key"),
        ["band_idx", "band_key"],
    )
    left = banded.select(F.col("band_idx"), F.col("band_key"), F.col(id_col).alias("a"))
    right = banded.select(F.col("band_idx"), F.col("band_key"), F.col(id_col).alias("b"))
    return (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key
    (small blocks → broadcastable; at scale feed LSH candidates instead)."""
    from dedoc_spark.functions import shingle_rows

    sets = (
        shingle_rows(df, text_col, id_col, shingle_n)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )
    sh = df.select(F.col(block_col).alias("blk"), F.col(id_col)).join(sets, id_col)
    a = sh.select(F.col("blk"), F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("blk"), F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash, fully declarative: explode tokens, per-token 2×32-bit
    hash halves, per-bit vote via sign aggregation, recombine.

    One shuffle (groupBy id); all bit math is JVM-side integer ops.
    """
    toks = df.select(F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("tok"))
    h_lo = hash32(F.col("tok"), 1001)
    h_hi = hash32(F.col("tok"), 2002)
    votes = toks.select(
        F.col(id_col),
        *[
            F.when(F.shiftright(h_lo, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias(f"b{b}")
            for b in range(32)
        ],
        *[
            F.when(F.shiftright(h_hi, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias(f"b{b + 32}")
            for b in range(32)
        ],
    )
    agg = votes.groupBy(id_col).agg(*[F.sum(f"b{b}").alias(f"s{b}") for b in range(64)])
    sim = F.lit(0).cast("bigint")
    for b in range(64):
        # bit 63 is the sign bit of a two's-complement bigint
        bit_value = -(1 << 63) if b == 63 else (1 << b)
        sim = sim + F.when(F.col(f"s{b}") > 0, F.lit(bit_value).cast("bigint")).otherwise(F.lit(0))
    return agg.select(F.col(id_col), sim.alias("simhash"))


def embedding_near_dup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key."""
    e = df.select(F.col(block_col).alias("blk"), F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    a = e.select("blk", F.col(id_col).alias("a"), F.col("v").alias("va"))
    b = e.select("blk", F.col(id_col).alias("b"), F.col("v").alias("vb"))
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
