"""Deduplication operators for the 100 TB training-data path.

All variants are declarative DataFrame compositions (no Python UDFs):

  exact_dedup          hash-groupBy — one shuffle on the content hash
  minhash_lsh_pairs    shingle → minhash → band → bucket-join — the scale
                       path: candidate pairs come from equi-joins on band
                       keys, never from a cross join
  jaccard_for_pairs    exact n-gram Jaccard driven by candidate pairs —
                       cost linear in |candidates| (the blessed verify path)
  cosine_for_pairs     exact cosine driven by candidate pairs
  embedding_lsh_pairs  sign-bucket LSH candidate pairs over embeddings
  ngram_jaccard_pairs  blocked all-pairs Jaccard — SMALL BLOCKS ONLY
  simhash              64-bit simhash via bit-counted token hashes
  embedding_near_dup   blocked all-pairs cosine — SMALL BLOCKS ONLY

The 100 TB dedup chain is candidates → pair-driven verify:
  minhash_lsh_pairs(df)  → jaccard_for_pairs(pairs, df)
  embedding_lsh_pairs(e) → cosine_for_pairs(pairs, e)

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
    persist_signatures: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Signature split into ``bands`` bands of num_hashes/bands rows; documents
    sharing any full band collide. Returns distinct (a, b) id pairs, a < b.
    Buckets larger than max_bucket are dropped (degenerate content) — the
    cap is logged in the plan as a filter, not silently inside a UDF.

    persist_signatures materializes the signature table once
    (StorageLevel.DISK_ONLY — lineage stays attached, so it survives
    executor loss on a real cluster, unlike localCheckpoint) instead of
    recomputing the shingle+hash subtree on both sides of the self-join.
    """
    rows_per_band = num_hashes // bands
    sigs = with_minhash(df, text_col, id_col, num_hashes, shingle_n)
    if persist_signatures:
        from pyspark.storagelevel import StorageLevel

        sigs = sigs.persist(StorageLevel.DISK_ONLY)
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


def jaccard_for_pairs(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for pre-generated candidate pairs — the 100 TB
    verify path: feed ``minhash_lsh_pairs`` output, so cost is linear in the
    number of candidates (two equi-joins on the id, no self-join anywhere).

    pairs: DataFrame(a, b) of id pairs; df: the corpus. Returns
    (a, b, jaccard) with jaccard rounded to 6.
    """
    from dedoc_spark.functions import shingle_rows

    sets = (
        shingle_rows(df, text_col, id_col, shingle_n)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )
    joined = pairs.join(
        sets.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a")), "a"
    ).join(sets.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b")), "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return joined.select("a", "b", F.round(jac, 6).alias("jaccard"))


def cosine_for_pairs(
    pairs: DataFrame,
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 4,
) -> DataFrame:
    """Exact cosine for pre-generated candidate pairs (embedding analogue of
    ``jaccard_for_pairs``): two equi-joins on the id, linear in candidates."""
    e = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    joined = pairs.join(
        e.select(F.col(id_col).alias("a"), F.col("v").alias("va")), "a"
    ).join(e.select(F.col(id_col).alias("b"), F.col("v").alias("vb")), "b")
    return joined.select(
        "a", "b", F.round(cosine(F.col("va"), F.col("vb")), decimals).alias("cos")
    )


def embedding_lsh_pairs(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via random-hyperplane sign buckets —
    the embedding analogue of ``minhash_lsh_pairs``. Vectors sharing all
    ``planes`` dot-product signs collide; candidates come from an equi-join
    on the bucket id, never a cross join. Degenerate buckets (> max_bucket)
    are dropped before the self-join."""
    from dedoc_spark.operators.similarity import with_sign_bucket

    bucketed = with_sign_bucket(df, dim, planes, vec_col).select(id_col, "bucket")
    sizes = bucketed.groupBy("bucket").agg(F.count("*").alias("sz"))
    bucketed = bucketed.join(
        sizes.filter(F.col("sz") <= max_bucket).select("bucket"), "bucket"
    )
    a = bucketed.select("bucket", F.col(id_col).alias("a"))
    b = bucketed.select("bucket", F.col(id_col).alias("b"))
    return (
        a.join(b, "bucket").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    persist_each: bool = True,
) -> DataFrame:
    """Duplicate-group clustering: (a, b) near-dup pairs → (id, comp) where
    comp is the minimum id reachable in the pair graph — the step that turns
    verified pairs into dedup groups (keep one representative per comp).

    Min-label propagation: each iteration joins labels across edges and
    keeps the per-node minimum; converges in O(graph diameter) iterations —
    near-dup clusters are shallow (diameter ≤ a few hops), so the loop is
    short. Each iteration is one shuffle on the node id; labels persist
    (DISK_ONLY) so the next iteration doesn't recompute the chain. At
    extreme scale swap in the large-star/small-star contraction — the
    driver loop shape stays the same.
    """
    from pyspark.storagelevel import StorageLevel

    fwd = pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
    edges = fwd.unionByName(fwd.select(F.col("y").alias("x"), F.col("x").alias("y"))).distinct()
    if persist_each:
        edges = edges.persist(StorageLevel.DISK_ONLY)
    labels = edges.select(F.col("x").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    if edges.limit(1).count() == 0:  # no pairs → no components to propagate
        return labels
    for _ in range(max_iter):
        neigh = (
            edges.join(labels.select(F.col("id").alias("y"), "comp"), "y")
            .groupBy("x")
            .agg(F.min("comp").alias("ncomp"))
            .select(F.col("x").alias("id"), "ncomp")
        )
        new_labels = labels.join(neigh, "id", "left").select(
            "id", F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp")
        )
        if persist_each:
            new_labels = new_labels.persist(StorageLevel.DISK_ONLY)
        changed = (
            new_labels.join(labels.select("id", F.col("comp").alias("old")), "id")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        if persist_each:
            labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """One-call near-dup dedup — the whole blessed chain:

      minhash_lsh_pairs → jaccard_for_pairs (≥ threshold)
      → connected_components → min-id representative per group.

    Returns the input columns plus ``comp`` (duplicate-group id; equals the
    row's own id for non-duplicates) and ``is_representative`` — filter on
    it to keep one document per group. Every stage is candidate-driven
    (no all-pairs join anywhere), so cost scales with real collisions."""
    cand = minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, shingle_n, max_bucket)
    verified = jaccard_for_pairs(cand, df, text_col, id_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )
    comps = connected_components(verified.select("a", "b")).withColumnRenamed("id", id_col)
    return (
        df.join(comps, id_col, "left")
        .withColumn("comp", F.coalesce(F.col("comp"), F.col(id_col)))
        .withColumn("is_representative", F.col("comp") == F.col(id_col))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Blocked all-pairs n-gram Jaccard — SMALL BLOCKS ONLY (quadratic and
    skew-prone within each block value). The scale path is
    ``jaccard_for_pairs(minhash_lsh_pairs(df), df)``."""
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
    """Blocked all-pairs embedding-cosine near-dup — SMALL BLOCKS ONLY
    (quadratic within each block value). The scale path is
    ``cosine_for_pairs(embedding_lsh_pairs(df, dim), df)``."""
    e = df.select(F.col(block_col).alias("blk"), F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    a = e.select("blk", F.col(id_col).alias("a"), F.col("v").alias("va"))
    b = e.select("blk", F.col(id_col).alias("b"), F.col("v").alias("vb"))
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
