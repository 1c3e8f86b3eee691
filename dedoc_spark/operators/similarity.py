"""Similarity search over embedding columns.

  cosine_topk        brute-force cosine top-k — the correctness baseline,
                     fully declarative (F.zip_with/F.aggregate dot product)
  cosine_topk_lsh    random-hyperplane-bucketed variant — the scale path:
                     candidates only from matching sign-buckets, so the
                     scan is pruned to ~N/2^planes per probe

The hyperplanes are deterministic pseudo-vectors derived from md5 of
(plane, dim) — no RNG state, same buckets every run.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedoc_spark.functions import cosine


def _vec_lit(vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against one query vector. At scale this is a
    single narrow scan + a TakeOrderedAndProject (no full sort, no shuffle
    of the vectors themselves)."""
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(id_col), F.round(cosine(v, _vec_lit(query)), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_multi(
    df: DataFrame,
    queries: Sequence,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 4,
) -> DataFrame:
    """Multi-query cosine top-k with a two-phase plan that survives scale.

    ``queries`` is a sequence of (query_id, vector). A naive
    ``Window.partitionBy(query_id)`` over the scored corpus shuffles EVERY
    row into |queries| partitions — at 10^12 rows a handful of tasks own the
    whole corpus. Instead:

      phase 1: per-(query, input-partition) local top-k — the window key
               includes spark_partition_id(), so parallelism stays at the
               scan's partition count and nothing shuffles;
      phase 2: global top-k over the ≤ |queries|·n_partitions·k survivors —
               a trivially small window.

    Ties are broken by id, so the result is deterministic and identical to
    the single-window plan.
    """
    from pyspark.sql.window import Window

    v = F.col(vec_col).cast("array<double>")
    # rank on the RAW cosine (round only the output) so tie behavior is
    # identical to a single-window plan and to the SQL oracle
    scored = df.select(
        F.col(id_col).alias("neighbor_id"),
        *[cosine(v, _vec_lit(vec)).alias(f"__cos_{qid}") for qid, vec in queries],
    )
    melted = scored.select(
        "neighbor_id",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(int(qid)).cast("bigint") for qid, _ in queries]),
                F.array(*[F.col(f"__cos_{qid}") for qid, _ in queries]),
            )
        ).alias("query_id", "cos"),
        F.spark_partition_id().alias("__pid"),
    )
    w_local = Window.partitionBy("query_id", "__pid").orderBy(
        F.col("cos").desc(), "neighbor_id"
    )
    local = (
        melted.withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__pid")
    )
    w_glob = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        local.withColumn("__rn", F.row_number().over(w_glob))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", decimals).alias("cos"))
    )


def _argmax_cluster(v, centroids: List[List[float]]):
    """Column expression: index of the max-cosine centroid (struct-max
    trick: Spark compares structs field-by-field, so max((score, idx))
    yields the argmax; centroids ship as literals — k×dim is small)."""
    scored = [
        F.struct(cosine(v, _vec_lit(c)).alias("s"), F.lit(i).alias("i"))
        for i, c in enumerate(centroids)
    ]
    return F.array_max(F.array(*scored))["i"]


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> List[List[float]]:
    """Deterministic spherical k-means for the IVF coarse quantizer.

    Init: the k rows with the smallest md5(id) (content-derived, no RNG).
    Each iteration: one distributed assign (argmax-cosine over broadcast
    centroid literals) + one groupBy-avg; only the k×dim centroid matrix
    ever reaches the driver. Empty clusters keep their previous centroid.
    """
    v = F.col(vec_col).cast("array<double>")
    seeds = (
        df.select(F.col(id_col), v.alias("v"))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(k)
        .collect()
    )
    centroids = [list(r.v) for r in seeds]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = df.select(_argmax_cluster(v, centroids).alias("c"), v.alias("v"))
        means = (
            assigned.groupBy("c")
            .agg(*[F.avg(F.col("v")[d]).alias(f"d{d}") for d in range(dim)])
            .collect()
        )
        new_centroids = list(centroids)
        for r in means:
            new_centroids[r.c] = [float(r[f"d{d}"]) for d in range(dim)]
        centroids = new_centroids
    return centroids


def with_ivf_cluster(
    df: DataFrame, centroids: List[List[float]], vec_col: str = "embedding"
) -> DataFrame:
    """IVF list assignment — at scale this is the partition/bucket column
    the index is written under (one parquet directory per list)."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn("ivf_cluster", _argmax_cluster(v, centroids))


def cosine_topk_ivf(
    df: DataFrame,
    centroids: List[List[float]],
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: score only the nprobe lists whose centroids are nearest
    the query — the scan prunes to ~nprobe/k of the corpus (exact within
    probed lists; recall < 1 by construction like any IVF). With the
    cluster column as a partition key, the pruning is partition pruning."""
    import math

    def cos_py(a: Sequence[float], b: Sequence[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    q = [float(x) for x in query]
    order = sorted(range(len(centroids)), key=lambda i: (-cos_py(q, centroids[i]), i))
    probes = order[: max(1, nprobe)]
    bucketed = df if "ivf_cluster" in df.columns else with_ivf_cluster(df, centroids, vec_col)
    cand = bucketed.filter(F.col("ivf_cluster").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)


def _hyperplane(plane: int, dim: int) -> List[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 bytes."""
    import hashlib

    out: List[float] = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane}dim{d}".encode()).digest()
        out.append((int.from_bytes(h[:4], "big") / 2**31) - 1.0)
    return out


def with_sign_bucket(
    df: DataFrame, dim: int, planes: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^planes-1) per row.

    The dot product is rounded to 6 decimals before the sign test so the
    bucket assignment is reproducible across engines (the DuckDB oracle
    mirrors the same md5-derived hyperplanes and rounding)."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for p in range(planes):
        hp = _vec_lit(_hyperplane(p, dim))
        d = F.aggregate(F.zip_with(v, hp, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b)
        bucket = bucket + F.when(F.round(d, 6) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    dim: int,
    k: int = 10,
    planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_hamming: int = 1,
) -> DataFrame:
    """LSH-pruned top-k: scan only buckets within probe_hamming sign flips
    of the query's bucket. Recall < 1 by construction; candidates then get
    exact cosine. At 10^12 scale the bucket column is a partition key."""
    bucketed = with_sign_bucket(df, dim, planes, vec_col)
    qbucket = 0
    for p in range(planes):
        hp = _hyperplane(p, dim)
        d = sum(x * y for x, y in zip([float(x) for x in query], hp))
        if d > 0:
            qbucket |= 1 << p
    probes = [qbucket] + (
        [qbucket ^ (1 << p) for p in range(planes)] if probe_hamming >= 1 else []
    )
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)
