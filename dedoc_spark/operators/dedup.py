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
  ngram_jaccard_pairs  blocked all-pairs Jaccard — max_block-capped
  simhash              64-bit simhash via bit-counted token hashes
  embedding_near_dup   blocked all-pairs cosine — max_block-capped

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


_MERSENNE31 = 2147483647  # 2^31 − 1, prime


def _mix_constants(num_hashes: int):
    """Deterministic (a_j, b_j) pairs for the 'mixed' MinHash family —
    the Carter-Wegman universal family h_j(x) = (a_j·x + b_j) mod p with
    p = 2^31−1. Constants are splitmix64-derived (j-keyed, no RNG),
    reduced mod p with a_j forced nonzero; the 62-bit product a_j·x fits
    a bigint, so the expression is exact under Spark's default ANSI mode
    (wrap-around multiply would throw ARITHMETIC_OVERFLOW)."""
    consts = []
    for j in range(num_hashes):
        a = ((0x9E3779B97F4A7C15 ^ (j * 0x632BE59BD9B4E019)) % (_MERSENNE31 - 1)) + 1
        b = (0xBF58476D1CE4E5B9 ^ (j * 0x94D049BB133111EB)) % _MERSENNE31
        consts.append((a, b))
    return consts


def with_minhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, shingle_n: int = 3, hash_family: str = "md5",
) -> DataFrame:
    """MinHash signatures via row-based shingles + partial-agg minima
    (codegen path; see functions.shingle_rows) assembled into an array.

    ``hash_family``:
      * "md5" (default) — one md5 per (shingle, seed), the formula the
        DuckDB oracles mirror (functions.hash32). num_hashes md5 calls
        per shingle row.
      * "mixed" — ONE md5 per shingle row; the per-seed hashes are
        Carter-Wegman universal mixes (a_j·x + b_j) mod (2^31−1) of its
        first 31 bits — num_hashes× fewer digest computations.
        MEASURED (local[32], 60k docs, warm): md5 3.7 s vs mixed 3.6 s
        at 128 hashes — Spark's codegen'd md5 is NOT the bottleneck on
        the JVM (the shuffle+agg dominates), so this family is kept for
        its universal-hashing properties and for backends where digests
        are expensive, not as a local-mode speedup. Signatures are NOT
        comparable across families (same minhash collision semantics,
        different values — the gates stay on md5)."""
    from dedoc_spark.functions import shingle_rows

    sh = shingle_rows(df, text_col, id_col, shingle_n)
    if hash_family == "mixed":
        # first 8 hex chars → 32 bits, reduced into the Mersenne field
        base = F.pmod(
            F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("bigint"),
            F.lit(_MERSENNE31),
        )
        hashes = [
            F.pmod(base * F.lit(a) + F.lit(b), F.lit(_MERSENNE31)).alias(f"__m{j}")
            for j, (a, b) in enumerate(_mix_constants(num_hashes))
        ]
        sh = sh.select(F.col(id_col), *hashes)
        mins = sh.groupBy(id_col).agg(
            *[F.min(f"__m{j}").alias(f"__h{j}") for j in range(num_hashes)]
        )
    else:
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
    hash_family: str = "md5",
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
    if bands < 1 or num_hashes % bands != 0:
        # bands > num_hashes would make every band key the empty string
        # (all documents collide, then the max_bucket cap silently drops
        # everything); non-divisible bands would silently ignore the
        # trailing hashes
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    rows_per_band = num_hashes // bands
    sigs = with_minhash(df, text_col, id_col, num_hashes, shingle_n, hash_family)
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
    out = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    if persist_signatures:
        # sigs must stay persisted until the caller's action; release in
        # long-lived sessions via operators.archives.unpersist_intermediates
        # (works on any frame — the registry tracks sigs even after the
        # caller transforms this one away)
        from dedoc_spark.operators import _persist

        _persist.register([sigs])
        out._dedoc_persisted = [sigs]
    return out


def jaccard_for_pairs(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_shingles: int | None = 50_000,
) -> DataFrame:
    """Exact n-gram Jaccard for pre-generated candidate pairs — the 100 TB
    verify path: feed ``minhash_lsh_pairs`` output, so cost is linear in the
    number of candidates (two equi-joins on the id, no self-join anywhere).

    pairs: DataFrame(a, b) of id pairs; df: the corpus. Returns
    (a, b, jaccard) with jaccard rounded to 6.

    max_shingles bounds the per-document shingle array (a single 10M-token
    document must not become one giant row on both join sides — the set-size
    analogue of minhash_lsh_pairs' max_bucket). Documents under the cap are
    untouched; above it, the set is reduced to its bottom-k sketch under a
    shared uniform hash order (k-minimum-values, Cohen & Kaplan 2007).

    Estimator: a pair with NEITHER side capped gets exact |∩|/|∪|. A pair
    with a capped side gets the symmetric KMV estimate — K = the k hash-
    smallest elements of A∪B (computable from the sketches: the global
    hash order makes every union-bottom-k element present in each side's
    bottom-k that contains it), estimate = |K ∩ A ∩ B| / |K| — which is
    unbiased with ≈1/√k error REGARDLESS of which sides were capped (the
    earlier one-side-capped low bias is gone). The capped branch runs
    interpreted higher-order functions over ≤2k elements, so size the cap
    well above the typical document to keep capping the exception (the
    default 50k ≈ a 50k-token document). ``max_shingles=None`` disables
    the cap.
    """
    from dedoc_spark.functions import shingle_rows

    sets = (
        shingle_rows(df, text_col, id_col, shingle_n)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )
    if max_shingles is not None:
        # CaseWhen evaluates branch values lazily, so the per-element sort
        # subtree only runs on rows that actually exceed the cap
        ranked = F.array_sort(
            F.transform(
                F.col("sh"), lambda s: F.struct(hash32(s, 9191).alias("hk"), s.alias("s"))
            )
        )
        capped = F.transform(
            F.slice(ranked, 1, max_shingles), lambda t: t["s"]
        )
        sets = sets.select(
            F.col(id_col),
            F.when(F.size("sh") <= max_shingles, F.col("sh"))
            .otherwise(capped)
            .alias("sh"),
            (F.size("sh") > max_shingles).alias("is_capped"),
        )
    else:
        sets = sets.withColumn("is_capped", F.lit(False))
    # both join sides read `sets` — persist it (the shingle collect_set
    # over the whole corpus is the expensive aggregation; Spark performs
    # no common-subplan elimination across the two joins). Registered for
    # session-wide release like the minhash signature frame.
    from pyspark.storagelevel import StorageLevel

    from dedoc_spark.operators import _persist

    sets = sets.persist(StorageLevel.DISK_ONLY)
    _persist.register([sets])
    joined = pairs.join(
        sets.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"),
                    F.col("is_capped").alias("cap_a")), "a"
    ).join(sets.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"),
                       F.col("is_capped").alias("cap_b")), "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union_arr = F.array_union("sh_a", "sh_b")
    union = F.size(union_arr)
    exact = inter / union
    if max_shingles is not None:
        # symmetric KMV branch (docstring): K = bottom-k of the union by
        # the shared hash order; hits = elements of A∩B with hash ≤ the
        # k-th union hash. Interpreted HOFs, gated behind the lazy
        # CaseWhen — only capped pairs pay.
        union_hashes = F.array_sort(F.transform(union_arr, lambda s: hash32(s, 9191)))
        k_size = F.least(F.lit(max_shingles), union)
        kth_hash = F.get(union_hashes, k_size - 1)
        hits = F.size(
            F.filter(
                F.array_intersect("sh_a", "sh_b"),
                lambda s: hash32(s, 9191) <= kth_hash,
            )
        )
        kmv = hits / k_size
        jac = F.when(union == 0, F.lit(0.0)).when(
            F.col("cap_a") | F.col("cap_b"), kmv
        ).otherwise(exact)
    else:
        jac = F.when(union == 0, F.lit(0.0)).otherwise(exact)
    out = joined.select("a", "b", F.round(jac, 6).alias("jaccard"))
    out._dedoc_persisted = [sets]  # release via unpersist_intermediates
    return out


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


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and CUT its logical plan — mandatory inside
    iterative algorithms: each round of label propagation / star contraction
    references the previous frame 2-3×, so the raw plan grows exponentially
    and the analyzer OOMs after a handful of rounds (measured: a 3-edge
    graph kills a 1 GiB driver at round 2). Reliable ``checkpoint`` when a
    checkpoint dir is configured (survives executor loss on a cluster),
    else eager ``localCheckpoint`` — same trade GraphX/GraphFrames make."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    return df.checkpoint(eager=True) if has_dir else df.localCheckpoint(eager=True)


def _labels_checksum(labels: DataFrame) -> tuple:
    """(row count, order-independent hash-sum) of an (id, comp) frame —
    one aggregate, no join. Labels only ever decrease monotonically under
    min-label propagation, so an unchanged checksum ⟺ a fixpoint (up to a
    negligible hash-sum collision). decimal(38,0) keeps the sum exact."""
    row = labels.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("id", "comp").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    persist_each: bool = True,
    algorithm: str = "label_prop",
    on_exhausted: str = "warn",
) -> DataFrame:
    """Duplicate-group clustering: (a, b) near-dup pairs → (id, comp) where
    comp is the minimum id reachable in the pair graph — the step that turns
    verified pairs into dedup groups (keep one representative per comp).

    algorithm="label_prop" (default): min-label propagation — each iteration
    joins labels across edges and keeps the per-node minimum; converges in
    O(graph diameter) iterations. Near-dup clusters are shallow (diameter ≤
    a few hops), so the loop is short. Each iteration is one shuffle on the
    node id plus ONE aggregate for the convergence checksum (no extra join —
    the previous iteration's checksum is cached driver-side).

    algorithm="star": alternating large-star/small-star contraction
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond") —
    O(log² n) rounds regardless of diameter; the path for huge or
    high-diameter graphs (chained templated pages at crawl scale).

    If the loop exhausts max_iter without converging, on_exhausted decides:
    "warn" (default) emits a UserWarning and returns the partial labels,
    "raise" raises RuntimeError — never a silent wrong answer.

    persist_each=True checkpoints each iteration's frame (reliable
    checkpoint if ``spark.sparkContext.setCheckpointDir`` was called — the
    cluster setting — else eager localCheckpoint): iterative plans MUST cut
    lineage each round or the logical plan grows exponentially (see
    _truncate_lineage). Checkpoint blocks are reclaimed by the
    ContextCleaner when the frames are garbage collected.
    """
    import warnings

    fwd = pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
    edges = fwd.unionByName(fwd.select(F.col("y").alias("x"), F.col("x").alias("y"))).distinct()
    if persist_each:
        edges = _truncate_lineage(edges)
    labels = edges.select(F.col("x").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    if edges.limit(1).count() == 0:  # no pairs → no components to propagate
        return labels
    if algorithm == "star":
        return _star_components(edges, max_iter, persist_each, on_exhausted)

    converged = False
    prev_checksum = None
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
            new_labels = _truncate_lineage(new_labels)
        checksum = _labels_checksum(new_labels)
        labels = new_labels
        if checksum == prev_checksum:
            converged = True
            break
        prev_checksum = checksum
    if not converged:
        msg = (
            f"connected_components: not converged after {max_iter} iterations "
            "(graph diameter exceeds max_iter) — labels may split groups; "
            "raise max_iter or use algorithm='star'"
        )
        if on_exhausted == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg)
    return labels


def _star_components(
    edges: DataFrame, max_iter: int, persist_each: bool, on_exhausted: str
) -> DataFrame:
    """Large-star/small-star alternation over a symmetric edge frame (x, y)
    → (id, comp). Converges in O(log² n) rounds on any graph shape.

    large-star: per node u with neighborhood N(u), m = min(N(u) ∪ {u});
    rewire every LARGER neighbor v > u to m. small-star: orient each edge
    big→small, per node u rewire u and all its (smaller) neighbors to
    m = min(N(u) ∪ {u}). At the fixpoint the edge set is a union of stars
    (node, component-min). Both steps are groupBy + join on the node id —
    the same shuffle shape as label propagation, but the star moves labels
    many hops per round.
    """
    import warnings

    def large_star(e_sym: DataFrame) -> DataFrame:
        m = (
            e_sym.groupBy("x")
            .agg(F.min("y").alias("mn"))
            .select("x", F.least("mn", "x").alias("m"))
        )
        out = (
            e_sym.join(m, "x")
            .filter(F.col("y") > F.col("x"))
            .select(F.col("y").alias("x"), F.col("m").alias("y"))
        )
        return out.filter(F.col("x") != F.col("y")).distinct()

    def small_star(e: DataFrame) -> DataFrame:
        # orient big → small
        oriented = e.select(
            F.greatest("x", "y").alias("x"), F.least("x", "y").alias("y")
        ).filter(F.col("x") != F.col("y"))
        m = (
            oriented.groupBy("x")
            .agg(F.min("y").alias("m"))
        )
        j = oriented.join(m, "x")
        rewired = j.select(F.col("y").alias("x"), F.col("m").alias("y")).unionByName(
            j.select(F.col("x"), F.col("m").alias("y"))
        )
        return rewired.filter(F.col("x") != F.col("y")).distinct()

    # node set fixed up front — star contraction drops singleton-star roots
    # from the edge list, but they must appear in the output labels
    nodes = edges.select(F.col("x").alias("id")).distinct()
    if persist_each:
        nodes = _truncate_lineage(nodes)

    def checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("x", "y").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    cur = edges
    prev = None
    converged = False
    for _ in range(max_iter):
        # one round = large-star then small-star; re-symmetrize for the next
        # large-star (it expects both directions)
        ls = large_star(cur.unionByName(cur.select(F.col("y").alias("x"), F.col("x").alias("y"))))
        nxt = small_star(ls)
        if persist_each:
            nxt = _truncate_lineage(nxt)
        cs = checksum(nxt)
        cur = nxt
        if cs == prev:
            converged = True
            break
        prev = cs
    if not converged:
        msg = (
            f"connected_components(star): not converged after {max_iter} rounds"
        )
        if on_exhausted == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg)
    # fixpoint edges are (member, root); roots label themselves. The
    # groupBy(min) guards the one-row-per-id contract when max_iter was
    # exhausted mid-contraction (a node can still hold edges to two
    # different provisional roots; converged fixpoints have exactly one)
    labels = cur.select(F.col("x").alias("id"), F.col("y").alias("comp")).groupBy("id").agg(
        F.min("comp").alias("comp")
    )
    return (
        nodes.join(labels, "id", "left")
        .select("id", F.coalesce("comp", "id").alias("comp"))
    )


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
    from dedoc_spark.operators import _persist

    cand = minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, shingle_n, max_bucket)
    verified_raw = jaccard_for_pairs(cand, df, text_col, id_col, shingle_n)
    verified = verified_raw.filter(F.col("jaccard") >= threshold)
    comps = connected_components(verified.select("a", "b")).withColumnRenamed("id", id_col)
    # connected_components returns lineage-TRUNCATED labels (checkpointed
    # per round), so the DISK_ONLY frames the chain pinned (minhash
    # signatures + the shingle-set aggregation) have been fully consumed
    # by now — release them here instead of leaking to the session.
    _persist.release(cand)
    _persist.release(verified_raw)
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
    max_block: int = 1000,
) -> DataFrame:
    """Blocked all-pairs n-gram Jaccard — quadratic within each block value,
    so blocks larger than ``max_block`` are DROPPED up front (count + filter,
    mirroring minhash_lsh_pairs' max_bucket): one oversized block can never
    become a task that never finishes. The scale path is
    ``jaccard_for_pairs(minhash_lsh_pairs(df), df)``."""
    from dedoc_spark.functions import shingle_rows

    sets = (
        shingle_rows(df, text_col, id_col, shingle_n)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )
    blocked = df.select(F.col(block_col).alias("blk"), F.col(id_col))
    sizes = blocked.groupBy("blk").agg(F.count("*").alias("sz"))
    blocked = blocked.join(sizes.filter(F.col("sz") <= max_block).select("blk"), "blk")
    sh = blocked.join(sets, id_col)
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
    max_block: int = 1000,
) -> DataFrame:
    """Blocked all-pairs embedding-cosine near-dup — quadratic within each
    block value, so blocks larger than ``max_block`` are DROPPED up front
    (count + filter, mirroring max_bucket). The scale path is
    ``cosine_for_pairs(embedding_lsh_pairs(df, dim), df)``."""
    e = df.select(F.col(block_col).alias("blk"), F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    sizes = e.groupBy("blk").agg(F.count("*").alias("sz"))
    e = e.join(sizes.filter(F.col("sz") <= max_block).select("blk"), "blk")
    a = e.select("blk", F.col(id_col).alias("a"), F.col("v").alias("va"))
    b = e.select("blk", F.col(id_col).alias("b"), F.col("v").alias("vb"))
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def duplicated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 5,
    hash_seed: int = 7777,
) -> DataFrame:
    """Substring-level duplication profile (the signal behind substring
    dedup à la Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better"): every ``window``-token span is hashed; a
    span is DUPLICATED iff its hash occurs more than once in the corpus
    (any document, any position). Returns per document:

      (id, n_windows, n_dup_windows, dup_fraction rounded to 6)

    Scale shape: shingle_rows emits one row per span occurrence with NO
    self-join; the duplicate flag is an unordered COUNT window over the
    32-bit span hash (uniform key), then one groupBy on the doc id.
    The former groupBy(h)+join-back shape evaluated the whole
    shingle+hash subtree TWICE (Spark does no common-subplan
    elimination across join sides) and shuffled it twice; the window
    needs the subtree once and one exchange on h (4 exchanges total in
    the audited r7 plan — two branch repartitions that together carry
    each document once, the h window, the final rollup — 0
    CartesianProduct). Cost linear in total token
    count, never quadratic."""
    from pyspark.sql.window import Window

    from dedoc_spark.functions import shingle_rows

    spans = shingle_rows(df, text_col, id_col, window).select(
        F.col(id_col), hash32(F.col("shingle"), hash_seed).alias("h")
    )
    flagged = spans.select(
        F.col(id_col),
        (F.count("*").over(Window.partitionBy("h")) > 1).alias("is_dup"),
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_windows"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup_windows"),
        F.round(
            F.sum(F.col("is_dup").cast("double")) / F.count("*"), 6
        ).alias("dup_fraction"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 5,
    hash_seed: int = 7777,
) -> DataFrame:
    """Exact substring DEDUP à la Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better", §4.1 ExactSubstr): every
    ``window``-token span whose hash occurs more than once in the corpus
    keeps exactly ONE canonical occurrence — the globally first by
    (doc_id, position) — and the tokens covered by every OTHER occurrence
    are dropped; each document's text is rebuilt from its surviving
    tokens (single-space joined — the operator works on the word-token
    stream, not raw bytes; documented deviation from the suffix-array
    original, which this engine replaces with hashed fixed-width spans).

    ``duplicated_ngram_spans`` is the read-only profile of the same
    signal; this is the actionable removal. Returns
    (id, text_dedup, n_tokens, n_removed) — one row per input document
    (a fully-duplicated document comes back with text_dedup = '').

    Overlap caveat (documented policy, matches the reference Lee et al.
    tooling's behavior on overlapping ranges): the removal set is the
    UNION of all non-canonical occurrences' token ranges, so a canonical
    occurrence overlapped by a DIFFERENT duplicated span's removal can
    itself lose tokens — 'one surviving copy' is guaranteed per removal
    decision, not across overlapping span families.

    Scale shape: posexplode tokens + window leads (codegen) → span hashes;
    ONE groupBy on the 32-bit span hash computes (occurrence count,
    canonical occurrence = min of doc_id·2^31+pos) with map-side partial
    agg; non-canonical occurrences explode into ≤ window covered
    positions; a left-anti join on (id, pos) keeps survivors; one final
    groupBy per doc rebuilds the text. Every exchange keys on a uniform
    value (doc id or span hash), no self-join, cost linear in token
    count. The canonical tie-break is the lexicographic min of the
    (id, pos) struct — any orderable id type, no arithmetic encoding.
    """
    from pyspark.sql.window import Window

    from dedoc_spark.functions import word_tokens

    toks = df.select(
        F.col(id_col), F.posexplode(word_tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    grams = toks.select(
        F.col(id_col),
        "pos",
        F.col("tok").alias("__g0"),
        *[F.lead("tok", k).over(w).alias(f"__g{k}") for k in range(1, window)],
    )
    # 60-bit span hash (first 15 md5 hex chars), NOT hash32: removal is
    # DESTRUCTIVE, and 32-bit collisions (~N²/2^33) would delete tokens
    # from unrelated documents already at ~1M distinct spans; 60 bits
    # keeps the expected collision count ≪ 1 up to ~10^8 spans and stays
    # DuckDB-mirrorable (('0x'||substr(md5(..),1,15))::BIGINT).
    gram_text = F.concat_ws(" ", *[F.col(f"__g{k}") for k in range(window)])
    h60 = F.conv(
        F.substring(F.md5(F.concat(gram_text, F.lit(f"#{hash_seed}"))), 1, 15), 16, 10
    ).cast("bigint")
    spans = grams.filter(F.col(f"__g{window - 1}").isNotNull()).select(
        F.col(id_col),
        "pos",
        h60.alias("h"),
    )
    # canonical = lexicographic min of (id, pos) — struct ordering, so any
    # orderable id type works and nothing overflows (an id*2^31+pos
    # encoding would throw under ANSI for 64-bit ids). Occurrence count
    # and canonical occurrence come from unordered windows over the span
    # hash: the former groupBy(h)+join-back computed the whole
    # posexplode+lead+md5 span subtree twice (no cross-join-side CSE)
    # and shuffled it twice; the windows share one exchange on h.
    from pyspark.sql.window import Window as _W

    wh = _W.partitionBy("h")
    dups = (
        spans.select(
            F.col(id_col),
            "pos",
            F.count("*").over(wh).alias("occ"),
            F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p")))
            .over(wh)
            .alias("canon"),
        )
        .filter(F.col("occ") > 1)
        .filter(
            ~((F.col(id_col) == F.col("canon.i")) & (F.col("pos") == F.col("canon.p")))
        )
    )
    removed = dups.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))).alias("pos"),
    ).distinct()
    kept = toks.join(removed, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok), ' ')").alias(
            "text_dedup"
        ),
        F.count("*").alias("n_kept"),
    )
    totals = toks.groupBy(id_col).agg(F.count("*").alias("n_tokens"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            (F.coalesce(F.col("n_tokens"), F.lit(0)) - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
