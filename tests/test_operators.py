"""Operator tests: dedup, similarity, text stats, boilerplate voting,
multimodal plumbing, streaming extraction."""

import math

import pytest
from pyspark.sql import functions as F

from dedoc_spark.operators.dedup import (
    cosine_for_pairs,
    embedding_lsh_pairs,
    embedding_near_dup,
    exact_dedup,
    jaccard_for_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    with_minhash,
)
from dedoc_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    cosine_topk_multi,
)
from dedoc_spark.operators.textstats import (
    boilerplate_patterns,
    classify_lines,
    explode_lines,
    remove_boilerplate,
    text_profile,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en-site"),
        (2, "the quick brown fox jumps over the lazy dog", "en-site"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today", "en-site"),  # near dup
        (4, "совершенно другой русский текст про документы", "ru-site"),
        (5, "completely unrelated content about spark pipelines", "en-site"),
        (6, "", "en-site"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_exact_dedup(spark, docs):
    groups = exact_dedup(docs).collect()
    dup_group = [g for g in groups if g.dup_count == 2]
    assert len(dup_group) == 1
    assert dup_group[0].rep_id == 1


def test_minhash_identical_signatures(spark, docs):
    sigs = {r.doc_id: r.sig for r in with_minhash(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[5]
    # near-dup shares most minima
    shared = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert shared >= 8


def test_minhash_lsh_pairs(spark, docs):
    pairs = {(r.a, r.b) for r in minhash_lsh_pairs(docs, num_hashes=16, bands=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup collides in some band
    assert (1, 5) not in pairs


def test_ngram_jaccard(spark, docs):
    pairs = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0 < pairs[(1, 3)] < 1.0
    assert pairs[(1, 5)] == 0.0


def test_jaccard_for_pairs_matches_all_pairs(spark, docs):
    """The blessed chain: LSH candidates → pair-driven exact Jaccard must
    agree with the all-pairs form on every candidate it covers."""
    cand = minhash_lsh_pairs(docs, num_hashes=16, bands=8)
    verified = {(r.a, r.b): r.jaccard for r in jaccard_for_pairs(cand, docs).collect()}
    all_pairs = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs).collect()}
    assert verified, "LSH produced no candidates to verify"
    for pair, jac in verified.items():
        assert jac == all_pairs[pair]
    assert verified[(1, 2)] == 1.0


def test_embedding_lsh_pairs_then_cosine(spark, embeddings):
    """Embedding analogue: sign-bucket candidates → pair-driven exact cosine
    finds the planted duplicate and matches the all-pairs cosine values."""
    cand = embedding_lsh_pairs(embeddings, dim=8, planes=4)
    verified = {(r.a, r.b): r.cos for r in cosine_for_pairs(cand, embeddings).collect()}
    assert (7, 99) in verified  # identical vectors share every sign bucket
    assert verified[(7, 99)] == pytest.approx(1.0, abs=1e-3)
    # exactness: spot-check against directly computed cosine
    rows = {r.vec_id: r.embedding for r in embeddings.collect()}
    for (a, b), got in list(verified.items())[:10]:
        va, vb = rows[a], rows[b]
        dot = sum(x * y for x, y in zip(va, vb))
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        assert got == pytest.approx(dot / (na * nb), abs=1e-4)


def test_cosine_topk_multi_matches_single(spark, embeddings):
    """Two-phase multi-query top-k returns exactly what per-query
    cosine_topk returns (same scores, same neighbor ranking)."""
    rows = {r.vec_id: [float(x) for x in r.embedding] for r in embeddings.collect()}
    queries = [(3, rows[3]), (7, rows[7])]
    multi = cosine_topk_multi(embeddings, queries, k=5).collect()
    by_query = {}
    for r in multi:
        by_query.setdefault(r.query_id, []).append((r.neighbor_id, r.cos))
    for qid, vec in queries:
        single = [(r.vec_id, round(r.cos, 4)) for r in cosine_topk(embeddings, vec, k=5).collect()]
        assert by_query[qid] == single


def test_simhash_near_dup_close(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    assert sh[1] == sh[2]
    mask = (1 << 64) - 1
    ham_near = bin((sh[1] ^ sh[3]) & mask).count("1")
    ham_far = bin((sh[1] ^ sh[4]) & mask).count("1")
    assert ham_near < ham_far


@pytest.fixture(scope="module")
def embeddings(spark):
    import hashlib

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest()
        return [b / 255.0 - 0.5 for b in h[:8]]

    rows = [(i, vec(i), i % 3) for i in range(50)]
    rows.append((99, vec(7), 1))  # duplicate of vec 7
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")


def test_cosine_topk_exact(spark, embeddings):
    import hashlib

    q = [b / 255.0 - 0.5 for b in hashlib.md5(b"v7").digest()[:8]]
    top = cosine_topk(embeddings, q, k=3).collect()
    assert {top[0].vec_id, top[1].vec_id} == {7, 99}
    assert top[0].cos == pytest.approx(1.0, abs=1e-6)


def test_cosine_topk_lsh_finds_self(spark, embeddings):
    import hashlib

    q = [b / 255.0 - 0.5 for b in hashlib.md5(b"v7").digest()[:8]]
    top = cosine_topk_lsh(embeddings, q, dim=8, k=3, planes=4).collect()
    assert top[0].vec_id in (7, 99)


def test_embedding_near_dup(spark, embeddings):
    pairs = embedding_near_dup(embeddings, threshold=0.999).collect()
    assert any({p.a, p.b} == {7, 99} for p in pairs)


def test_text_profile(spark, docs):
    prof = {r.doc_id: r for r in text_profile(docs).collect()}
    assert prof[1].lang_guess == "en"
    assert prof[4].lang_guess == "ru"
    assert prof[6].lang_guess == "unknown"
    assert prof[1].n_tokens == 9
    assert prof[6].n_tokens == 0
    assert prof[1].fingerprint == prof[2].fingerprint
    assert 0.0 <= prof[1].quality <= 1.0


def test_classify_lines(spark):
    df = spark.createDataFrame(
        [(1, "title\n1. first\n1.2. nested\nv. roman\n3) bracket\n- bullet\n\nplain")],
        "doc_id bigint, text string",
    )
    lines = classify_lines(explode_lines(df))
    got = {r.line_id: (r.line_type, r.dotted_depth) for r in lines.collect()}
    assert got[0] == ("raw_text", -1)
    assert got[1] == ("dotted_list", 1)
    assert got[2] == ("dotted_list", 2)
    assert got[3] == ("roman_list", -1)
    assert got[4] == ("bracket_list", -1)
    assert got[5] == ("bullet_list", -1)
    assert got[6] == ("empty", -1)
    assert got[7] == ("raw_text", -1)


def test_boilerplate_voting(spark):
    docs = []
    words = ["alpha", "beta", "gamma", "delta"]
    for d in range(4):
        # the body line must differ by *words*: digit masking ('\d+'→'@')
        # correctly folds digit-only differences into one pattern
        text = f"MySite Menu Home\npage {d} headline\nunique {words[d]} body about {words[3 - d]}\n© 2025 MySite page {d}"
        docs.append((f"https://s.example/{d}", "s.example", text))
    docs.append(("https://s.example/x", "s.example", "totally unique document\nwith no shared lines at all\nbody\nend line here"))
    df = spark.createDataFrame(docs, "url string, site string, text string")
    lines = df.select("url", "site", F.posexplode(F.split("text", "\n")).alias("line_id", "line"))
    pats = boilerplate_patterns(lines, site_col="site", doc_col="url")
    got = {r.pattern for r in pats.collect()}
    assert "mysite menu home" in got
    assert "© @ mysite page @" in got
    assert not any("unique" in p for p in got)
    cleaned = remove_boilerplate(lines, pats, site_col="site")
    remaining = [r.line for r in cleaned.filter(F.col("url") == "https://s.example/0").collect()]
    assert "MySite Menu Home" not in remaining
    assert any("unique alpha body" in ln for ln in remaining)


def test_multimodal_real_decode(spark):
    """media_features decodes REAL pixels (pure-python PNG decoder) and
    keeps the error-channel contract for undecodable payloads."""
    import numpy as np

    from dedoc_spark.core.image_decode import encode_png
    from dedoc_spark.operators.multimodal import media_features

    from dedoc_spark.core.image_decode import encode_wav

    solid = np.full((8, 8, 3), 128, dtype=np.uint8)  # mean exactly 128/255
    tone = np.sin(np.linspace(0, 2 * np.pi * 100, 8000))
    rows = [
        ("m1", "image", bytearray(encode_png(solid))),
        ("m2", "audio", bytearray(b"RIFFfake not a wave")),
        ("m3", "image", bytearray(b"")),
        ("m4", "image", bytearray(b"\xff\xd8\xff\xe0 jpeg-not-supported")),
        ("m5", "audio", bytearray(encode_wav(tone, rate=8000))),
        ("m6", "video", bytearray(b"\x00\x00\x00 ftypmp42")),
    ]
    df = spark.createDataFrame(rows, "media_id string, media_type string, media binary")
    out = {r.media_id: r for r in media_features(df).collect()}
    assert out["m1"].error is None and (out["m1"].width, out["m1"].height) == (8, 8)
    assert abs(out["m1"].feature[0] - 128 / 255) < 1e-5  # real pixel mean
    assert abs(out["m1"].feature[3]) < 1e-5  # solid color: zero std
    assert "ValueError" in out["m2"].error  # RIFF but not WAVE
    assert "ValueError" in out["m3"].error
    assert "ValueError" in out["m4"].error  # corrupt JPEG → typed error
    # real WAV: (sample_rate, n_samples) in (width, height), duration first
    assert out["m5"].error is None and (out["m5"].width, out["m5"].height) == (8000, 8000)
    assert abs(out["m5"].feature[0] - 1.0) < 1e-6  # 1 second
    assert abs(out["m5"].feature[1] - 0.7071) < 0.01  # sine RMS ≈ 1/√2
    assert "NotImplementedError" in out["m6"].error  # video stays typed
    out2 = {r.media_id: r for r in media_features(df).collect()}
    assert out2["m1"].feature == out["m1"].feature


def test_streaming_extraction(spark, tmp_path):
    from dedoc_spark.sources.web_pages import ensure_web_pages
    from dedoc_spark.streaming import read_web_pages_stream, start_extraction_stream

    import shutil

    src_dir = tmp_path / "src"
    shutil.copytree(ensure_web_pages(50), src_dir)
    src = str(src_dir)
    stream = read_web_pages_stream(spark, src)
    assert stream.isStreaming
    q = start_extraction_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 50
    assert out.filter("error is not null").count() == 0
    # restart with same checkpoint: no new rows (exactly-once resume)
    q2 = start_extraction_stream(
        read_web_pages_stream(spark, src), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 50


def test_connected_components(spark):
    """Pair graph → min-id components: chain 1-2-3, pair 10-11, singleton
    edges don't exist (nodes come only from pairs)."""
    from dedoc_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)], "a bigint, b bigint"
    )
    comp = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_dedup_chain_end_to_end(spark, docs):
    """minhash_lsh_pairs → jaccard_for_pairs → connected_components: the
    exact dup (1,2) lands in one group with rep 1."""
    from dedoc_spark.operators.dedup import connected_components

    cand = minhash_lsh_pairs(docs, num_hashes=16, bands=8)
    verified = jaccard_for_pairs(cand, docs).filter("jaccard >= 0.8")
    comp = {r.id: r.comp for r in connected_components(verified).collect()}
    assert comp[1] == 1 and comp[2] == 1


def test_dedup_corpus_one_call(spark, docs):
    """dedup_corpus: doc 2 (exact dup of 1) joins comp 1 and loses the
    representative flag; everything else keeps itself."""
    from dedoc_spark.operators.dedup import dedup_corpus

    out = {r.doc_id: (r.comp, r.is_representative) for r in dedup_corpus(docs, threshold=0.9).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    for i in (3, 4, 5, 6):
        assert out[i] == (i, True)
    kept = [i for i, (_, rep) in out.items() if rep]
    assert sorted(kept) == [1, 3, 4, 5, 6]


def test_frame_sample_plan(spark):
    """Video frame fan-out: (video, frame_idx) rows every n frames — the
    partitioning shape for per-frame decode tasks."""
    from dedoc_spark.operators.multimodal import frame_sample_plan

    df = spark.createDataFrame(
        [(1, 100), (2, 15), (3, 0), (4, None)], "media_id bigint, n_frames int"
    )
    got = {}
    for r in frame_sample_plan(df, every_n=30).collect():
        got.setdefault(r.media_id, []).append(r.frame_idx)
    assert got[1] == [0, 30, 60, 90]
    assert got[2] == [0]
    # zero-frame and unknown-frame-count videos emit NO phantom rows
    assert 3 not in got and 4 not in got


def test_ivf_kmeans_and_search(spark, embeddings):
    """IVF coarse quantizer: deterministic k-means, list assignment, probe
    search finds the planted duplicate; fewer rows scanned than the corpus."""
    from dedoc_spark.operators.similarity import (
        cosine_topk_ivf,
        kmeans_fit,
        with_ivf_cluster,
    )

    centroids = kmeans_fit(embeddings, k=4, iters=3, id_col="vec_id")
    assert len(centroids) == 4 and len(centroids[0]) == 8
    # determinism: refit gives identical centroids
    assert kmeans_fit(embeddings, k=4, iters=3, id_col="vec_id") == centroids

    bucketed = with_ivf_cluster(embeddings, centroids)
    counts = {r.ivf_cluster: r.n for r in bucketed.groupBy("ivf_cluster").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 51 and len(counts) >= 2  # real partitioning

    import hashlib

    q = [b / 255.0 - 0.5 for b in hashlib.md5(b"v7").digest()[:8]]
    top = cosine_topk_ivf(bucketed, centroids, q, k=3, nprobe=2).collect()
    assert top[0].vec_id in (7, 99)
    assert top[0].cos == pytest.approx(1.0, abs=1e-6)
    # probing fewer lists scans fewer rows than the corpus
    probed = bucketed.filter(F.col("ivf_cluster").isin(
        sorted(counts, key=lambda c: -counts[c])[:1])).count()
    assert probed < 51


def test_lang_id_multi(spark):
    from dedoc_spark.functions import lang_id_multi

    rows = [
        (1, "the cat sat on the mat and that is that"),
        (2, "der Hund ist nicht in das Haus und die Katze"),
        (3, "le chat est dans la maison avec les souris"),
        (4, "el perro que vive con los gatos por las calles"),
        (5, "русский текст про кошек и собак"),
        (6, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    got = {r.id: r.lang for r in df.select("id", lang_id_multi(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "ru", 6: "unknown"}


def test_gopher_and_c4_filters(spark):
    from dedoc_spark.operators.textstats import c4_clean_text, c4_line_flags, gopher_quality_flags

    good = " ".join(["the quick brown fox jumps over that lazy dog with style and it ran home"] * 5)
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "### ### … … … short"),           # symbol soup, too short
            (3, "a b c d e " * 20),                 # no stopwords, tiny words
        ],
        "doc_id bigint, text string",
    )
    flags = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    assert flags[1].gopher_pass
    assert not flags[2].gopher_pass and not flags[2].ok_symbol_ratio
    assert not flags[3].gopher_pass and not flags[3].ok_stopwords

    c4_docs = spark.createDataFrame(
        [(1, "A good first sentence.\nmenu\nEnable javascript to continue.\n"
             "This page uses cookie banners.\nAnother proper sentence here!\nfunction() { x }")],
        "doc_id bigint, text string",
    )
    kept = {r.line_id: r.keep for r in c4_line_flags(c4_docs).collect()}
    assert kept[0] is True and kept[4] is True
    assert kept[1] is False and kept[2] is False and kept[3] is False and kept[5] is False
    clean = c4_clean_text(c4_docs).collect()[0].clean_text
    assert clean == "A good first sentence.\nAnother proper sentence here!"


def test_normalized_url(spark):
    from dedoc_spark.functions import normalized_url

    cases = [
        ("HTTP://Site.Example:80/path/9?utm_source=x&b=2&a=1#frag", "http://site.example/path/9?a=1&b=2"),
        ("https://site.example/1", "https://site.example/1"),
        ("https://SITE.example:443?a=1&utm_campaign=z", "https://site.example/?a=1"),
        ("http://site.example/p?fbclid=abc&z=9&y=8", "http://site.example/p?y=8&z=9"),
        ("https://host.example:8443/x", "https://host.example:8443/x"),  # non-default port kept
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r.n for r in df.select(normalized_url(F.col("u")).alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_gopher_repetition_flags(spark):
    from dedoc_spark.operators.textstats import gopher_repetition_flags

    docs = spark.createDataFrame(
        [
            (1, "unique one\nunique two\nunique three\nunique four"),
            (2, "same line\nsame line\nsame line\nother"),              # 3/4 dup lines
            (3, "buy now " * 30),                                        # one bigram dominates
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in gopher_repetition_flags(docs).collect()}
    assert got[1].rep_pass and got[1].dup_line_frac == 0.0
    assert not got[2].rep_pass and got[2].dup_line_frac == 0.75
    assert not got[3].rep_pass and got[3].top_bigram_frac > 0.2


def test_redact_pii(spark):
    from dedoc_spark.functions import redact_pii

    df = spark.createDataFrame(
        [("mail alice.b+tag@sub.example.org, phone +7 (926) 123-45-67, host 192.168.1.10, year 2026",)],
        "t string",
    )
    got = df.select(redact_pii(F.col("t")).alias("r")).collect()[0].r
    assert got == "mail <EMAIL>, phone <PHONE>, host <IP>, year 2026"


def test_registered_domain(spark):
    from dedoc_spark.functions import registered_domain

    cases = [
        ("https://www.news.example.com/a/1", "example.com"),
        ("http://blogs.paper.co.uk/p", "paper.co.uk"),
        ("https://example.org/", "example.org"),
        ("https://cdn.static.shop.example.com:8443/x", "example.com"),
        ("https://localhost/x", "localhost"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r.d for r in df.select(registered_domain(F.col("u")).alias("d")).collect()]
    assert got == [want for _, want in cases]


def test_sentences(spark):
    from dedoc_spark.functions import sentences

    df = spark.createDataFrame(
        [("First one. Second!  Third?!Still third... Fourth",)], "t string"
    )
    got = df.select(sentences(F.col("t")).alias("s")).collect()[0].s
    assert got == ["First one.", "Second!", "Third?!Still third...", "Fourth"]


def test_connected_components_star_matches_label_prop(spark):
    """large-star/small-star contraction (the big-graph path) produces the
    same components as min-label propagation on chains, cliques, and a
    random-ish graph."""
    from dedoc_spark.operators.dedup import connected_components

    edge_sets = [
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],  # long chain
        [(1, 2), (1, 3), (2, 3), (10, 11)],  # clique + pair
        [(i, i + 1) for i in range(1, 15)] + [(100, 3), (200, 201), (7, 100)],
        [(5, 1), (9, 5), (2, 9), (40, 41), (41, 39)],  # unsorted ids
    ]
    for edges in edge_sets:
        pairs = spark.createDataFrame(edges, "a bigint, b bigint")
        lp = {r.id: r.comp for r in connected_components(pairs).collect()}
        st = {r.id: r.comp for r in connected_components(pairs, algorithm="star").collect()}
        assert st == lp, f"star != label_prop on {edges}"


def test_connected_components_exhaustion_warns(spark):
    """ADVICE r2: exhausting max_iter without converging must warn (or raise
    with on_exhausted='raise'), never return silently wrong labels."""
    import warnings

    import pytest

    from dedoc_spark.operators.dedup import connected_components

    # a 6-chain needs ~5 propagation hops; max_iter=2 cannot converge
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "a bigint, b bigint"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(pairs, max_iter=2)
        assert any("not converged" in str(x.message) for x in w)
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(pairs, max_iter=2, on_exhausted="raise")


def test_ngram_jaccard_max_block_cap(spark, docs):
    """Blocks larger than max_block are dropped up front — no unbounded
    all-pairs plan; a cap of 1 removes every pair."""
    from dedoc_spark.operators.dedup import ngram_jaccard_pairs

    uncapped = ngram_jaccard_pairs(docs, max_block=10**6).count()
    assert uncapped > 0
    assert ngram_jaccard_pairs(docs, max_block=1).count() == 0


def test_embedding_near_dup_max_block_cap(spark, embeddings):
    from dedoc_spark.operators.dedup import embedding_near_dup

    uncapped = embedding_near_dup(embeddings, threshold=0.0, max_block=10**6).count()
    assert uncapped > 0
    assert embedding_near_dup(embeddings, threshold=0.0, max_block=1).count() == 0


def test_unpersist_intermediates_releases_blocks(spark):
    """ADVICE r2: multi-level explodes and LSH pin DISK_ONLY frames for the
    duration of the caller's action; unpersist_intermediates releases them."""
    from dedoc_spark.operators.archives import extract_with_attachments, unpersist_intermediates
    from dedoc_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [("https://a/x.txt", bytearray(b"plain text body"))], "url string, html binary"
    )
    out = extract_with_attachments(df, max_depth=2)
    out.count()
    assert unpersist_intermediates(out) == 2  # one frame per depth level

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id bigint, text string",
    )
    pairs = minhash_lsh_pairs(docs)
    pairs.count()
    assert unpersist_intermediates(pairs) == 1


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee (Schleimer et al. 2003): two documents sharing a
    substring of length ≥ k + window − 1 (= 8 normalized chars) share at
    least one fingerprint; disjoint documents share none."""
    from dedoc_spark.operators.textstats import winnow_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "XX quick brown fox YY totally different tail"),
            (3, "zzzz qqqq wwww vvvv kkkk mmmm"),
        ],
        "doc_id bigint, text string",
    )
    fps = winnow_fingerprints(docs, window=4, k=5)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]  # share "quickbrownfox" (13 ≥ 8)
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # determinism
    again = {r.doc_id: r.fp for r in fps.orderBy("doc_id", "fp").limit(3).collect()}
    assert again == {r.doc_id: r.fp for r in fps.orderBy("doc_id", "fp").limit(3).collect()}


def test_winnow_fingerprints_long_doc_exact(spark):
    """VERDICT r3 "what's wrong" #1: the rightmost-min tie-break encoding
    must stay exact past 2^20 normalized chars. A 2M-char single-character
    document has every 5-gram identical, so the fingerprint set must be
    EXACTLY {h('aaaaa')} — the old 2^20 encoding let the position term go
    negative and leaked a corrupted h−1 fingerprint."""
    import hashlib

    from dedoc_spark.operators.textstats import winnow_fingerprints

    docs = spark.createDataFrame([(1, "a" * 2_000_000)], "doc_id bigint, text string")
    fps = [r.fp for r in winnow_fingerprints(docs, k=5, window=4).collect()]
    expected = int(hashlib.md5(b"aaaaa#4242").hexdigest()[:8], 16)
    assert fps == [expected]


def test_winnow_fingerprints_long_doc_guarantee(spark):
    """The winnowing guarantee holds when the shared substring sits beyond
    the 2^20 position mark of a long document."""
    from dedoc_spark.operators.textstats import winnow_fingerprints

    long_text = "".join(chr(ord("a") + (i * 7 + 3) % 26) for i in range(1_300_000))
    shared = long_text[1_200_000:1_200_040]
    docs = spark.createDataFrame(
        [(1, long_text), (2, "zzz " + shared + " qqq")], "doc_id bigint, text string"
    )
    by_doc = {}
    for r in winnow_fingerprints(docs, k=5, window=4).collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]


def test_jaccard_for_pairs_shingle_cap(spark, docs):
    """max_shingles bounds the per-doc shingle arrays (bottom-k sketch):
    identical documents still verify at exactly 1.0 under any cap, values
    stay in [0, 1], and small docs are untouched (exact) below the cap."""
    cand = minhash_lsh_pairs(docs, num_hashes=16, bands=8)
    exact = {(r.a, r.b): r.jaccard for r in jaccard_for_pairs(cand, docs, max_shingles=None).collect()}
    default = {(r.a, r.b): r.jaccard for r in jaccard_for_pairs(cand, docs).collect()}
    assert default == exact  # every test doc is far below the default cap
    capped = {(r.a, r.b): r.jaccard for r in jaccard_for_pairs(cand, docs, max_shingles=3).collect()}
    assert capped[(1, 2)] == 1.0  # same set → same bottom-k sketch
    assert set(capped) == set(exact)
    assert all(0.0 <= v <= 1.0 for v in capped.values())


def test_dedup_corpus_releases_persisted(spark, docs):
    """VERDICT r3 "what's wrong" #2: dedup_corpus must not leak the
    DISK_ONLY signature frame — connected_components hands back
    lineage-truncated labels, so the one-call path releases it before
    returning (nothing new left in the persist registry)."""
    from dedoc_spark.operators import _persist
    from dedoc_spark.operators.dedup import dedup_corpus

    _persist.release()  # drain anything earlier tests pinned
    out = dedup_corpus(docs, threshold=0.8)
    assert all(not v for v in _persist._REGISTRY.values())
    rows = {r.doc_id: (r.comp, r.is_representative) for r in out.collect()}
    assert rows[1] == (1, True) and rows[2] == (1, False)  # exact dups group
    assert rows[5] == (5, True)


def test_unpersist_intermediates_registry_fallback(spark):
    """ADVICE r3: release must work even when the caller only holds a
    DERIVED frame (the _dedoc_persisted attribute does not survive
    transformations) — the module registry is the fallback."""
    from dedoc_spark.operators import _persist
    from dedoc_spark.operators.archives import unpersist_intermediates
    from dedoc_spark.operators.dedup import minhash_lsh_pairs

    _persist.release()
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id bigint, text string",
    )
    derived = minhash_lsh_pairs(docs).filter("a >= 0")  # attribute lost here
    derived.count()
    assert not hasattr(derived, "_dedoc_persisted")
    assert unpersist_intermediates(derived) == 1  # registry still tracks sigs
    assert unpersist_intermediates(derived) == 0  # idempotent / drained


def test_bzh_text_page_not_misrouted(spark):
    """ADVICE r3: a text page that merely STARTS with the ASCII letters
    'BZh' is not a bzip2 stream (no digit level byte) and must extract
    normally instead of coming back as an archive error row."""
    import bz2

    from dedoc_spark.operators.archives import extract_with_archives, unpersist_intermediates

    df = spark.createDataFrame(
        [
            ("page.txt", bytearray(b"BZh stands for bzip2 huffman")),
            ("real.bz2", bytearray(bz2.compress(b"inner body text"))),
        ],
        "url string, html binary",
    )
    out = extract_with_archives(df, max_depth=1)
    rows = {r.url: r for r in out.collect()}
    unpersist_intermediates(out)
    assert rows["page.txt"].error is None
    assert "BZh stands for bzip2" in rows["page.txt"].text_extracted
    member = next(r for u, r in rows.items() if u.startswith("real.bz2#"))
    assert member.error is None
    assert "inner body text" in member.text_extracted


def test_remove_duplicated_spans(spark):
    """Lee et al. exact-substring removal: the globally FIRST occurrence
    of a duplicated span survives, every other occurrence's tokens are
    dropped; unique text is untouched; a fully-duplicated doc empties."""
    from dedoc_spark.operators.dedup import remove_duplicated_spans

    boiler = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {boiler} closing remark"),
            (2, f"{boiler} unique tail text"),
            (3, boiler),
            (4, "completely unrelated document body"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(docs, window=5).collect()}
    # doc 1 holds the canonical occurrence (first by (doc_id, pos)) → intact
    assert out[1].text_dedup == f"intro words here {boiler} closing remark"
    assert out[1].n_removed == 0
    # doc 2 loses the boilerplate span, keeps its unique tail
    assert out[2].text_dedup == "unique tail text"
    assert out[2].n_removed == 5
    # doc 3 is ONLY the duplicated span → emptied, row still present
    assert out[3].text_dedup == "" and out[3].n_removed == 5
    # untouched doc
    assert out[4].text_dedup == "completely unrelated document body"
    assert out[4].n_removed == 0
    # n_tokens accounting
    assert out[2].n_tokens == 8 and out[3].n_tokens == 5


def test_minhash_mixed_family_equivalent_collisions(spark):
    """The 'mixed' hash family (one md5 + affine mixes — the 100 TB path)
    must reproduce the md5 family's COLLISION semantics: exact duplicates
    share full signatures, near-duplicates collide in bands, unrelated
    docs do not; values differ between families by design."""
    from dedoc_spark.operators.dedup import minhash_lsh_pairs, with_minhash

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, base + " extra tail words here"),  # near dup
            (4, "completely different content with other tokens entirely"),
        ],
        "doc_id bigint, text string",
    )
    sig = {r.doc_id: r.sig for r in with_minhash(docs, hash_family="mixed").collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[4]
    # band collisions (near-dup 3 shares ≥1 band with 1)
    pairs = {
        (r.a, r.b)
        for r in minhash_lsh_pairs(docs, hash_family="mixed").collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs
    assert not any(4 in p for p in pairs)
    # the md5 family agrees on exact dups and on excluding the unrelated
    # doc (near-dup band collisions are family-dependent by nature)
    pairs_md5 = {(r.a, r.b) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs_md5
    assert not any(4 in p for p in pairs_md5)
    # determinism
    sig2 = {r.doc_id: r.sig for r in with_minhash(docs, hash_family="mixed").collect()}
    assert sig == sig2


def test_lsh_bands_validation(spark, docs):
    """bands must divide num_hashes — bands > num_hashes would silently
    return ZERO pairs (empty band keys all collide, then the bucket cap
    drops everything)."""
    import pytest

    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(docs, num_hashes=8, bands=16)
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=3)


def test_unpersist_empty_handle_releases_nothing(spark):
    """A frame whose operator pinned NOTHING (empty handle) must not drain
    the session registry (other operators' still-pending frames)."""
    from dedoc_spark.operators import _persist
    from dedoc_spark.operators.archives import extract_with_archives, unpersist_intermediates
    from dedoc_spark.operators.dedup import minhash_lsh_pairs

    _persist.release()
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id bigint, text string",
    )
    pairs = minhash_lsh_pairs(docs)  # registers its signature + sets frames
    pages = spark.createDataFrame([("u.txt", bytearray(b"plain"))], "url string, html binary")
    out = extract_with_archives(pages, max_depth=0)  # pins nothing
    out.count()
    n_before = len(_persist._REGISTRY)
    assert unpersist_intermediates(out) == 0  # empty handle → release nothing
    assert len(_persist._REGISTRY) == n_before
    pairs.count()
    unpersist_intermediates()  # session drain still works
    assert all(not v for v in _persist._REGISTRY.values())


def test_persist_registry_session_keyed(spark):
    """VERDICT r4 "what's wrong" #3: the registry is keyed by the owning
    session's application id — frames registered under a stopped session
    are pruned eagerly on the next register()/release() instead of
    lingering as stale handles in a long-lived multi-session driver."""
    from dedoc_spark.operators import _persist

    _persist.release()  # drain anything earlier tests pinned

    class _Ctx:
        def __init__(self, app_id):
            self.applicationId = app_id

    class _Sess:
        def __init__(self, app_id):
            self.sparkContext = _Ctx(app_id)

    class FakeFrame:
        def __init__(self, app_id):
            self.sparkSession = _Sess(app_id)
            self.released = 0

        def unpersist(self):
            self.released += 1

    # simulate a frame left over from a session that has since stopped
    dead = FakeFrame("app-dead-123")
    _persist._REGISTRY.setdefault("app-dead-123", []).append(dead)

    live_id = spark.sparkContext.applicationId
    live = FakeFrame(live_id)
    _persist.register([live])
    assert "app-dead-123" not in _persist._REGISTRY  # pruned on register
    assert live in _persist._REGISTRY[live_id]

    assert _persist.release() == 1  # only the live frame drained
    assert live.released == 1
    assert dead.released == 0
    assert all(not v for v in _persist._REGISTRY.values())

def test_recursion_deep_attachments_param(spark):
    """recursion_deep_attachments (api_args.py:19) overrides the
    operator's max_depth: 0 disables attachment re-entry entirely."""
    import zipfile
    import io

    from dedoc_spark.operators.archives import extract_with_attachments, unpersist_intermediates

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("inner.txt", "inner text")
    df = spark.createDataFrame([("a.zip", bytearray(buf.getvalue()))], "url string, html binary")

    out = extract_with_attachments(df, params={"recursion_deep_attachments": "0"})
    urls = [r.url for r in out.collect()]
    unpersist_intermediates(out)
    assert urls == ["a.zip"]

    out = extract_with_attachments(df, params={"recursion_deep_attachments": "1"})
    urls = sorted(r.url for r in out.collect())
    unpersist_intermediates(out)
    assert urls == ["a.zip", "a.zip#inner.txt"]

def test_need_content_analysis_false_lists_without_parsing(spark):
    """need_content_analysis=false (attachments_handler.py:52-57): the
    attachment row appears (url#member) but its contents are NOT parsed —
    a placeholder row with empty extraction and no error."""
    import io
    import zipfile

    from dedoc_spark.operators.archives import extract_with_attachments, unpersist_intermediates

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("inner.txt", "inner text")
    df = spark.createDataFrame([("a.zip", bytearray(buf.getvalue()))], "url string, html binary")

    out = extract_with_attachments(
        df, max_depth=1, params={"need_content_analysis": "false"}
    )
    rows = {r.url: r for r in out.collect()}
    unpersist_intermediates(out)
    member = rows["a.zip#inner.txt"]
    assert member.n_lines == 0 and member.text_extracted == "" and member.error is None
    # default (or explicit true): contents parsed
    out = extract_with_attachments(df, max_depth=1, params={})
    rows = {r.url: r for r in out.collect()}
    unpersist_intermediates(out)
    assert "inner text" in rows["a.zip#inner.txt"].text_extracted

def test_jaccard_kmv_symmetric_estimator_unbiased(spark):
    """Symmetric KMV branch: when one side exceeds the cap, the estimate
    uses the k hash-smallest of the UNION and is close to the true
    jaccard (≈1/sqrt(k) error) — not the old asymmetric lower bound,
    which for this fixture would read ~k/|A| ≈ 0.2 of the true value."""
    import math

    # doc 1: 1200 distinct tokens; doc 2: the same minus a small tail →
    # true jaccard ≈ 1000/1200 with unigram-ish shingles via 3-grams of a
    # long shared run. Build from numbered words so 3-shingles are unique.
    words = [f"tok{i}" for i in range(1202)]
    a = " ".join(words)              # shingles: 1200 windows
    b = " ".join(words[:1002])       # shared prefix → 1000 windows
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id bigint, text string")
    pairs = spark.createDataFrame([(1, 2)], "a bigint, b bigint")

    true_j = {(r.a, r.b): r.jaccard for r in
              jaccard_for_pairs(pairs, docs, max_shingles=None).collect()}[(1, 2)]
    est = {(r.a, r.b): r.jaccard for r in
           jaccard_for_pairs(pairs, docs, max_shingles=200).collect()}[(1, 2)]
    tol = 3 / math.sqrt(200)  # ≈0.21; the old asymmetric bias was ≈0.67 low
    assert abs(est - true_j) <= tol, (est, true_j)
    # identical docs still read exactly 1.0 under any cap
    docs_eq = spark.createDataFrame([(1, a), (2, a)], "doc_id bigint, text string")
    eq = {(r.a, r.b): r.jaccard for r in
          jaccard_for_pairs(pairs, docs_eq, max_shingles=50).collect()}[(1, 2)]
    assert eq == 1.0


def test_need_content_analysis_false_stops_recursion(spark):
    """With need_content_analysis=false the reference never DISCOVERS
    nested attachments (attachments_handler.py:52-68 only finds deeper
    levels by parsing each member) — so a zip inside a zip yields its
    level-1 placeholder row and nothing deeper, even with depth budget
    left."""
    import io
    import zipfile

    from dedoc_spark.operators.archives import extract_with_attachments, unpersist_intermediates

    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("deep.txt", "deep text")
    outer = io.BytesIO()
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("inner.zip", inner.getvalue())
    df = spark.createDataFrame([("a.zip", bytearray(outer.getvalue()))], "url string, html binary")

    out = extract_with_attachments(
        df, max_depth=3, params={"need_content_analysis": "false"}
    )
    urls = sorted(r.url for r in out.collect())
    unpersist_intermediates(out)
    assert urls == ["a.zip", "a.zip#inner.zip"]

    # control: with parsing on, the deep member IS discovered
    out = extract_with_attachments(df, max_depth=3, params={})
    urls = sorted(r.url for r in out.collect())
    unpersist_intermediates(out)
    assert "a.zip#inner.zip#deep.txt" in urls


def test_return_format_rendered_column_on_pipeline_path(spark):
    """return_format on the Spark stage (ADVICE r5): the stage schema
    grows a nullable `rendered` column ONLY when the param is set, and it
    carries the rendering instead of silently dropping it."""
    from dedoc_spark.operators.pipeline import extract_stage

    df = spark.createDataFrame(
        [("a.html", bytearray(b"<html><body><p>Hi</p></body></html>"), None)],
        "url string, html binary, text string",
    )
    default = extract_stage(df)
    assert "rendered" not in default.columns  # default bytes/schema stable

    out = extract_stage(df, params={"return_format": "plain_text"})
    assert "rendered" in out.columns
    row = out.collect()[0]
    assert row.rendered == row.text_extracted

    html = extract_stage(df, params={"return_format": "html"}).collect()[0]
    assert html.rendered and "<" in html.rendered
