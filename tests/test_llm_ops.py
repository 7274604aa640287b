"""Property tests for the approximate LLM-pipeline ops (the surfaces the
DuckDB oracle cannot grade): LSH recall vs brute force, SimHash locality,
language-ID accuracy against the corpus's own lang labels, multimodal
feature determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_neo4j_spark.operators import dedup as dd
from docker_neo4j_spark.operators import multimodal as mm
from docker_neo4j_spark.operators import similarity as sim
from docker_neo4j_spark.operators import text as tx
from docker_neo4j_spark.sources.tpch import load_tables


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_tables(spark, sf_dir)["documents"].cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_tables(spark, sf_dir)["embeddings"].cache()


def test_exact_dedup_finds_planted_duplicates(spark, docs):
    # Plant exact copies: every digest group must collapse to one keeper.
    doubled = docs.unionAll(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    out = dd.exact_dedup(doubled).cache()
    assert out.count() == docs.count()
    assert out.agg(F.min("n_copies")).first()[0] == 2
    # keeper is always the original (lower) id
    assert out.where(F.col("keep_id") >= 1_000_000).count() == 0


def test_minhash_lsh_recall_vs_brute_force(spark, docs):
    """LSH candidates must recover ≥90% of true Jaccard≥0.8 pairs."""
    # Plant near-duplicates: copy docs with the first token dropped.
    toks = F.split(F.col("text"), " ")
    mutated = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 2, 100000)).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionAll(mutated)

    # truth: all-pairs Jaccard on this small corpus (test-only crossJoin)
    sh = corpus.select(F.col("doc_id").alias("_k"), dd.shingles("text").alias("_sh"))
    a = sh.select(F.col("_k").alias("key_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_k").alias("key_b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    union = F.size(F.array_union("_sha", "_shb")).cast("double")
    truth = (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", (inter / F.greatest(union, F.lit(1.0))).alias("j"))
        .where(F.col("j") >= 0.8)
    )
    n_truth = truth.count()
    assert n_truth >= docs.count() * 0.9  # the planted pairs are near-dups

    cand = dd.minhash_lsh_candidates(corpus, num_hashes=32, bands=16)
    hit = truth.join(cand, ["key_a", "key_b"], "left_semi").count()
    assert hit / n_truth >= 0.9


def test_simhash_locality(spark, docs):
    """Planted near-dups sit within small Hamming distance; the signature
    is deterministic across runs."""
    toks = F.split(F.col("text"), " ")
    mutated = docs.select(
        F.col("doc_id").alias("m_id"),
        F.concat_ws(" ", F.slice(toks, 2, 100000)).alias("text"),
    )
    sig_o = dd.simhash(docs).withColumnRenamed("simhash", "s1")
    sig_m = dd.simhash(mutated, key="m_id").withColumnRenamed("simhash", "s2")
    joined = sig_o.join(sig_m, F.col("doc_id") == F.col("m_id")).select(
        dd.hamming64(F.col("s1"), F.col("s2")).alias("d")
    )
    med = joined.agg(F.percentile_approx("d", 0.5)).first()[0]
    assert med <= 8
    # determinism
    again = dd.simhash(docs).withColumnRenamed("simhash", "s3")
    diff = sig_o.join(again, "doc_id").where(F.col("s1") != F.col("s3")).count()
    assert diff == 0


def test_language_id_accuracy(spark):
    """Heuristic language-ID classifies real multilingual sentences.

    (The synthetic corpus's ``lang`` column is a random label over
    English-token word salad, so it carries no signal to recover — the
    heuristic is exercised on genuine text here and oracle-checked for
    determinism over the corpus in ``llm_language_id``.)"""
    samples = [
        (1, "the cat is on the roof and it is happy with that", "en"),
        (2, "der Hund ist nicht mit der Katze und das ist gut", "de"),
        (3, "el perro es un animal que vive en la casa por siempre", "es"),
        (4, "le chien est dans les bois et une riviere au nord pas loin", "fr"),
        (5, "这是一个中文句子 spark 也可以处理", "zh"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in samples], ["doc_id", "text"])
    pred = {r["doc_id"]: r["lang_pred"] for r in tx.language_id(df).collect()}
    for i, _, want in samples:
        assert pred[i] == want, f"doc {i}: {pred[i]} != {want}"


def test_ann_recall_vs_brute_force(spark, emb):
    """LSH-bucketed ANN top-5 recovers ≥60% of the exact top-5."""
    queries = emb.where(F.col("vec_id") < 20)
    exact = sim.brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = sim.ann_topk(emb, queries, k=5, dim=64).select("query_id", "neighbor_id")
    n_exact = exact.count()
    hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    assert n_exact == 20 * 5
    assert hit / n_exact >= 0.6


def test_multimodal_feature_contract(spark, docs):
    media = mm.attach_media(docs)
    feats = mm.extract_features(media, dim=8).cache()
    assert feats.count() == docs.count()
    row = feats.where(F.size("feature") != 8).count()
    assert row == 0
    # L1-normalized histogram: components sum to ~1
    s = feats.select(
        F.aggregate("feature", F.lit(0.0), lambda a, x: a + x).alias("s")
    ).agg(F.min("s"), F.max("s")).first()
    assert abs(s[0] - 1.0) < 1e-5 and abs(s[1] - 1.0) < 1e-5
    # decode is import-guarded: the explicit stub without PIL, real with
    if not mm.HAS_PIL:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG")


@pytest.mark.skipif(not mm.HAS_PIL, reason="PIL not in this container")
def test_real_codec_decode_and_resize(spark, docs):
    """Runs only where PIL exists: the same module code decodes and
    resizes real PNG bytes unmodified (import-guarded codec path)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    img = mm.decode_image(png)
    assert img.size == (8, 8)
    media = spark.createDataFrame(
        [(1, png, "png", len(png))], schema=mm.MEDIA_SCHEMA
    )
    out = mm.resize_images(media, width=4, height=4, codec="pil").collect()
    assert len(out) == 1 and out[0]["width"] == 4
    assert mm.decode_image(bytes(out[0]["payload"])).size == (4, 4)


def test_pil_codec_fails_loud_without_pil():
    if mm.HAS_PIL:
        pytest.skip("PIL present; stub branch not reachable")
    import pandas  # noqa: F401 — just to mirror operator imports

    with pytest.raises(NotImplementedError, match="requires PIL"):
        mm.resize_images(None, codec="pil")


def test_fingerprint_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in tx.fingerprint(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


def test_embed_text_deterministic_and_normalized(spark):
    from docker_neo4j_spark.operators.embed import embed_documents

    df = spark.createDataFrame(
        [(1, "spark engine fast"), (2, "spark engine fast"), (3, "completely different words")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["embedding"] for r in embed_documents(df, dim=16).collect()}
    assert out[1] == out[2]  # deterministic across rows/processes
    assert out[1] != out[3]
    norm = sum(x * x for x in out[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-5
    assert len(out[1]) == 16


def test_embed_pluggable_encoder_hook(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_ENCODER_MODULE names a module exposing encode_batch —
    the real-model plug point (r8 verdict). A synthetic module proves the
    executor-side resolution end-to-end; unset → FNV stub (prior test)."""
    import sys

    mod = tmp_path / "fake_encoder_mod.py"
    mod.write_text(
        "def encode_batch(texts, dim):\n"
        "    return [[float(len(t or ''))] * dim for t in texts]\n"
    )
    # executors don't share the driver's post-start env/sys.path: the
    # module NAME rides the closure (env read driver-side at construction)
    # and the FILE ships via addPyFile — the documented deployment recipe
    spark.sparkContext.addPyFile(str(mod))
    sys.modules.pop("fake_encoder_mod", None)
    monkeypatch.setenv("SPARK_GRAFT_ENCODER_MODULE", "fake_encoder_mod")
    from docker_neo4j_spark.operators.embed import embed_documents

    df = spark.createDataFrame([(1, "abc"), (2, "abcde")], ["doc_id", "text"])
    out = {r["doc_id"]: r["embedding"] for r in embed_documents(df, dim=4).collect()}
    assert out[1] == [3.0, 3.0, 3.0, 3.0]
    assert out[2] == [5.0, 5.0, 5.0, 5.0]


def test_embed_bad_encoder_module_fails_loud(spark):
    from docker_neo4j_spark.operators import embed as em

    # misconfiguration must raise, never silently fall back to the stub
    # (a silent fallback would fake real encodings)
    with pytest.raises(RuntimeError, match="encode_batch"):
        em._load_encoder("no_such_module_xyz")


@pytest.mark.skipif(
    True, reason="real model encoder not available in this container"
)
def test_embed_real_model_encoder():
    """Placeholder for the real-model path: set SPARK_GRAFT_ENCODER_MODULE
    to a model-client module in an environment that has one and drop the
    skip — the plumbing is covered by the synthetic-module test above."""


def test_kafka_wiring_gated(spark):
    from docker_neo4j_spark.streaming.kafka import kafka_available, read_kafka_events

    if kafka_available(spark):
        df = read_kafka_events(spark, "localhost:9092", "events")
        assert df.isStreaming
    else:
        # connector jar absent in this container: building the reader must
        # fail with Spark's standard missing-data-source error, not a crash
        import pytest as _pytest

        with _pytest.raises(Exception, match="kafka|KAFKA|DATA_SOURCE"):
            read_kafka_events(spark, "localhost:9092", "events")


def test_token_counts_known_strings(spark):
    from docker_neo4j_spark.operators.text import token_counts

    df = spark.createDataFrame(
        [
            (1, "Hello world"),                # ws 2; bpe: Hello, " world"
            (2, "don't stop"),                 # ws 2; bpe: don, 't, " stop"
            (3, "  a  b  "),                   # ws 2 (empty splits dropped)
            (4, "x123,y!"),                    # bpe: x, 123, ",", y, "!"
            (5, ""),                           # 0 / 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in token_counts(df).collect()}
    assert out[1] == (2, 2)
    assert out[2] == (2, 3)
    assert out[3] == (2, 2)
    assert out[4] == (1, 5)
    assert out[5] == (0, 0)


def test_ivf_trained_recall_and_determinism(spark, emb):
    """KMeans-codebook IVF: nprobe=3 of 8 cells recovers ≥60% of exact
    top-5; same seed → identical assignment and results."""
    assigned, centroids = sim.ivf_build(emb, n_cells=8, seed=42)
    queries = emb.where(F.col("vec_id") < 20)
    exact = sim.brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = sim.ivf_search(assigned, centroids, queries, k=5, nprobe=3).select(
        "query_id", "neighbor_id"
    )
    n_exact = exact.count()
    hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    assert hit / n_exact >= 0.6

    assigned2, centroids2 = sim.ivf_build(emb, n_cells=8, seed=42)
    a1 = sorted((r["vec_id"], r["_cell"]) for r in assigned.collect())
    a2 = sorted((r["vec_id"], r["_cell"]) for r in assigned2.collect())
    assert a1 == a2


def test_resize_and_frame_sample_contracts(spark, docs):
    media = mm.attach_media(docs.limit(20))

    resized = mm.resize_images(media, width=16, height=4).cache()
    assert resized.count() == 20
    bad = resized.where((F.col("n_bytes") != 64) | (F.length("payload") != 64)).count()
    assert bad == 0  # every payload is exactly width*height bytes
    # deterministic: same input -> byte-identical output
    again = {r["media_id"]: bytes(r["payload"]) for r in mm.resize_images(media, 16, 4).collect()}
    for r in resized.collect():
        assert bytes(r["payload"]) == again[r["media_id"]]

    frames = mm.sample_frames(media, frame_bytes=32, every_n=2, max_frames=3).cache()
    # fan-out: every media row yields 1..3 frames, indices are even
    per = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {r["media_id"] for r in media.select("media_id").collect()}
    assert all(1 <= n <= 3 for n in per.values())
    assert frames.where(F.col("frame_idx") % 2 != 0).count() == 0
    assert frames.where(F.length("frame") > 32).count() == 0


def test_simhash_neardup_exact_recall_within_radius(spark, docs):
    """4x16-bit banding gives EXACT recall for Hamming <= 3 (pigeonhole):
    the banded bucket join must find every brute-force pair."""
    d = docs.limit(60).cache()
    got = {
        (r["key_a"], r["key_b"], r["hamming"])
        for r in dd.simhash_neardup(d, max_hamming=3).collect()
    }
    sig = dd.simhash(d)
    a = sig.select(F.col("doc_id").alias("key_a"), F.col("simhash").alias("_sa"))
    b = sig.select(F.col("doc_id").alias("key_b"), F.col("simhash").alias("_sb"))
    brute = {
        (r["key_a"], r["key_b"], r["hamming"])
        for r in a.crossJoin(b)
        .where(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b",
            dd.hamming64(F.col("_sa"), F.col("_sb")).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert got == brute
    # and a duplicated doc is found at hamming 0
    twin = d.limit(1).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    withdup = d.select("doc_id", "text").unionByName(twin)
    dup = dd.simhash_neardup(withdup, max_hamming=0).collect()
    assert any(r["hamming"] == 0 for r in dup)


def test_repetition_signals_known_values(spark):
    from docker_neo4j_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),          # 3 lines, 2 distinct → dup 1/3
            (2, "x y x y x y"),            # bigrams: [x y, y x, x y, y x, x y] → top 3/5
            (3, "hello"),                  # no bigram, one line
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert abs(out[1]["dup_line_frac"] - 1 / 3) < 1e-12
    assert abs(out[2]["top_bigram_frac"] - 3 / 5) < 1e-12
    assert out[3]["top_bigram_frac"] == 0.0 and out[3]["dup_line_frac"] == 0.0


def test_mixing_weights_sum_and_monotonicity(spark):
    from docker_neo4j_spark.operators.text import mixing_weights

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string",
    )
    w = {r["domain"]: r["weight"] for r in mixing_weights(df, temperature=0.7).collect()}
    assert abs(sum(w.values()) - 1.0) < 1e-12
    assert w["big"] > w["small"]                       # more data → larger weight
    # temperature < 1 up-samples the small domain vs its raw share
    assert w["small"] > 100 / 1000


def test_vocabulary_orders_by_doc_frequency(spark):
    from docker_neo4j_spark.operators.text import vocabulary

    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple cherry cherry"), (3, "apple banana")],
        "doc_id long, text string",
    )
    rows = vocabulary(docs, top_k=2).collect()
    assert [r["token"] for r in rows] == ["apple", "banana"]
    assert rows[0]["doc_freq"] == 3 and rows[1]["doc_freq"] == 2


def test_asof_join_backward_inclusive_semantics(spark):
    from docker_neo4j_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 100), (3, 15, 200), (4, 5, 300)],
        "event_id long, ts long, user_id long",
    )
    right = spark.createDataFrame(
        [(100, 10, 1.0), (100, 18, 2.0), (200, 15, 9.0)],
        "user_id long, ts long, value double",
    )
    out = {r["event_id"]: r["value_asof"] for r in
           asof_join(left, right, value_cols=("value",)).collect()}
    assert out[1] == 1.0      # equal ts → inclusive
    assert out[2] == 2.0      # most recent of two priors
    assert out[3] == 9.0      # other user's rows invisible
    assert out[4] is None     # no prior row → null


def test_asof_join_null_values_and_row_atomicity(spark):
    from docker_neo4j_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 20, 100), (2, 30, 100)], "event_id long, ts long, user_id long"
    )
    right = spark.createDataFrame(
        [(100, 10, 1.0, "a"), (100, 15, None, None), (100, 25, None, "c")],
        "user_id long, ts long, value double, tag string",
    )
    rows = {
        r["event_id"]: (r["value_asof"], r["tag_asof"])
        for r in asof_join(left, right, value_cols=("value", "tag")).collect()
    }
    # the MATCHED row's NULL surfaces — not an older non-null value —
    # and both value columns come from the SAME right row (ts=15 / ts=25)
    assert rows[1] == (None, None)
    assert rows[2] == (None, "c")


def test_unigram_logprob_rare_tokens_score_higher(spark):
    from docker_neo4j_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [
            (1, "the the the the"),          # only common tokens
            (2, "the zyzzyva qoph vex"),     # mostly hapaxes
            (3, ""),                          # empty -> NULL nll
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert out[1]["nll"] < out[2]["nll"]
    assert out[3]["n_tokens"] == 0 and out[3]["nll"] is None
    # exact value check: p(the)=5/8 -> nll(doc1) = -ln(5/8)
    import math

    assert abs(out[1]["nll"] - (-math.log(5 / 8))) < 1e-12


def test_tfidf_top_terms_scores_and_tiebreak(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry apple")],
        ["doc_id", "text"],
    )
    out = tx.tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every term has df=2 over N=3; d1's apple (tf 2) dominates
    top1 = by_doc[1][0]
    assert top1["token"] == "apple" and top1["tf"] == 2 and top1["doc_freq"] == 2
    assert top1["score_milli"] == round(2 * math.log(3 / 2) * 1e3)
    # d2: banana and cherry tie exactly (tf 1, df 2) -> token asc order
    assert [r["token"] for r in by_doc[2]] == ["banana", "cherry"]


def test_bm25_frequency_and_absence(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
        ["doc_id", "text"],
    )
    rows = tx.bm25(docs, ["spark"], top_k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids  # no hit -> no row
    assert ids[0] == 1 and ids[1] == 2  # higher tf ranks first
    assert all(r["n_hits"] == 1 for r in rows)
    assert rows[0]["score_milli"] > rows[1]["score_milli"] > 0


def test_importance_weights_sign_separates_domains(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha", "en"),
            (2, "alpha alpha beta", "en"),
            (3, "beta beta beta", "de"),
            (4, "beta beta beta", "de"),
            (5, "", "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = {
        r["doc_id"]: r
        for r in tx.importance_weights(docs, F.col("lang") == "en").collect()
    }
    # target-looking docs score positive, background-looking negative
    assert out[1]["llr_milli"] > 0 > out[3]["llr_milli"]
    assert out[3]["llr_milli"] == out[4]["llr_milli"]  # identical text
    assert out[5]["n_tokens"] == 0 and out[5]["llr_milli"] is None


def test_bloom_no_false_negatives_and_fp_rate(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i}") for i in range(200)], ["doc_id", "text"]
    )
    seen = docs.where(F.col("doc_id") < 50)
    bloom = dd.bloom_build(seen, m_bits=1 << 14, k=5)
    out = {r["doc_id"]: r["hit"] for r in dd.bloom_probe(docs, bloom, m_bits=1 << 14, k=5).collect()}
    # every build-set member hits — the Bloom guarantee
    assert all(out[i] for i in range(50))
    # false-positive rate at n=50, m=16384, k=5 is ~1e-6 — the other 150
    # unseen docs must essentially all miss (allow 1 fluke)
    assert sum(out[i] for i in range(50, 200)) <= 1


def test_bloom_bitmap_is_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1000)], ["doc_id", "text"]
    )
    bloom = dd.bloom_build(docs, m_bits=1 << 10, k=3).collect()
    assert len(bloom) <= (1 << 10) // 32  # packed words, never per-key rows
    assert all(0 <= r["word"] < (1 << 10) // 32 for r in bloom)


def test_domain_kl_specialist_domain_scores_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "mixed"),
            (2, "beta gamma delta alpha", "mixed"),
            (3, "zzz zzz zzz zzz", "weird"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {r["domain"]: r for r in tx.domain_kl(docs).collect()}
    # the domain that is the blend scores near 0; the specialist far above
    assert out["weird"]["kl_milli"] > out["mixed"]["kl_milli"] >= 0
    assert out["mixed"]["n_tokens"] == 8 and out["weird"]["n_tokens"] == 4


def test_bpe_train_learns_expected_merges(spark):
    # corpus: 'abab' x3, 'ab' x2, 'cd' x1 -> pair (a,b) dominates (count
    # 3*2+2=8); after merging, (ab,ab) appears 3 times beating (c,d)=1
    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab cd")], ["doc_id", "text"]
    )
    rows = tx.bpe_train(docs, num_merges=3).collect()
    got = [(r["rank"], r["pair_a"], r["pair_b"], r["merged"], r["pair_count"]) for r in rows]
    assert got[0] == (0, "a", "b", "ab", 8)
    assert got[1] == (1, "ab", "ab", "abab", 3)
    assert got[2] == (2, "c", "d", "cd", 1)


def test_bpe_train_greedy_leftmost_on_runs(spark):
    # 'aaaa': after rank-0 merge (a,a) the segmentation must be [aa, aa]
    # (pairwise, not overlapping), so rank-1 learns (aa, aa)
    docs = spark.createDataFrame([(1, "aaaa")], ["doc_id", "text"])
    rows = tx.bpe_train(docs, num_merges=2).collect()
    assert (rows[0]["pair_a"], rows[0]["pair_b"]) == ("a", "a")
    assert (rows[1]["pair_a"], rows[1]["pair_b"], rows[1]["pair_count"]) == ("aa", "aa", 1)


def test_bpe_token_counts_under_learned_merges(spark):
    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab cd"), (2, "abab xy"), (3, "")],
        ["doc_id", "text"],
    )
    merges = tx.bpe_train(docs, num_merges=2)  # learns (a,b)->ab, (ab,ab)->abab
    out = {r["doc_id"]: r["n_bpe_tokens"] for r in tx.bpe_token_counts(docs, merges).collect()}
    # doc1: abab->1 x3, ab->1 x2, cd->2 chars = 3+2+2 = 7
    assert out[1] == 7
    # doc2: abab->1, xy->2 = 3
    assert out[2] == 3
    assert out[3] == 0


def test_exact_substring_pairs_stop_gram_guard(spark):
    """Shared 3-gram links docs; a gram shared by too many docs is
    dropped by the guard instead of fanning out quadratically."""
    from docker_neo4j_spark.operators.curation import exact_substring_pairs

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "a quick brown fox runs"),
        (3, "something else entirely here now"),
    ] + [(10 + i, "common header line three") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["shared_grams"]
        for r in exact_substring_pairs(df, n=3, max_gram_docs=10).collect()
    }
    # docs 1,2 share "quick brown fox"; header docs all pair up
    assert got[(1, 2)] == 1
    assert got[(10, 11)] == 2  # "common header line", "header line three"
    # guard: same corpus with max_gram_docs=4 drops the 5-doc header gram
    guarded = {
        (r["id_a"], r["id_b"])
        for r in exact_substring_pairs(df, n=3, max_gram_docs=4).collect()
    }
    assert (10, 11) not in guarded and (1, 2) in guarded


def test_leakage_free_split_atomic_components(spark):
    """Duplicate documents NEVER straddle train/test; singletons follow
    the plain hash coin of their own id."""
    from docker_neo4j_spark.operators.curation import leakage_free_split

    dup = "the exact same long sentence with ten or more words in it"
    rows = [
        (1, dup), (2, dup + " plus a tail"), (3, dup + " other tail"),
        (4, "a completely different document about something else entirely here"),
        (5, "yet another unrelated text with plenty of distinct words inside it"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["component"], r["split"]) for r in
           leakage_free_split(df, n=10, max_gram_docs=10).collect()}
    assert len(out) == 5
    # 1,2,3 share the 10-gram → one component, one side
    assert out[1][0] == out[2][0] == out[3][0] == 1
    assert out[1][1] == out[2][1] == out[3][1]
    # singletons are their own component
    assert out[4][0] == 4 and out[5][0] == 5


def test_bigram_lm_order_sensitivity_and_exactness(spark):
    """The bigram signal separates docs by word ORDER at identical
    unigram profiles, and matches an exact Python twin of the
    interpolated formula."""
    import math

    from docker_neo4j_spark.operators.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "a a a b b b a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["nll"]) for r in bigram_logprob(docs).collect()}
    assert out[3] == (0, None)  # <2 tokens → no bigrams, NULL nll
    assert out[1][0] == out[2][0] == 7
    # same unigrams, scrambled order → strictly worse (higher) nll
    assert out[2][1] > out[1][1]

    # exact twin: recompute p(w2|w1) = .5*cb/cctx + .5*cu/N in Python
    texts = {1: "a b a b a b a b".split(), 2: "a a a b b b a b".split(), 3: ["solo"]}
    from collections import Counter

    cb = Counter(); cu = Counter()
    for t in texts.values():
        cu.update(t)
        cb.update(zip(t, t[1:]))
    cctx = Counter()
    for (w1, _), c in cb.items():
        cctx[w1] += c
    N = sum(cu.values())
    for d in (1, 2):
        t = texts[d]
        nll = -sum(
            math.log(0.5 * cb[(w1, w2)] / cctx[w1] + 0.5 * cu[w2] / N)
            for w1, w2 in zip(t, t[1:])
        ) / (len(t) - 1)
        assert abs(out[d][1] - nll) < 1e-9


def test_gopher_rules_known_values(spark):
    good = (
        "the quick brown foxes jumped over lazy sleeping dogs with "
        "great delight and that have wanted " * 5
    )  # 80 words, mean word length ≈ 4.8, five required stopwords
    docs = spark.createDataFrame(
        [
            (1, good),                                  # passes every rule
            (2, "short text only"),                     # fails min word count
            (3, "- one\n- two\n- three\n" + good),      # bullet lines but <90% → keep
            (4, ("# " * 40) + good),                    # symbol ratio > 0.1
            (5, " ".join(["12345"] * 60)),              # no alpha, no stopwords
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.gopher_rules(docs).collect()}
    assert out[1]["keep"] is True and out[1]["n_words"] == 80
    assert out[2]["keep"] is False and out[2]["n_words"] == 3
    assert out[3]["keep"] is True and abs(out[3]["bullet_frac"] - 3 / 4) < 1e-12
    assert out[4]["keep"] is False and out[4]["symbol_ratio"] > 0.1
    assert out[5]["keep"] is False
    assert out[5]["alpha_frac"] == 0.0 and out[5]["n_required_stopwords"] == 0


def test_ngram_jaccard_exact_values(spark):
    # doc1/doc2 share a 5-word run; doc3 disjoint. 3-grams: doc1 has 4,
    # doc2 has 4, shared = the 3 grams of the common 5-word run.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "omega alpha beta gamma delta epsilon"),
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    rows = dd.ngram_jaccard_pairs(docs, n=3, threshold=0.1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["shared_ngrams"]) == (1, 2, 3)
    assert abs(r["jaccard"] - 3 / 5) < 1e-12


def test_ngram_jaccard_stop_gram_guard_bounds_fanout(spark):
    # A gram shared by every doc is excluded by max_gram_docs, so the
    # ubiquitous boilerplate does not create all-pairs candidates.
    docs = spark.createDataFrame(
        [(i, "common boiler plate " + f"unique{i} x{i} y{i}") for i in range(10)],
        "doc_id long, text string",
    )
    rows = dd.ngram_jaccard_pairs(docs, n=3, threshold=0.01, max_gram_docs=5).collect()
    assert rows == []
