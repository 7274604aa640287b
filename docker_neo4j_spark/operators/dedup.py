"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB contract):
- **Exact** dedup is a hash-groupBy on a digest — one shuffle on a
  uniformly-distributed key, no skew, map-side partial agg.
- **Near-dup** is MinHash + banded LSH: shingle → minhash signature →
  band hashes → *bucket join* (self-join on band hash). Candidate pairs
  only ever form inside a bucket; there is no all-pairs crossJoin anywhere.
  Bucket sizes are bounded by the band width / corpus similarity structure,
  and a ``max_bucket`` guard drops pathological buckets (mirrors the
  standard "skip giant clusters" production practice).
- **SimHash** is a map-only 64-bit signature; near-dup candidates come from
  banding the signature into 4×16-bit chunks (same bucket-join shape).
- **Verification** (exact Jaccard on shingle sets) runs only on candidate
  pairs — set-intersection via ``array_intersect`` on already-shuffled rows.

Everything is built-in column expressions over arrays (xxhash64, transform,
aggregate, explode) — no Python UDFs, full codegen.

Reference anchor: the brief's training-data-pipeline dedup surface; shapes
follow Broder's MinHash/LSH construction and Charikar's SimHash (public
algorithms), expressed as Spark DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def exact_dedup(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Exact dedup via content digest: keep the lowest key per digest.

    Returns (digest, n_copies, keep_id). One shuffle on md5 — uniform key,
    no skew at any scale.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(key))
        .groupBy("digest")
        .agg(F.count("*").cast("long").alias("n_copies"), F.min(key).alias("keep_id"))
    )


def shingles(text, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) as an array of strings."""
    t = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))
    )
    return F.array_distinct(grams)


MINHASH_PRIME = (1 << 31) - 1  # Mersenne 2^31-1: products stay < 2^62


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed (a_i, b_i) affine constants, engine-agnostic: a deterministic
    LCG stream seeded 42 (the same numbers bake into the DuckDB oracle)."""
    out, x = [], 42
    for _ in range(2 * num_hashes):
        x = (1103515245 * x + 12345) % MINHASH_PRIME
        out.append(x or 1)
    return [(out[2 * i], out[2 * i + 1]) for i in range(num_hashes)]


def md5_base31(col) -> Column:
    """Shingle → 31-bit base hash: the first 8 hex chars of md5 mod the
    Mersenne prime. md5 exists verbatim in DuckDB, so the whole MinHash
    construction replays cross-engine."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % MINHASH_PRIME
    )


def minhash_signature_from_base(base_col: Column, num_hashes: int = 32) -> Column:
    """Signature from a MATERIALIZED base-hash array (see
    ``minhash_signature`` — callers should select the base array as a
    real column first: Catalyst does not CSE across lambda boundaries,
    so referencing an inline base expression ``num_hashes`` times would
    recompute the md5 that many times per shingle)."""

    def _one(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(base_col, lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_PRIME)
        )

    return F.array(*[_one(a, b) for a, b in minhash_params(num_hashes)])


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per hash i, min over (a_i·x + b_i) mod p of the
    per-shingle md5 base x — the single-base + universal-rehash family
    (datasketch's construction; r8, was seeded xxhash64). ONE md5 per
    shingle feeds all ``num_hashes`` functions, and every operation
    exists identically in DuckDB, so signatures are oracle-pairable.

    NOTE: inline convenience form — prefer materializing the base array
    (``minhash_signature_from_base``) in pipelines, as
    ``minhash_lsh_candidates`` does."""
    return minhash_signature_from_base(
        F.transform(shingle_col, lambda s: md5_base31(s)), num_hashes
    )


def shingle_frame(
    df: DataFrame, text_col: str = "text", key: str = "doc_id", shingle_n: int = 3
) -> DataFrame:
    """(_k, _sh) per document — the shared map stage of the near-dup pipeline.

    Materializes shingles as a real column: downstream expressions reference
    it num_hashes times, and Catalyst does not CSE across lambda boundaries —
    inlining would re-tokenize+re-shingle 32× per row (measured 10×+
    slowdown). Also spreads a few-file input across cores: the map work is
    embarrassingly parallel.
    """
    src = df.select(F.col(key).alias("_k"), F.col(text_col).alias("_t"))
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.select("_k", shingles("_t", shingle_n).alias("_sh"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs: (key_a, key_b, band hits) with key_a < key_b.

    rows→(doc, band_id, band_hash)→groupBy bucket→pairs inside bucket.
    The only shuffles are the explode-groupBy on (band_id, band_hash) and
    the final pair dedup — never an all-pairs join.

    ``shingled``: optional precomputed ``shingle_frame`` (lets the full
    pipeline shingle the corpus once instead of once per stage).
    """
    rows = num_hashes // bands
    sh = shingled if shingled is not None else shingle_frame(df, text_col, key, shingle_n)
    sig = sh.select(
        "_k", F.transform("_sh", lambda s: md5_base31(s)).alias("_base")
    ).select("_k", minhash_signature_from_base(F.col("_base"), num_hashes).alias("_sig"))
    # band key = the band's signature slice verbatim (comma string):
    # bucket identity needs exactness, not compactness, and a literal key
    # replays in the DuckDB oracle with no extra hash to model
    banded = sig.select(
        "_k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            ",",
                            *[F.element_at("_sig", b * rows + r + 1) for r in range(rows)],
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_k", "band.band_id", "band.band_hash")
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.collect_list("_k").alias("ks"))
        .where((F.size("ks") > 1) & (F.size("ks") <= max_bucket))
    )
    pairs = (
        buckets.select(F.explode("ks").alias("a"), F.col("ks"))
        .select("a", F.explode("ks").alias("b"))
        .where(F.col("a") < F.col("b"))
    )
    return pairs.groupBy(F.col("a").alias("key_a"), F.col("b").alias("key_b")).agg(
        F.count("*").cast("long").alias("band_hits")
    )


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    shingle_n: int = 3,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify stage).

    Joins the (small) candidate set against per-doc shingle arrays twice —
    at scale, candidates ≪ corpus so both joins broadcast the candidate side.
    """
    sh = shingled if shingled is not None else shingle_frame(df, text_col, key, shingle_n)
    out = (
        candidates.join(sh.withColumnRenamed("_k", "key_a").withColumnRenamed("_sh", "_sha"), "key_a")
        .join(sh.withColumnRenamed("_k", "key_b").withColumnRenamed("_sh", "_shb"), "key_b")
    )
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    union = F.size(F.array_union("_sha", "_shb")).cast("double")
    return out.select(
        "key_a",
        "key_b",
        (inter / F.greatest(union, F.lit(1.0))).alias("jaccard"),
    )


def near_dup_dedup(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → Jaccard verify → keep set.

    Returns (key_a, key_b, jaccard) for verified near-duplicate pairs.
    The shingle frame (the expensive tokenize+n-gram map stage) is computed
    once and cached across the candidate and verify stages.
    """
    sh = shingle_frame(df, text_col, key).cache()
    cand = minhash_lsh_candidates(df, text_col, key, num_hashes, bands, shingled=sh)
    return jaccard_pairs(df, cand, text_col, key, shingled=sh).where(
        F.col("jaccard") >= threshold
    )


def simhash(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Charikar 64-bit SimHash over token hashes, map-only.

    Bit i of the signature is the majority vote of bit i across token
    hashes: set iff 2·|{tokens with bit i set}| > |tokens| (ties → 0,
    matching sign(Σ±1) ≤ 0). Token multiplicity weights the vote. 64
    static-index array filters — no explode, no shuffle, full codegen.

    Token hash = the first 64 bits of md5 (hi<<32 | lo from the leading
    16 hex chars; r8, was xxhash64): md5 exists verbatim in DuckDB, so
    the signature — and everything banded from it — is oracle-pairable
    cross-engine, at the same map-only plan shape.
    """
    # Materialize token hashes once (64 bit-filters reference them; no CSE
    # across lambdas), then vote on the precomputed hash array.
    src = df.select(
        key, F.transform(tokens(text_col), F.md5).alias("_m")
    ).select(
        key,
        F.transform(
            "_m",
            lambda m: F.shiftleft(
                F.conv(F.substring(m, 1, 8), 16, 10).cast("long"), 32
            ).bitwiseOR(F.conv(F.substring(m, 9, 8), 16, 10).cast("long")),
        ).alias("_h"),
    )
    n = F.size("_h")

    def _bit(i: int) -> Column:
        cnt = F.size(
            F.filter("_h", lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == F.lit(1))
        )
        return F.when(cnt * 2 > n, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )

    sig = _bit(0)
    for i in range(1, 64):
        sig = sig.bitwiseOR(_bit(i))
    return src.select(key, sig.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """SimHash near-dup pairs: (key_a, key_b, hamming) with hamming ≤
    ``max_hamming``.

    Bands the 64-bit signature into 4×16-bit chunks and bucket-joins on
    (band, chunk) — by pigeonhole, any pair within Hamming distance 3 has
    at least one identical chunk, so recall is EXACT for the default
    radius (same candidates-only-inside-a-bucket shape as MinHash LSH;
    never all-pairs). Candidates are then verified with ``hamming64``.
    """
    sig = simhash(df, text_col, key).cache()
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright("simhash", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
        )
        for b in range(4)
    ]
    banded = sig.select(
        F.col(key).alias("_k"), F.explode(F.array(*bands)).alias("band")
    ).select("_k", "band.band_id", "band.chunk")
    buckets = (
        banded.groupBy("band_id", "chunk")
        .agg(F.collect_list("_k").alias("ks"))
        .where((F.size("ks") > 1) & (F.size("ks") <= max_bucket))
    )
    pairs = (
        buckets.select(F.explode("ks").alias("a"), F.col("ks"))
        .select("a", F.explode("ks").alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    sa = sig.select(F.col(key).alias("a"), F.col("simhash").alias("_sa"))
    sb = sig.select(F.col(key).alias("b"), F.col("simhash").alias("_sb"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            F.col("a").alias("key_a"),
            F.col("b").alias("key_b"),
            hamming64(F.col("_sa"), F.col("_sb")).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def _bloom_pos(key: Column, i: int, m_bits: int) -> Column:
    """Hash i of the Bloom family: the first 8 hex chars of
    md5(key ‖ '#i') as an integer, mod m_bits — engine-portable (md5 and
    base-16 conversion are bit-identical everywhere, unlike murmur)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 8),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def bloom_build(
    df: DataFrame, key_col: str = "text", m_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a packed bitmap DataFrame
    (word, bits): word = pos // 32, bits = OR of 1 << (pos % 32). 32-bit
    packing (not 64) keeps every shift ≤ 31 so the same arithmetic runs
    on engines whose BIGINT shift traps on bit 63.

    The seen-set membership primitive for dedup-against-history at scale:
    the filter is ≤ m_bits/32 rows regardless of corpus size, broadcasts
    to every executor, and probing costs k hashes + a broadcast lookup —
    no join against the full history table. False positives at the
    textbook (1−e^{−kn/m})^k rate; no false negatives.

    Shape: one map-side explode (k rows per key) → groupBy(word) bit_or —
    a single bounded shuffle of ≤ m_bits/32 groups.
    """
    key = F.col(key_col)
    pos = df.select(
        F.explode(F.array([_bloom_pos(key, i, m_bits) for i in range(k)])).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 32).cast("long").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Probe every row of ``df`` against a ``bloom_build`` bitmap:
    (id, hit) where hit ⇔ all k bit positions are set. Build-set members
    always hit (no false negatives); non-members hit at the false-positive
    rate, deterministically (same md5 family both sides).

    The filter side is explicitly broadcast — probing is map-side only
    plus one groupBy(id) count, never a shuffle of the corpus against the
    history."""
    key = F.col(key_col)
    rows = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array([_bloom_pos(key, i, m_bits) for i in range(k)])).alias("pos"),
    )
    w = rows.select(
        "_id",
        (F.col("pos") / 32).cast("long").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").alias("bit"),
    )
    hits = (
        w.join(F.broadcast(bloom), "word")
        .where(F.col("bits").bitwiseAND(F.col("bit")) != 0)
        .groupBy("_id")
        .agg(F.count("*").alias("_set"))
        .where(F.col("_set") == k)
        .select(F.col("_id"), F.lit(True).alias("hit"))
    )
    return (
        df.select(F.col(id_col))
        .join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .select(id_col, F.coalesce("hit", F.lit(False)).alias("hit"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_gram_docs: int = 200,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-duplicate pairs (the brief's
    "n-gram Jaccard" dedup row): for every document pair sharing an
    n-gram, ``|A∩B| / |A∪B|`` over the documents' DISTINCT n-gram sets,
    thresholded.

    Unlike the MinHash path this is exact — no signature approximation —
    so it doubles as the ground truth the LSH recall tests compare
    against. Scale shape: one distinct (doc, gram) frame; grams with
    document frequency above ``max_gram_docs`` are stop-grams excluded
    from BOTH the intersection and the set sizes (semantics: Jaccard
    over non-ubiquitous n-grams), which bounds per-gram join fan-out
    exactly like ``exact_substring_pairs``; the pair join is a gram-key
    equi-join — never all-pairs. Integer counts end-to-end; the final
    division is one exact BIGINT/BIGINT → DOUBLE per pair.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    count = F.size(toks) - n + 1
    grams_arr = F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(F.col(key), F.explode(grams_arr).alias("gram")).distinct()
    keep = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_docs"))
        .where(F.col("_docs") <= max_gram_docs)
        .select("gram")
    )
    g = grams.join(keep, "gram")
    sizes = g.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("_sz"))
    a = g.select(F.col("gram"), F.col(key).alias("id_a"))
    b = g.select(F.col("gram"), F.col(key).alias("id_b"))
    inter = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(key, "id_a").withColumnRenamed("_sz", "_sa"), "id_a")
        .join(sizes.withColumnRenamed(key, "id_b").withColumnRenamed("_sz", "_sb"), "id_b")
        .select(
            "id_a",
            "id_b",
            "_inter",
            (
                F.col("_inter").cast("double")
                / (F.col("_sa") + F.col("_sb") - F.col("_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.col("_inter").alias("shared_ngrams"), "jaccard"
    )
