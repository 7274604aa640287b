"""Training-data curation operators: splits, packing, cluster dedup, caps.

The reference's genai/plugin surface stops at encode+index
(calver/coredb/neo4j-plugins.json:31-36); these are the surrounding
operations a large-scale LLM training pipeline runs on the same tables
(BASELINE mandate: dedup / similarity / text analysis as first-class
engine operators, not demos).

Scale design notes (100 TB):
- ``hash_split``: map-only — one md5 per row, no shuffle, no state. The
  split is a pure function of (salt, key), so it is reproducible across
  runs, engines, and partitionings — the property a train/test split
  must have (leakage-proof re-materialization).
- ``pack_sequences``: the global-order cumulative sum is the scale trap
  (a single-ordered window = one task). We shard first (deterministic
  ``key % num_shards``), then pack within shards: each shard's prefix
  sum runs in parallel, bins are (shard, bin) pairs — exactly how
  distributed sequence packing is run in practice.
- ``dedup_clusters``: candidate pairs come from banded MinHash-LSH
  (never all-pairs), verified pairs feed a connected-components pass
  (O(log n) rounds of min-propagation), canonical = min doc id per
  component. Every stage is a bucketed equi-join or groupBy.
- ``domain_cap``: two-phase top-k. Phase 1 ranks within (domain,
  hash-shard) — partition sizes are ~N/shards no matter how skewed the
  domain distribution is — and prunes to ≤k survivors per shard
  (pigeonhole: a row outside its shard's top-k cannot be in the
  domain's global top-k). Phase 2's per-domain window then runs over
  ≤ shards·k rows per domain, so no single reducer ever sees a whole
  hot domain.
"""

from __future__ import annotations
from ..localframe import local_df

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._mem import release as _release


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "split",
    fractions: tuple[float, float, float] = (0.9, 0.05, 0.05),
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed key (map-only).

    The first 4 hex chars of ``md5(salt || key)`` give a uniform 16-bit
    bucket; split boundaries are hex-string thresholds, so the comparison
    is identical in any engine that can md5 a string (hex digits are
    ASCII-ordered). Returns ``df`` + a ``split`` column.
    """
    train, val, _test = fractions
    t_hex = format(int(train * 65536), "04x")
    v_hex = format(int((train + val) * 65536), "04x")
    bucket = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 4
    )
    return df.withColumn(
        "split",
        F.when(bucket < t_hex, F.lit("train"))
        .when(bucket < v_hex, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    budget: int = 2048,
    num_shards: int = 32,
) -> DataFrame:
    """Streaming sequence packing: assign each document to the context
    window (pack) where it starts, reading documents in ``key_col`` order
    within deterministic shards.

    ``pack_id = shard * 2^32 + floor(exclusive_cumsum(tokens) / budget)``
    — the fill-and-spill packing used for LLM pretraining batches (a doc
    may straddle its pack boundary; training handles that with masking).
    ``offset`` is the doc's start position inside its pack. All integer
    arithmetic — engine-exact.
    """
    shard = (F.col(key_col) % num_shards).alias("_shard")
    w = Window.partitionBy("_shard").orderBy(key_col)
    cum = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        df.withColumn("_shard", shard)
        .withColumn("_cum", cum)
        .select(
            key_col,
            token_col,
            (
                F.col("_shard") * F.lit(2**32) + F.floor(F.col("_cum") / budget)
            ).alias("pack_id"),
            (F.col("_cum") % budget).alias("offset"),
        )
    )


def exact_dedup_clusters(
    df: DataFrame, text_col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate clustering: every row mapped to the canonical
    (minimum-key) member of its identical-text group — one md5 digest +
    one window, no join. Output (key, canonical, is_canonical)."""
    w = Window.partitionBy("_digest")
    return (
        df.select(F.col(key), F.md5(F.col(text_col)).alias("_digest"))
        .withColumn("canonical", F.min(key).over(w))
        .select(
            key,
            "canonical",
            (F.col(key) == F.col("canonical")).alias("is_canonical"),
        )
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate clustering: MinHash-LSH candidates → Jaccard-verified
    pairs → connected components → canonical member per cluster.

    The keep-one-per-cluster primitive of corpus dedup: output is
    (key, canonical, is_canonical); filtering ``is_canonical`` yields the
    deduplicated corpus, joining back on ``canonical`` explains every
    drop. Components via gds.wcc (alternating min-label propagation,
    O(log n) rounds) over the verified pair list only — never all-pairs.
    """
    from .dedup import jaccard_pairs, minhash_lsh_candidates, shingle_frame
    from .gds import wcc

    sh = shingle_frame(df, text_col=text_col, key=key).cache()
    cands = minhash_lsh_candidates(
        df, text_col=text_col, key=key, num_hashes=num_hashes, bands=bands, shingled=sh
    )
    pairs = jaccard_pairs(df, cands, text_col=text_col, key=key, shingled=sh).where(
        F.col("jaccard") >= threshold
    )
    edges = pairs.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
    comp = wcc(edges, df.select(F.col(key).alias("id")))
    out = comp.select(
        F.col("id").alias(key),
        F.col("comp").alias("canonical"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )
    sh.unpersist()
    return out


# Portable across Java regex, RE2, and DuckDB (no lookbehind, no \b-edge
# dialect differences beyond the common subset).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[^\\s]+"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PHONE_RE = "\\+\\d{1,3}([ -]?\\d{2,5}){2,5}"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    url_token: str = "<URL>",
    ip_token: str = "<IP>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """Replace URLs, emails, IPv4 addresses, and international (+CC)
    phone numbers in ``text_col`` with placeholder tokens — the standard
    pre-training scrub pass. Map-only JVM regexes (one ``regexp_replace``
    chain, no UDF); patterns restricted to the lookaround-free
    Java∩RE2∩DuckDB dialect so the pass is engine-reproducible. Order
    matters: URLs first (they may embed the other shapes), then emails,
    IPs, phones."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), URL_RE, url_token),
                EMAIL_RE,
                email_token,
            ),
            IPV4_RE,
            ip_token,
        ),
        PHONE_RE,
        phone_token,
    )
    return df.withColumn(text_col, scrubbed)


def split_paragraphs(
    df: DataFrame, text_col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Explode documents into (key, para_idx, para) rows on blank-line
    boundaries, dropping empty fragments — the chunking primitive ahead of
    per-paragraph dedup/scoring. One generator projection, no shuffle."""
    paras = F.filter(
        F.transform(F.split(F.col(text_col), "\\n\\s*\\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return df.select(
        key, F.posexplode(paras).alias("para_idx", "para")
    ).withColumn("para_idx", F.col("para_idx").cast("long"))


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    key: str = "doc_id",
    rank_col: str = "n_chars",
    k: int = 100,
    shards: int = 16,
) -> DataFrame:
    """Per-domain document cap: keep the top ``k`` rows of each domain by
    ``rank_col`` (ties broken on key — total order, so the kept set is
    deterministic). The anti-overrepresentation primitive of corpus
    curation.

    Skew-safe two-phase top-k: a naive single window partitioned by the
    domain column puts an entire hot domain (half the web is one domain)
    on one reducer. Instead phase 1 ranks within ``(domain, xxhash64(key)
    % shards)`` — every global top-k row is necessarily inside its own
    shard's top-k, so filtering to per-shard rank ≤ k keeps all answers
    while bounding phase 2's per-domain input at ``shards·k`` rows. The
    kept set is identical to the single-window formulation (pytest
    asserts equality), but the widest partition phase 1 sees is ~N/shards
    regardless of domain skew.
    """
    shard = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(shards))
    order = [F.desc(rank_col), F.asc(key)]
    w1 = Window.partitionBy(domain_col, "_shard").orderBy(*order)
    w2 = Window.partitionBy(domain_col).orderBy(*order)
    return (
        df.withColumn("_shard", shard)
        .withColumn("_srk", F.row_number().over(w1))
        .where(F.col("_srk") <= k)
        .withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= k)
        .drop("_shard", "_srk", "_rk")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window chunking: split each document into windows of
    ``chunk_tokens`` whitespace tokens advancing by ``chunk_tokens -
    overlap`` — the RAG/embedding-prep primitive. Map-only (split +
    sequence + transform + posexplode: one generator projection, zero
    shuffles; 100 TB chunking is embarrassingly parallel and this shape
    keeps it that way).

    Output (key, chunk_idx, chunk_text, n_tokens); a document shorter
    than one window yields exactly one chunk. Chunk count =
    1 + ceil((n - chunk)/stride) in pure integer arithmetic —
    engine-exact, so the op carries a DuckDB oracle
    (``llm_chunk_documents``).
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # integer ceil via floor: (n-chunk+stride-1) div stride + 1
    n_chunks = F.when(n <= chunk_tokens, F.lit(1).cast("long")).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / F.lit(stride)).cast("long") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(
                F.slice(toks, (i * stride + 1).cast("int"), chunk_tokens), " "
            ).alias("txt"),
            F.least(F.lit(chunk_tokens).cast("long"), n - i * stride).alias("nt"),
        ),
    )
    return df.select(
        key, F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        key,
        F.col("chunk_idx").cast("long"),
        F.col("_c.txt").alias("chunk_text"),
        F.col("_c.nt").alias("n_tokens"),
    )


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_name: str = "_rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact 1-based global rank over a TOTAL order (include a unique
    tiebreaker in ``order_cols``) — without the single-task trap of
    ``Window.orderBy`` with no partition key.

    ``repartitionByRange`` on the order keys (every row in partition i
    sorts before every row in partition i+1; no ties cross a boundary
    because the order is total), per-partition ``row_number``, then
    per-partition counts (one row per partition) become cumulative
    offsets broadcast back: ``rank = offset[pid] + local_row``. The only
    full-data movement is the range exchange itself — the same cost any
    engine pays to rank, spread over all partitions instead of one.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_gr_pid", F.spark_partition_id()
    )
    d = d.localCheckpoint(eager=True)  # pin partition placement
    w = Window.partitionBy("_gr_pid").orderBy(*cols)
    d = d.withColumn("_gr_lr", F.row_number().over(w))
    counts = sorted(
        (r["_gr_pid"], r["_n"])
        for r in d.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    acc, offsets = 0, []
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = local_df(d.sparkSession, offsets or [(0, 0)], "_gr_pid int, _gr_off long")
    return (
        d.join(F.broadcast(off), "_gr_pid")
        .withColumn(rank_name, F.col("_gr_off") + F.col("_gr_lr"))
        .drop("_gr_pid", "_gr_lr", "_gr_off")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_name: str = "_psum",
    num_partitions: int = 32,
    exclusive: bool = True,
) -> DataFrame:
    """Exact prefix sum of ``value_col`` over a TOTAL order — the same
    range-repartition + broadcast-offsets shape as :func:`global_rank`,
    summing values instead of counting rows (r11: the Tarjan–Vishkin
    root-offset sweep reuses this instead of a SinglePartition window —
    the root count is |components|-shaped, i.e. |V| on a 100 TB graph of
    many small components). ``exclusive=True`` gives the sum over
    strictly-preceding rows (0 for the first)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_gp_pid", F.spark_partition_id()
    )
    d = d.localCheckpoint(eager=True)  # pin partition placement
    w = (
        Window.partitionBy("_gp_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    )
    d = d.withColumn(
        "_gp_ls", F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )
    totals = sorted(
        (r["_gp_pid"], r["_t"] or 0)
        for r in d.groupBy("_gp_pid").agg(F.sum(value_col).alias("_t")).collect()
    )
    acc, offsets = 0, []
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += t
    off = local_df(d.sparkSession, offsets or [(0, 0)], "_gp_pid int, _gp_off long")
    return (
        d.join(F.broadcast(off), "_gp_pid")
        .withColumn(out_name, (F.col("_gp_off") + F.col("_gp_ls")).cast("long"))
        .drop("_gp_pid", "_gp_ls", "_gp_off")
    )


def ntile_exact(
    df: DataFrame,
    order_cols: list,
    n_buckets: int = 10,
    bucket_name: str = "bucket",
) -> DataFrame:
    """SQL-exact NTILE(n) over a total order, scale-safe: bucket sizes
    differ by at most one with the larger buckets first (the ANSI NTILE
    contract), computed from ``global_rank`` with pure integer arithmetic
    — no single-partition window anywhere. The quality-bucketing /
    curriculum-binning primitive of corpus curation."""
    total = df.count()
    base, rem = divmod(total, n_buckets)
    ranked = global_rank(df, order_cols, rank_name="_nt_rank")
    big = base + 1  # size of the first `rem` buckets
    cut = rem * big
    r0 = F.col("_nt_rank") - 1
    if base == 0:
        bucket = r0 + 1  # fewer rows than buckets: bucket == rank
    else:
        bucket = (
            F.when(F.col("_nt_rank") <= cut, F.floor(r0 / big) + 1)
            .otherwise(F.lit(rem) + F.floor((r0 - cut) / base) + 1)
        )
    return ranked.withColumn(bucket_name, bucket.cast("long")).drop("_nt_rank")


def hex_thr(frac: float) -> str:
    """16-bit hex-bucket threshold for a keep-fraction. Rounds to the
    nearest bucket (truncation would make e.g. 65535/65536 compare as
    'fffe', silently dropping one bucket of rows); fraction >= 1.0 maps
    to 'g', a supremum above every 4-hex-digit string."""
    n = round(frac * 65536)
    return "g" if n >= 65536 else format(n, "04x")


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic stratified sampling: keep a per-stratum fraction of
    rows chosen by hashed key — the corpus-mixing primitive (e.g. keep
    100% of rare languages, 10% of English). Map-only: the same 16-bit
    md5 bucket as ``hash_split``, compared against a per-stratum
    hex threshold, so membership is reproducible in any engine with md5
    and independent of partitioning, ordering, or cluster size — unlike
    ``DataFrame.sample``, whose RNG is partition-dependent.
    """
    bucket = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 4
    )
    thr = F.lit(hex_thr(default_fraction))
    for stratum, frac in sorted((fractions or {}).items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(hex_thr(frac))
        ).otherwise(thr)
    return df.where(bucket < thr)


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag documents sharing any word
    ``n``-gram with a benchmark set — the held-out-leak check every
    training-data pipeline runs before a model sees the corpus.

    Both sides explode to n-gram frames (whitespace tokens, join with
    single spaces) and meet in ONE distinct-ngram semi join keyed on the
    n-gram string — candidate generation is an equi-join on a uniformly
    distributed key, never a doc×benchmark cross product, so the shape
    survives a 100 TB corpus against a fixed benchmark (the benchmark
    n-gram side is small and AQE broadcasts it).

    Returns (key_col, contaminated) for every input document.
    """

    def ngrams(frame: DataFrame, key: F.Column) -> DataFrame:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        count = F.size(toks) - n + 1  # n-grams in a doc; ≤0 → none
        grams = F.when(
            count > 0,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return frame.select(key.alias("_k"), F.explode(grams).alias("_gram"))

    bench_grams = ngrams(benchmark, F.lit(True)).select("_gram").distinct()
    hits = (
        ngrams(df, F.col(key_col))
        .join(bench_grams, "_gram")
        .select(F.col("_k").alias(key_col))
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        df.select(key_col)
        .join(hits, key_col, "left")
        .select(key_col, F.coalesce("contaminated", F.lit(False)).alias("contaminated"))
    )


def exact_substring_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 10,
    max_gram_docs: int = 50,
) -> DataFrame:
    """Exact-substring duplication pairs (the word-n-gram form of Lee et
    al. 2022's dedup): every document pair sharing at least one ``n``-word
    gram, with the count of distinct shared grams — the signal corpus
    dedup pipelines threshold on before dropping repeated boilerplate.

    Scale shape: one distinct (doc, gram) frame, one self-equi-join on
    the gram string. The quadratic danger is a gram shared by thousands
    of documents (license headers); ``max_gram_docs`` drops grams more
    frequent than that BEFORE the pair join — the standard stop-gram
    guard, same role as minhash's ``max_bucket`` — so per-gram fan-out
    is bounded and the join never degenerates. Deterministic integers
    end-to-end.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    count = F.size(toks) - n + 1
    grams_arr = F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        df.select(F.col(key_col), F.explode(grams_arr).alias("gram"))
        .distinct()
    )
    keep = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_docs"))
        .where((F.col("_docs") >= 2) & (F.col("_docs") <= max_gram_docs))
        .select("gram")
    )
    g = grams.join(keep, "gram")
    a = g.select(F.col("gram"), F.col(key_col).alias("id_a"))
    b = g.select(F.col("gram"), F.col(key_col).alias("id_b"))
    return (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_grams"))
    )


def leakage_free_split(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 10,
    max_gram_docs: int = 50,
    train_hex: str = "cccc",
    salt: str = "lfsplit",
    wcc_rounds: int = 12,
) -> DataFrame:
    """Leakage-free train/test split: documents that share an ``n``-word
    gram (near/exact duplicates) must land on the SAME side, or the test
    set leaks into training. Pipeline: duplication pairs
    (``exact_substring_pairs`` — gram equi-join with the stop-gram
    guard) → min-label WCC over the pair graph (duplicate components) →
    ONE md5 coin per component (keyed on the component's canonical min
    doc id) decides the side for every member atomically. Singleton docs
    are their own component — the split stays the plain hash split for
    them. Returns (key_col, component, split).

    The component fixpoint is ``wcc_rounds`` bounded min-label rounds
    over the (sparse) duplicate-pair graph — pair components are tiny
    (duplicate clusters), so a small bound converges; everything is
    md5/integer arithmetic, reproducible on any engine or partitioning.
    """
    pairs = exact_substring_pairs(
        df, text_col=text_col, key_col=key_col, n=n, max_gram_docs=max_gram_docs
    ).select("id_a", "id_b")
    sym = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    lab = df.select(F.col(key_col).alias("id")).withColumn("comp", F.col("id"))
    lab = lab.localCheckpoint(eager=True)
    # r14 (guide §2.4/§5, the wcc template): change detection rides the
    # merge itself as a `_chg` flag — the former per-round join job
    # against the old labels is an exchange-free take(1) over the
    # checkpointed output — and superseded label frames release one
    # round behind instead of pinning O(wcc_rounds) checkpoints.
    prev = None
    for _ in range(wcc_rounds):
        cand = (
            lab.join(sym, lab["id"] == sym["id_a"])
            .groupBy(F.col("id_b").alias("id"))
            .agg(F.min("comp").alias("_c"))
        )
        new_lab = lab.join(cand, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("_c", F.col("comp"))).alias("comp"),
            (F.col("_c").isNotNull() & (F.col("_c") < F.col("comp"))).alias("_chg"),
        ).localCheckpoint(eager=True)
        no_change = new_lab.where("_chg").isEmpty()
        if prev is not None:
            _release(prev)
        prev = lab
        lab = new_lab
        if no_change:
            break
    if prev is not None:
        _release(prev)
    side = F.when(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col("comp").cast("string"))), 1, 4
        )
        < F.lit(train_hex),
        F.lit("train"),
    ).otherwise(F.lit("test"))
    return lab.select(
        F.col("id").alias(key_col), F.col("comp").alias("component"), side.alias("split")
    )


def deterministic_shuffle(
    df: DataFrame,
    key: str = "doc_id",
    salt: str = "shuffle-v1",
    rank_name: str = "shuffle_rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets an
    exact 1-based position in the order md5(salt|key) — RNG-free, so the
    'random' order is reproducible across runs, engines, and partition
    counts (unlike ``DataFrame.orderBy(rand())``), and any contiguous
    slice of it is an unbiased sample.

    The md5 sort key is one map-side expression; the ranking reuses
    ``global_rank`` (range repartition + per-partition row_number +
    broadcast offsets), so there is no single-task window — the one
    full-data movement is the range exchange any engine pays to order.
    The key column is the tiebreaker, making the order total even under
    md5 collisions.
    """
    d = df.withColumn(
        "_sh_key", F.md5(F.concat_ws("|", F.lit(salt), F.col(key).cast("string")))
    )
    return global_rank(
        d, ["_sh_key", key], rank_name=rank_name, num_partitions=num_partitions
    ).drop("_sh_key")


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    segment_tokens: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet/RefinedWeb recipe:
    a text segment that recurs verbatim across ``min_doc_freq`` or more
    DISTINCT documents is template boilerplate — headers, footers, nav
    bars — and is cut from every document that carries it).

    Documents are segmented into non-overlapping ``segment_tokens``-word
    windows (trailing partial window kept), the per-segment document
    frequency is aggregated corpus-wide, and each document is rebuilt
    from its non-boilerplate segments in order.

    Output: (key, n_segments, n_boilerplate, cleaned_text,
    retained_words) — one row per input document, empty-string
    cleaned_text when everything was boilerplate.

    Scale (100 TB): three keyed shuffles, none all-pairs — (1) the
    df-count groupBy on segment text, (2) the segment⋈boilerplate-set
    equi-join (the right side is pre-filtered to df ≥ threshold, a tiny
    fraction of the segment space, and carries no skew guard need:
    segment texts are near-unique by construction), (3) the per-doc
    reassembly groupBy. Segmentation itself is the map-only
    transform+posexplode shape shared with ``chunk_documents``.
    """
    if segment_tokens <= 0:
        raise ValueError("segment_tokens must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_segs = F.ceil(n / F.lit(float(segment_tokens))).cast("long")
    segs = F.transform(
        F.sequence(F.lit(0).cast("long"), n_segs - 1),
        lambda i: F.array_join(
            F.slice(toks, (i * segment_tokens + 1).cast("int"), segment_tokens),
            " ",
        ),
    )
    exploded = df.select(
        F.col(key), F.posexplode(segs).alias("seg_idx", "seg")
    )
    boiler = (
        exploded.groupBy("seg")
        .agg(F.count_distinct(key).alias("_df"))
        .where(F.col("_df") >= min_doc_freq)
        .select("seg", F.lit(True).alias("_bp"))
    )
    flagged = exploded.join(boiler, "seg", "left").select(
        key,
        "seg_idx",
        "seg",
        F.coalesce(F.col("_bp"), F.lit(False)).alias("_bp"),
    )
    parts = F.array_sort(
        F.collect_list(F.struct(F.col("seg_idx"), F.col("seg"), F.col("_bp")))
    )
    kept = F.filter(parts, lambda p: ~p["_bp"])
    cleaned = F.array_join(F.transform(kept, lambda p: p["seg"]), " ")
    return flagged.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("_bp").cast("long")).alias("n_boilerplate"),
        cleaned.alias("cleaned_text"),
        F.size(F.split(F.trim(cleaned), r"\s+")).alias("retained_words"),
    ).withColumn(
        "retained_words",
        F.when(F.col("cleaned_text") == "", F.lit(0)).otherwise(
            F.col("retained_words")
        ).cast("long"),
    )


def select_by_budget(
    df: DataFrame,
    tokens_col: str,
    order_cols: list,
    budget: int,
    num_partitions: int = 32,
) -> DataFrame:
    """Greedy corpus selection under a token budget: keep the prefix of
    the given TOTAL order (include a unique tiebreaker) whose running
    token total stays ≤ ``budget`` — the data-selection step of every
    pretraining mix ("take the best documents until the budget is
    full"). Prefix semantics: the first document that would overflow the
    budget stops the selection.

    Exact distributed prefix sum, same shape as ``global_rank``:
    ``repartitionByRange`` on the order keys, per-partition running sums
    via a partition-local window, per-partition TOTALS (one row each)
    broadcast back as cumulative offsets. Adds ``cum_tokens``. No
    single-task window anywhere.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_sb_pid", F.spark_partition_id()
    )
    d = d.localCheckpoint(eager=True)  # pin partition placement
    w = (
        Window.partitionBy("_sb_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_sb_run", F.sum(F.col(tokens_col).cast("long")).over(w))
    sums = sorted(
        (r["_sb_pid"], r["_s"])
        for r in d.groupBy("_sb_pid")
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("_s"))
        .collect()
    )
    acc, offsets = 0, []
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += int(s or 0)
    off = local_df(d.sparkSession, 
        offsets or [(0, 0)], "_sb_pid int, _sb_off long"
    )
    return (
        d.join(F.broadcast(off), "_sb_pid")
        .withColumn("cum_tokens", F.col("_sb_off") + F.col("_sb_run"))
        .where(F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("_sb_pid", "_sb_run", "_sb_off")
    )


def temperature_resample(
    df: DataFrame,
    domain_col: str = "source",
    key_col: str = "doc_id",
    temperature: float = 0.5,
    budget: int = 250,
    salt: str = "strat",
) -> DataFrame:
    """Materialize a temperature-balanced corpus (the sampling step that
    turns ``text.mixing_weights``' target shares into actual rows):
    domain d keeps fraction min(1, w_d·budget/n_d) of its documents,
    applied with the deterministic md5 stratified sampler — so small
    domains are up-weighted toward the w_d ∝ n_d^T mixture and the whole
    materialization is reproducible on any engine/partitioning.

    The per-domain table is driver-collected (bounded by the domain
    count) to build the fraction map — the same broadcastable-scalar
    shape as mixing_weights itself.
    """
    from .text import mixing_weights

    rows = mixing_weights(df, domain_col, temperature).collect()
    fractions = {
        r["domain"]: min(1.0, r["weight"] * budget / r["n_docs"]) for r in rows
    }
    return stratified_sample(
        df,
        strata_col=domain_col,
        key_col=key_col,
        fractions=fractions,
        default_fraction=0.0,
        salt=salt,
    )
