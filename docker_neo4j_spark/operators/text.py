"""Text-analysis operators for the training-data pipeline surface.

All pure JVM-side column expressions (no Python UDFs): tokenization,
token/char stats, quality scoring, n-gram language-ID heuristic, and a
polynomial rolling-hash document fingerprint. Each is deterministic and
has an exact DuckDB-SQL twin in ``catalog/llm_queries.py``, so the whole
layer is oracle-checkable.

At 100 TB these are embarrassingly parallel map-only transforms — no
shuffle, full whole-stage codegen, pushdown-friendly (only ``text`` and
the key column are read).

Reference anchor: the packaged engine's text functions (split, toLower,
size — SURVEY.md §2.B.7) plus the brief's training-data-pipeline ops.
"""

from __future__ import annotations
from ..localframe import local_df

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._mem import release as _release

# Word tokens: runs of letters/digits (ASCII-lowered upstream). Mirrors a
# BPE-ish pre-tokenizer split; punctuation surfaces separately.
TOKEN_RE = "[a-z0-9]+"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"

# GPT-2-style pre-tokenizer pattern (public: openai/gpt-2 encoder.py),
# restricted to the Java-regex ∩ RE2 dialect so Spark and the DuckDB
# oracle segment identically: contractions, optionally-space-prefixed
# letter runs / digit runs / symbol runs. The original's trailing
# `\s+(?!\S)` clause needs lookahead (absent from RE2) and only affects
# pure-whitespace tokens, which a token COUNT ignores anyway.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deliberately small and overlapping-free enough to separate the
# corpus languages (en/de/es/fr + CJK detection for zh).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "es": ["el", "los", "las", "que", "y", "en", "un", "una", "es", "por"],
    "fr": ["le", "les", "des", "et", "est", "dans", "une", "du", "au", "pas"],
}


def tokens(text) -> Column:
    """Lowercased word tokens via regexp extraction (JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def token_counts(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Whitespace and BPE-ish token counts per document (the brief's
    'token counting' row): (key, n_ws_tokens, n_bpe_tokens).

    Whitespace tokens = non-empty splits on ``\\s+``; BPE-ish tokens =
    matches of the GPT-2 pre-tokenizer pattern (see ``BPE_TOKEN_RE``).
    Map-only, two columns read, full codegen.
    """
    ws = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    ).cast("long")
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).cast("long")
    return df.select(key, ws.alias("n_ws_tokens"), bpe.alias("n_bpe_tokens"))


def text_stats(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Token/char counts, word-length and punctuation stats per document.

    Map-only; at scale reads exactly two columns off parquet.
    """
    t = tokens(text_col)
    n_tok = F.size(t).cast("long")
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_RE), 0)).cast("long")
    n_chars = F.length(text_col).cast("long")
    return df.select(
        key,
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.size(F.array_distinct(t)).cast("long").alias("n_unique_tokens"),
        sum_len.alias("sum_token_len"),
        n_punct.alias("n_punct"),
    )


def quality_score(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Heuristic quality score: length, punctuation density, stopword ratio,
    lexical diversity — the standard pre-training filters, all JVM-side.
    """
    t = tokens(text_col)
    n_tok = F.size(t).cast("double")
    n_chars = F.length(text_col).cast("double")
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x))).cast("double")
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_RE), 0)).cast("double")
    diversity = F.size(F.array_distinct(t)).cast("double") / F.greatest(n_tok, F.lit(1.0))
    stop_ratio = n_sw / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1.0))
    # Deterministic linear score — same closed form on the oracle side.
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + diversity * 0.2
        + (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))) * 0.1
    )
    return df.select(
        key,
        n_tok.cast("long").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        diversity.alias("diversity"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Stopword/CJK-profile language identification (en/de/es/fr/zh).

    CJK codepoints → zh; otherwise argmax of per-language stopword hits with
    a fixed tie-break order (en > de > es > fr). Deterministic, map-only.
    """
    t = tokens(text_col)

    def _hits(words: list[str]) -> Column:
        arr = F.array([F.lit(w) for w in words])
        return F.size(F.filter(t, lambda x: F.array_contains(arr, x))).cast("long")

    hits = {lang: _hits(words) for lang, words in STOPWORDS.items()}
    cjk = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[一-鿿]"), 0)).cast("long")
    best = (
        F.when(cjk > 0, F.lit("zh"))
        .when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["es"]) & (hits["de"] >= hits["fr"]), F.lit("de"))
        .when(hits["es"] >= hits["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return df.select(
        key,
        hits["en"].alias("sw_en"),
        hits["de"].alias("sw_de"),
        hits["es"].alias("sw_es"),
        hits["fr"].alias("sw_fr"),
        cjk.alias("n_cjk"),
        best.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Polynomial rolling-hash fingerprint over tokens.

    fp = Σ-fold of ``acc*31 + (len(tok)*131 + ascii(first char))  (mod 2^31-1)``
    — deterministic, engine-portable (the mod keeps every intermediate in
    exact integer range for both Spark and DuckDB), and order-sensitive the
    way a rolling content hash must be. ``content_md5`` is the exact-identity
    companion (both engines ship bit-identical MD5).
    """
    t = tokens(text_col)
    m = 2**31 - 1
    fp = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + F.length(x).cast("long") * 131 + F.ascii(x)) % m,
    )
    return df.select(
        key,
        fp.alias("fingerprint"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021, "Scaling Language Models", Table A1 — public):

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line (0.0 for ≤1 line),
    - ``top_bigram_frac``: fraction of the doc's word bigrams occupied by
      its single most frequent bigram (0.0 when no bigram).

    Pure higher-order-function arithmetic over each row — map-only, no
    shuffle, exact integer ratios surfaced as DOUBLE (n/m with both
    BIGINT — bit-identical across engines)."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - n_distinct_lines).cast("double") / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_bi = F.size(toks) - 1
    bigrams = F.when(
        n_bi > 0,
        F.transform(
            F.sequence(F.lit(1), n_bi),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # max bigram multiplicity via explode → two-level aggregate — LINEAR
    # in doc length (a per-row distinct×filter HOF was quadratic: 77 s at
    # sf0.01 vs ~2 s for this shape) and the groupBy key (doc, bigram) is
    # high-cardinality/uniform, so the shuffle scales
    base = df.select(
        F.col(key),
        dup_line_frac.alias("dup_line_frac"),
        n_bi.cast("long").alias("_n_bi"),
        bigrams.alias("_bi"),
    )
    top = (
        base.select(key, F.explode("_bi").alias("_bg"))
        .groupBy(key, "_bg")
        .agg(F.count("*").alias("_c"))
        .groupBy(key)
        .agg(F.max("_c").alias("_top"))
    )
    return (
        base.join(top, key, "left")
        .select(
            key,
            "dup_line_frac",
            F.when(
                F.col("_n_bi") > 0,
                F.col("_top").cast("double") / F.col("_n_bi").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )


def mixing_weights(
    df: DataFrame,
    domain_col: str = "source",
    temperature: float = 0.7,
) -> DataFrame:
    """Temperature-based corpus mixing weights per domain: w_d ∝ n_d^T
    (Conneau & Lample 2019's multilingual sampling, public) — the knob
    that up-samples small sources. One groupBy + a broadcastable scalar:
    returns (domain, n_docs, weight) with Σweight = 1."""
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    powered = counts.withColumn(
        "_p", F.pow(F.col("n_docs").cast("double"), F.lit(float(temperature)))
    )
    total = powered.agg(F.sum("_p").alias("_z"))
    return (
        powered.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_docs",
            (F.col("_p") / F.col("_z")).alias("weight"),
        )
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary: top-k tokens by document frequency (ties → term
    frequency desc, then token asc — total order, deterministic). The
    tokenizer-prep primitive: explode tokens → two-level aggregate →
    ordered top-k. Distributes as one explode + one groupBy(token)
    shuffle; the top-k is a global sort of ≤|vocab| aggregated rows, not
    of the corpus."""
    tok = df.select(
        F.col(key).alias("_k"),
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")).alias("token"),
    )
    agg = tok.groupBy("token").agg(
        F.countDistinct("_k").cast("long").alias("doc_freq"),
        F.count("*").cast("long").alias("term_freq"),
    )
    return agg.orderBy(
        F.desc("doc_freq"), F.desc("term_freq"), F.asc("token")
    ).limit(top_k)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    unigram LM — the classic cheap "perplexity" quality signal (docs of
    rare/garbled tokens score high, formulaic boilerplate scores low).

    Two aggregation passes, both shuffling only on bounded keys:
    corpus-wide token counts (one groupBy(token) over the exploded
    frame), then token→count equi-join and a per-doc mean of
    -ln(count/total). The unigram table is |vocab|-sized — broadcast
    when it fits; the join key is the token (the same shape as
    decontamination's n-gram join). Returns (key, n_tokens, nll) with
    nll = mean -ln p(token); empty docs surface NULL.
    """
    tok = df.select(
        F.col(key),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("token"),
    )
    counts = tok.groupBy("token").agg(F.count("*").cast("long").alias("_tc"))
    total = tok.count()
    scored = tok.join(counts, "token").groupBy(key).agg(
        F.count("*").cast("long").alias("n_tokens"),
        (-F.sum(F.log(F.col("_tc") / F.lit(float(total)))) / F.count("*")).alias("nll"),
    )
    return df.select(key).join(scored, key, "left").select(
        key,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "nll",
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Per-document top-k TF-IDF terms: score = tf · ln(N/df), ranked by
    the MILLI-ROUNDED score (ties → token asc) so the ranking is stable
    across engines — two distinct (tf, df) pairs can produce the exact
    same real score (2·ln(10) = ln(100)), and ranking raw doubles there
    would let a 1-ulp libm difference flip which row survives the cut;
    ranking the rounded integer makes the tie explicit and the token
    tiebreak deterministic.

    Shape at scale: explode → groupBy(key, token) [one shuffle] →
    groupBy(token) doc-freq [bounded |vocab| shuffle, broadcast back] →
    per-doc top-k window partitioned BY DOCUMENT (never a global sort).
    Returns (key, token, tf, doc_freq, score_milli), ≤ top_k rows per doc.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(key),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("token"),
    )
    tf = tok.groupBy(key, "token").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("doc_freq"))
    n_docs = df.count()
    scored = tf.join(dfreq, "token").withColumn(
        "score_milli",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("doc_freq").cast("double"))
            * F.lit(1e3)
        ).cast("long"),
    )
    w = Window.partitionBy(key).orderBy(F.desc("score_milli"), F.asc("token"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .select(key, "token", "tf", "doc_freq", "score_milli")
    )


def bm25(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    key: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 retrieval of ``query_terms`` over the corpus (Robertson &
    Spärck Jones): score(d) = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    with idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). Returns the top_k docs as
    (key, n_hits, score_milli), ordered score desc / key asc.

    dl and avgdl come from exact integer token counts (avgdl = Σdl/N, one
    division), df/N are integers — every float enters through the same
    closed-form expression on both engines, and the per-doc sum spans only
    |query| terms, so milli-rounding absorbs summation-order noise.

    Shape at scale: the query-term list is a broadcast literal; scoring is
    explode → semi-join on the ≤|query| term set → groupBy(doc) — the
    corpus is never globally sorted (top_k sorts the matched set only).
    """
    tok = df.select(
        F.col(key),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("token"),
    )
    n_docs = df.count()
    dl = tok.groupBy(key).agg(F.count("*").cast("long").alias("_dl"))
    avgdl = dl.agg(F.sum("_dl")).first()[0] / float(n_docs)
    q = [t.lower() for t in query_terms]
    qtok = tok.where(F.col("token").isin(q))
    tf = qtok.groupBy(key, "token").agg(F.count("*").cast("long").alias("_tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("_df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("_df").cast("double") + F.lit(0.5))
        / (F.col("_df").cast("double") + F.lit(0.5))
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, key)
        .select(
            F.col(key),
            (
                idf
                * (F.col("_tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("_tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("_dl").cast("double") / F.lit(avgdl)
                    )
                )
            ).alias("_s"),
        )
    )
    scored = per_term.groupBy(key).agg(
        F.count("*").cast("long").alias("n_hits"),
        F.round(F.sum("_s") * F.lit(1e3)).cast("long").alias("score_milli"),
    )
    return scored.orderBy(F.desc("score_milli"), F.asc(key)).limit(top_k)


def importance_weights(
    df: DataFrame,
    target_filter,
    text_col: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, data selection via
    importance resampling): per-doc mean log-likelihood ratio between the
    TARGET unigram LM (docs matching ``target_filter``, a boolean Column)
    and the BACKGROUND LM (all other docs), add-1 smoothed over the joint
    vocabulary: w(d) = (1/|d|) Σ_{tok∈d} [ln p_t(tok) − ln p_b(tok)].
    Docs that look like the target distribution score positive and are
    kept preferentially when resampling. Returns (key, n_tokens,
    llr_milli); empty docs surface NULL.

    Shape at scale: one explode, two bounded groupBy(token) count tables
    (broadcast when they fit), one token equi-join back, one groupBy(doc)
    — identical to ``unigram_logprob`` with a second LM column.
    """
    tok = df.select(
        F.col(key),
        target_filter.alias("_is_t"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.sum(F.col("_is_t").cast("long")).cast("long").alias("_ct"),
        F.sum((~F.col("_is_t")).cast("long")).cast("long").alias("_cb"),
    )
    totals = counts.agg(
        F.sum("_ct").alias("t"), F.sum("_cb").alias("b"), F.count("*").alias("v")
    ).first()
    t_tot, b_tot, vocab = float(totals["t"]), float(totals["b"]), float(totals["v"])
    llr = F.log(
        (F.col("_ct").cast("double") + F.lit(1.0)) / F.lit(t_tot + vocab)
    ) - F.log((F.col("_cb").cast("double") + F.lit(1.0)) / F.lit(b_tot + vocab))
    scored = tok.join(counts, "token").groupBy(key).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.sum(llr) / F.count("*") * F.lit(1e3)).cast("long").alias("llr_milli"),
    )
    return df.select(key).join(scored, key, "left").select(
        key,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "llr_milli",
    )


def domain_kl(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain KL divergence from the corpus unigram distribution:
    KL(p_d ‖ p) = Σ_w p_d(w)·ln(p_d(w)/p(w)), add-1 smoothed over the
    corpus vocabulary — the data-mixing diagnostic that ranks how far
    each source drifts from the blend (near-duplicate domains score ~0,
    specialist domains score high). Returns (domain, n_tokens, kl_milli).

    Shape at scale: one explode → one groupBy(domain, token) count → one
    groupBy(token) corpus count (broadcast back) → one groupBy(domain)
    fold. The |domains|×|vocab| term table is the only wide frame and it
    aggregates immediately; nothing is ever collected.
    """
    tok = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("token"),
    )
    dc = tok.groupBy("domain", "token").agg(F.count("*").cast("long").alias("_cd"))
    cc = dc.groupBy("token").agg(F.sum("_cd").alias("_c"))
    d_tot = dc.groupBy("domain").agg(F.sum("_cd").alias("_td"))
    totals = cc.agg(F.sum("_c").alias("t"), F.count("*").alias("v")).first()
    c_tot, vocab = float(totals["t"]), float(totals["v"])
    # smoothed probabilities; every term derives from exact integer counts
    # through the same closed form on both engines
    p_d = (F.col("_cd").cast("double") + F.lit(1.0)) / (
        F.col("_td").cast("double") + F.lit(vocab)
    )
    p = (F.col("_c").cast("double") + F.lit(1.0)) / F.lit(c_tot + vocab)
    per_term = (
        dc.join(F.broadcast(cc), "token")
        .join(F.broadcast(d_tot), "domain")
        .select("domain", F.col("_td"), (p_d * F.log(p_d / p)).alias("_kl"))
    )
    return per_term.groupBy("domain").agg(
        F.first("_td").cast("long").alias("n_tokens"),
        F.round(F.sum("_kl") * F.lit(1e3)).cast("long").alias("kl_milli"),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 6,
) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn
    ``num_merges`` merge rules from the corpus. Returns the merge table
    (rank, pair_a, pair_b, merged, pair_count) in learning order.

    The classic trick that makes this distributed-cheap: collapse the
    corpus to (word, count) ONCE — afterwards every round works on the
    vocabulary, not the corpus. Per round: adjacent-pair explode over the
    |vocab| segmentations → groupBy(pair) weighted count → one argmax
    scalar (count desc, pair asc — deterministic tie-break) → a
    whole-stage-codegen ``aggregate`` left-fold re-segments each word
    (greedy leftmost application, the BPE contract; runs of the same
    token merge pairwise like the reference implementation). At 100 TB
    the only corpus-sized job is the initial token count; the iteration
    cost is O(num_merges × |vocab|).
    """
    tok = df.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("w")
    )
    words = tok.groupBy("w").agg(F.count("*").cast("long").alias("wc"))
    # Lazy checkpoints, one job per merge round (r14, guide §2.4): each
    # round's argmax scan is the action that materializes the previous
    # round's re-segmentation, so the former separate eager-checkpoint job
    # per round is gone — and the LAST re-segmentation (which nothing
    # consumes: the merge table is built from the collected argmax rows)
    # is never computed at all. The superseded seg frame is released one
    # round behind, after the frame derived from it has materialized.
    seg = words.select("w", "wc", F.split("w", "").alias("seg")).localCheckpoint(
        eager=False
    )
    merges = []
    prev = None
    for k in range(num_merges):
        pairs = (
            seg.where(F.size("seg") > 1)
            .select(
                "wc",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(seg, 1, size(seg)-1)").alias("a"),
                        F.expr("slice(seg, 2, size(seg)-1)").alias("b"),
                    )
                ).alias("p"),
            )
            .select(F.col("p.a").alias("pa"), F.col("p.b").alias("pb"), "wc")
        )
        best = (
            pairs.groupBy("pa", "pb")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pa"), F.asc("pb"))
            .first()
        )
        # the argmax job above materialized `seg`'s lazy checkpoint; the
        # frame it was derived from can be released now
        if prev is not None:
            _release(prev)
        prev = seg
        if best is None:
            break
        pa, pb, cnt = best["pa"], best["pb"], int(best["cnt"])
        merged = pa + pb
        merges.append((k, pa, pb, merged, cnt))
        # tokens match TOKEN_RE ([a-z0-9]+) so literal embedding is safe
        seg = seg.withColumn(
            "seg",
            F.expr(
                f"""aggregate(seg, CAST(array() AS array<string>),
                (acc, x) -> CASE
                  WHEN size(acc) > 0 AND element_at(acc, -1) = '{pa}' AND x = '{pb}'
                  THEN concat(slice(acc, 1, size(acc)-1), array('{merged}'))
                  ELSE concat(acc, array(x)) END)"""
            ),
        ).localCheckpoint(eager=False)
    if prev is not None:
        _release(prev)
    spark = df.sparkSession
    return local_df(spark, 
        merges, "rank long, pair_a string, pair_b string, merged string, pair_count long"
    )


def bpe_token_counts(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Apply a ``bpe_train`` merge table to the corpus: per-document token
    count under the learned vocabulary — the tokenizer-budgeting signal
    (how many BPE tokens will this corpus cost?). Returns
    (key, n_bpe_tokens); docs with no tokens surface 0.

    The merge table is bounded by construction (num_merges rows), so
    collecting it to build the fold chain is a driver-side constant, not
    a data collect. Encoding applies each merge exhaustively in rank
    order — one left-fold per rule, the standard priority-order encoder —
    over the DISTINCT words only; documents then join word → subword
    count, so the per-doc cost is one explode + one vocab join.
    """
    rules = [
        (r["pair_a"], r["pair_b"], r["merged"])
        for r in merges.orderBy("rank").collect()
    ]
    tok = df.select(
        F.col(key),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("w"),
    )
    words = tok.select("w").distinct().withColumn("seg", F.split("w", ""))
    for pa, pb, m in rules:
        words = words.withColumn(
            "seg",
            F.expr(
                f"""aggregate(seg, CAST(array() AS array<string>),
                (acc, x) -> CASE
                  WHEN size(acc) > 0 AND element_at(acc, -1) = '{pa}' AND x = '{pb}'
                  THEN concat(slice(acc, 1, size(acc)-1), array('{m}'))
                  ELSE concat(acc, array(x)) END)"""
            ),
        )
    counts = words.select("w", F.size("seg").cast("long").alias("_n"))
    per_doc = tok.join(counts, "w").groupBy(key).agg(
        F.sum("_n").cast("long").alias("n_bpe_tokens")
    )
    return df.select(key).join(per_doc, key, "left").select(
        key, F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens")
    )


def linear_classifier_score(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    n_buckets: int = 256,
    bias: int = -40,
) -> DataFrame:
    """Quality-classifier INFERENCE over hashed bag-of-words features —
    the serving half of a fastText/logreg-style filter (the model the
    big public corpora gate on): feature = md5-hash bucket of each
    whitespace token, weight = a fixed integer table keyed by bucket
    (here derived from a Knuth multiplicative hash of the bucket id —
    deterministic stand-in for trained weights; swap in a real table by
    joining a (bucket, weight) frame). Returns (key, score, keep).

    Scale shape: explode → map-side bucket+weight expressions → one
    groupBy(key) integer sum. No model object on the driver, no UDF;
    weights-as-expression keeps everything in whole-stage codegen, and
    a learned weight table would broadcast-join instead. Integer
    arithmetic end-to-end — bit-exact on any engine.
    """
    tok = df.select(
        F.col(key),
        F.explode(F.split(F.col(text_col), " ")).alias("_t"),
    ).where(F.col("_t") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("_t")), 1, 4), 16, 10).cast("long")
        % n_buckets
    )
    weight = (bucket * F.lit(2654435761)) % F.lit(1001) - F.lit(500)
    scored = (
        tok.select(F.col(key), weight.alias("_w"))
        .groupBy(key)
        .agg(F.sum("_w").cast("long").alias("raw"))
    )
    return scored.select(
        key,
        (F.col("raw") + F.lit(bias)).alias("score"),
        (F.col("raw") + F.lit(bias) > 0).alias("keep"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    key: str = "doc_id",
    lam: float = 0.5,
) -> DataFrame:
    """Per-document mean negative log-probability under an interpolated
    bigram LM trained on the corpus itself — one rung above the unigram
    signal: formulaic word-order boilerplate scores low, shuffled-word
    salad scores high even when its unigram profile is normal.

    p(w2|w1) = lam·c(w1w2)/c(w1·) + (1−lam)·c(w2)/N  (fixed-weight
    Jelinek-Mercer interpolation; the unigram back-off term keeps unseen
    continuations finite).

    Shuffle shape: bigrams explode once, then every aggregation keys on
    a bounded vocabulary (bigram, context, token) — no corpus sort, no
    per-doc state beyond the final groupBy(key). The three stats joins
    are vocab-sized (AQE broadcasts them when they fit). Returns
    (key, n_bigrams, nll); docs with <2 tokens surface NULL nll.
    """
    toks = df.select(F.col(key), tokens(text_col).alias("_t"))
    n_tok = F.size("_t")
    bg = toks.where(n_tok >= 2).select(
        key,
        F.explode(
            F.arrays_zip(
                F.slice("_t", 1, n_tok - 1).alias("w1"),
                F.slice("_t", 2, n_tok - 1).alias("w2"),
            )
        ).alias("_b"),
    ).select(key, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    cb = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("_cb"))
    cctx = cb.groupBy("w1").agg(F.sum("_cb").cast("long").alias("_cctx"))
    tok = toks.select(F.explode("_t").alias("w"))
    cu = tok.groupBy("w").agg(F.count("*").cast("long").alias("_cu"))
    total = float(tok.count())
    p = F.lit(lam) * (F.col("_cb").cast("double") / F.col("_cctx").cast("double")) + F.lit(
        1.0 - lam
    ) * (F.col("_cu").cast("double") / F.lit(total))
    scored = (
        bg.join(cb, ["w1", "w2"])
        .join(cctx, "w1")
        .join(cu, F.col("w2") == F.col("w"))
        .groupBy(key)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            (-F.sum(F.log(p)) / F.count("*")).alias("nll"),
        )
    )
    return df.select(key).join(scored, key, "left").select(
        key,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "nll",
    )


# Gopher document-quality rule thresholds (Rae et al. 2021, "Scaling
# Language Models: Methods, Analysis & Insights from Training Gopher",
# Appendix A1.1 — public). Word = non-empty whitespace split (raw, not
# the alnum token set: mean word length counts punctuation the way the
# paper's tokenizer-free filter does).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_REQUIRED_STOPWORDS = 2


def gopher_rules(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Full Gopher quality-filter rule suite per document (Rae et al.
    2021, Appendix A1.1): word-count bounds, mean word length, symbol
    ("#"/"...") to word ratio, bullet-start and ellipsis-end line
    fractions, alphabetic-word fraction, and the required-stopword rule
    — surfaced as per-rule signals plus the conjunction ``keep`` flag.

    Pure higher-order-function arithmetic per row — map-only, no
    shuffle, two columns read off parquet. Every ratio is an exact
    BIGINT/BIGINT division to DOUBLE, so the DuckDB oracle twin matches
    bit-for-bit; threshold comparisons on those exact doubles make
    ``keep`` deterministic across engines.
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_word_len = F.when(
        n_words > 0, sum_len.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), 0)).cast("long")
    )
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    alpha_frac = F.when(
        n_words > 0, n_alpha.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    n_lines = F.size(lines).cast("long")
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda x: x.rlike(r"^[-*•]"))).cast("double")
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)$"))).cast("double")
        / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    sw = F.array([F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])
    low = F.transform(words, lambda w: F.lower(w))
    n_req_sw = F.size(
        F.filter(sw, lambda s: F.array_contains(low, s))
    ).cast("long")
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_frac <= GOPHER_MAX_BULLET_FRAC)
        & (ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (n_req_sw >= GOPHER_MIN_REQUIRED_STOPWORDS)
    )
    return df.select(
        key,
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        n_req_sw.alias("n_required_stopwords"),
        keep.alias("keep"),
    )
