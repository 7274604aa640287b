"""LLM training-data-pipeline queries over documents/embeddings (brief §LLM).

Oracle-checked where the op is deterministic and SQL-expressible (text
stats, quality score, language-ID, fingerprints, exact dedup, block-join
Jaccard, brute-force cosine top-k); rows-only for the approximate/LSH ops
(MinHash near-dup, SimHash, ANN, mapInPandas features) — those get recall
and determinism pytest coverage instead.

Float-exactness note: every double expression here is a closed-form
sequential fold (left-fold dot products, same operation order both
engines), so even the DOUBLE columns hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import multimodal as mm
from ..operators import similarity as sim
from ..operators import text as tx
from ..sources.tpch import load_tables
from . import register

# DuckDB twin of operators.text.tokens
_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_PUNCT = """regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')"""


@register(
    "llm_token_counts",
    r"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')) AS BIGINT)
             AS n_ws_tokens,
           CAST(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+'))
             AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def llm_token_counts(spark, sf_dir):
    """Whitespace + GPT-2-style BPE-ish token counts per document."""
    d = load_tables(spark, sf_dir)["documents"]
    return tx.token_counts(d)


@register(
    "llm_text_stats",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_unique_tokens,
           CAST(list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum') AS BIGINT) AS sum_token_len,
           CAST(len({_PUNCT}) AS BIGINT) AS n_punct
    FROM documents
    """,
)
def llm_text_stats(spark, sf_dir):
    """Token counting + char/word stats (map-only, codegen)."""
    d = load_tables(spark, sf_dir)["documents"]
    return tx.text_stats(d)


@register(
    "llm_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(list_filter({_TOKS},
                  x -> list_contains(['the','and','of','to','in','is','that','for','it','with'], x)))
                  AS DOUBLE) AS n_sw,
             CAST(len({_PUNCT}) AS DOUBLE) AS n_punct,
             CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_uniq
      FROM documents)
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           n_sw / greatest(n_tok, 1.0) AS stop_ratio,
           n_uniq / greatest(n_tok, 1.0) AS diversity,
           n_punct / greatest(n_chars, 1.0) AS punct_ratio,
           least(n_tok / 100.0, 1.0) * 0.4
             + (n_sw / greatest(n_tok, 1.0)) * 0.3
             + (n_uniq / greatest(n_tok, 1.0)) * 0.2
             + (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 10, 1.0)) * 0.1 AS quality
    FROM t
    """,
)
def llm_quality_score(spark, sf_dir):
    """Pre-training quality filters: length, stopword ratio, diversity."""
    d = load_tables(spark, sf_dir)["documents"]
    return tx.quality_score(d)


def _sw_sql(words: list[str]) -> str:
    arr = ",".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter({_TOKS}, x -> list_contains([{arr}], x))) AS BIGINT)"


@register(
    "llm_language_id",
    f"""
    WITH t AS (
      SELECT doc_id,
             {_sw_sql(tx.STOPWORDS["en"])} AS sw_en,
             {_sw_sql(tx.STOPWORDS["de"])} AS sw_de,
             {_sw_sql(tx.STOPWORDS["es"])} AS sw_es,
             {_sw_sql(tx.STOPWORDS["fr"])} AS sw_fr,
             CAST(len(regexp_extract_all(text, '[\\x{{4E00}}-\\x{{9FFF}}]')) AS BIGINT) AS n_cjk
      FROM documents)
    SELECT doc_id, sw_en, sw_de, sw_es, sw_fr, n_cjk,
           CASE WHEN n_cjk > 0 THEN 'zh'
                WHEN sw_en >= sw_de AND sw_en >= sw_es AND sw_en >= sw_fr THEN 'en'
                WHEN sw_de >= sw_es AND sw_de >= sw_fr THEN 'de'
                WHEN sw_es >= sw_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM t
    """,
)
def llm_language_id(spark, sf_dir):
    """Stopword/CJK-profile language identification."""
    d = load_tables(spark, sf_dir)["documents"]
    return tx.language_id(d)


@register(
    "llm_fingerprint",
    f"""
    SELECT doc_id,
           CAST(list_reduce(
               list_prepend(0, list_transform({_TOKS}, t -> length(t) * 131 + ord(t[1]))),
               (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT) AS fingerprint,
           md5(text) AS content_md5
    FROM documents
    """,
)
def llm_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint + exact MD5 identity."""
    d = load_tables(spark, sf_dir)["documents"]
    return tx.fingerprint(d)


@register(
    "llm_exact_dedup",
    """
    SELECT md5(text) AS digest,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keep_id
    FROM documents GROUP BY md5(text)
    """,
)
def llm_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on content digest, keep lowest id."""
    d = load_tables(spark, sf_dir)["documents"]
    return dd.exact_dedup(d)


@register(
    "llm_ngram_jaccard_block",
    f"""
    WITH s AS (
      SELECT doc_id, lang, source,
             list_distinct(list_transform(
               range(0, greatest(len({_TOKS}) - 3, 0) + 1),
               i -> array_to_string(({_TOKS})[i+1:i+3], ' '))) AS sh
      FROM documents)
    SELECT a.doc_id AS key_a, b.doc_id AS key_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / greatest(CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 1.0) AS jaccard
    FROM s a JOIN s b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    """,
)
def llm_ngram_jaccard_block(spark, sf_dir):
    """n-gram Jaccard over a deterministic (lang, source) block join.

    The block key bounds bucket size, so the pair count stays linear-ish in
    corpus size — the scalable alternative to an all-pairs cross join.
    """
    d = load_tables(spark, sf_dir)["documents"]
    blocks = d.select("doc_id", "lang", "source")
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["lang", "source"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("key_a"), F.col("b.doc_id").alias("key_b"))
    )
    return dd.jaccard_pairs(d, cand)


@register(
    "llm_cosine_topk",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_prepend(0.0,
               list_transform(range(1, len(q.embedding) + 1),
                 i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)),
               (acc, x) -> acc + x)
             / greatest(
                 sqrt(list_reduce(list_prepend(0.0,
                   list_transform(range(1, len(q.embedding) + 1),
                     i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)),
                   (acc, x) -> acc + x))
               * sqrt(list_reduce(list_prepend(0.0,
                   list_transform(range(1, len(c.embedding) + 1),
                     i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)),
                   (acc, x) -> acc + x)),
               1e-12) AS sim
      FROM q JOIN embeddings c ON q.vec_id != c.vec_id)
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 5
    """,
)
def llm_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for the first 10 vectors (exact baseline)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    return sim.brute_force_topk(e, e.where(F.col("vec_id") < 10), k=5)


def _dot_sql(a: str, b: str) -> str:
    """Left-fold double dot product — same operation order as operators.
    similarity.dot, so results are bit-identical."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, x) -> acc + x)"
    )


_COS_SQL = (
    f"{_dot_sql('a.embedding', 'b.embedding')} / greatest("
    f"sqrt({_dot_sql('a.embedding', 'a.embedding')}) * "
    f"sqrt({_dot_sql('b.embedding', 'b.embedding')}), 1e-12)"
)


@register(
    "llm_ivf_topk",
    f"""
    WITH scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS_SQL} AS sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id != b.vec_id
      WHERE a.vec_id < 50)
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 5
    """,
)
def llm_ivf_topk(spark, sf_dir):
    """IVF ANN: probe the query's coarse cell only (equi-join on the
    cluster assignment — the inverted-file scale path)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    return sim.ivf_topk(e, e.where(F.col("vec_id") < 50), k=5)


@register("llm_ivf_trained")  # rows-only: KMeans float iterations are engine-specific
def llm_ivf_trained(spark, sf_dir):
    """End-to-end trained inverted file: KMeans codebook → cell
    assignment → nprobe=2 probed exact-cosine top-5 (recall vs brute
    force is pytest-graded)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    assigned, centroids = sim.ivf_build(e, n_cells=16, seed=42)
    return sim.ivf_search(assigned, centroids, e.where(F.col("vec_id") < 10), k=5, nprobe=2)


@register(
    "llm_embedding_neardup",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_SQL} AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.35
    """,
)
def llm_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by cluster cell."""
    e = load_tables(spark, sf_dir)["embeddings"]
    return sim.cosine_neardup_blocked(e, threshold=0.35)


def _minhash_pairs_ctes(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> str:
    """Shared CTE chain (no WITH keyword) replaying ``dedup``'s MinHash
    pipeline up to scored pairs — exact since the r8 md5-base + affine
    family: shingles, the (a·x+b) mod p minima, verbatim band keys, the
    max_bucket skew cap, and the Jaccard verify all replay
    operation-for-operation (constants from ``dedup.minhash_params``,
    the same LCG stream the operator bakes). Ends with
    ``scored(key_a, key_b, jaccard)``; compose a threshold on top."""
    from ..operators.dedup import MINHASH_PRIME as p
    from ..operators.dedup import minhash_params

    params = minhash_params(num_hashes)
    rows = num_hashes // bands
    mins = ",\n           ".join(
        f"MIN(({a} * x + {b}) % {p}) AS h{i}" for i, (a, b) in enumerate(params)
    )
    banded = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {key} AS band_hash FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""
    d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[i + 1 : i + {shingle_n}], ' ') AS s
      FROM d, UNNEST(range(0, greatest(len(toks) - {shingle_n}, 0) + 1)) AS t(i)
    ),
    hx AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % {p} AS x
      FROM sh
    ),
    sig AS (SELECT doc_id, {mins} FROM hx GROUP BY doc_id),
    banded AS (
      {banded}
    ),
    buckets AS (
      SELECT band_id, band_hash FROM banded GROUP BY band_id, band_hash
      HAVING COUNT(*) > 1 AND COUNT(*) <= {max_bucket}
    ),
    pairs AS (
      SELECT DISTINCT x.doc_id AS key_a, y.doc_id AS key_b
      FROM banded x
      JOIN buckets u USING (band_id, band_hash)
      JOIN banded y ON y.band_id = x.band_id AND y.band_hash = x.band_hash
                   AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.key_a, p.key_b, COUNT(*) AS ni
      FROM pairs p
      JOIN sh a ON a.doc_id = p.key_a
      JOIN sh b ON b.doc_id = p.key_b AND b.s = a.s
      GROUP BY p.key_a, p.key_b
    ),
    scored AS (
      SELECT i.key_a, i.key_b,
             CAST(i.ni AS DOUBLE)
               / GREATEST(CAST(sa.n + sb.n - i.ni AS DOUBLE), 1.0e0) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.key_a
      JOIN sizes sb ON sb.doc_id = i.key_b
    )"""


def _minhash_neardup_sql(threshold: str = "0.5e0") -> str:
    return f"""
    WITH {_minhash_pairs_ctes()}
    SELECT key_a, key_b, jaccard FROM scored WHERE jaccard >= {threshold}
    """


@register("llm_minhash_neardup", _minhash_neardup_sql())
def llm_minhash_neardup(spark, sf_dir):
    """MinHash+LSH near-dup pairs, Jaccard-verified at 0.5 (banded,
    bucketed).

    Oracle (r8, was rows-only): the md5-base + affine hash family
    (``dedup.minhash_signature_from_base``) exists verbatim in DuckDB,
    so the WHOLE pipeline — signatures, band buckets, skew cap, verify —
    is replayed exactly (``_minhash_neardup_sql``); jaccard is the same
    integer division on both engines, bit-identical."""
    d = load_tables(spark, sf_dir)["documents"]
    return dd.near_dup_dedup(d, threshold=0.5)


# SimHash chunk CTEs shared by the two simhash oracles. Token hash = the
# first 64 bits of md5 (exactly operators/dedup.simhash since the r8
# md5 switch); bit i of the 16-char hex prefix lives in hex char
# 16 − i//4 at nibble bit i%4. Bits vote with multiplicity (2·cnt > n),
# then pack into the same 4×16-bit band chunks the LSH uses — chunk
# values < 2^16, so no 64-bit sign pitfalls on either engine.
_SIMHASH_CHUNKS = """
    tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents
    ),
    h AS (SELECT doc_id, substr(md5(t), 1, 16) AS hx FROM tok),
    v AS (
      SELECT doc_id, g.i,
             SUM((CAST(concat('0x', substr(hx, 16 - CAST(FLOOR(g.i / 4) AS INTEGER), 1)) AS INTEGER)
                  >> (g.i % 4)) & 1) AS cnt,
             COUNT(*) AS n
      FROM h, (SELECT unnest(range(64)) AS i) g
      GROUP BY doc_id, g.i
    ),
    bits AS (SELECT doc_id, i, CASE WHEN cnt * 2 > n THEN 1 ELSE 0 END AS bit FROM v),
    agg AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN i < 16 THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN i >= 16 AND i < 32 THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN i >= 32 AND i < 48 THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN i >= 48 THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS c3
      FROM bits GROUP BY doc_id
    ),
    chunks AS (
      SELECT d.doc_id, COALESCE(c0, 0) AS c0, COALESCE(c1, 0) AS c1,
             COALESCE(c2, 0) AS c2, COALESCE(c3, 0) AS c3
      FROM documents d LEFT JOIN agg USING (doc_id)
    )
"""


def _simhash_chunk_cols(sig):
    """(doc_id, simhash) → the 4×16-bit band chunks as long columns —
    sign-safe on both engines (shiftright sign-extends, the mask strips)."""
    return sig.select(
        "doc_id",
        *[
            F.shiftright("simhash", 16 * b)
            .bitwiseAND(F.lit(0xFFFF))
            .cast("long")
            .alias(f"c{b}")
            for b in range(4)
        ],
    )


@register(
    "llm_simhash",
    f"WITH {_SIMHASH_CHUNKS} SELECT doc_id, c0, c1, c2, c3 FROM chunks",
)
def llm_simhash(spark, sf_dir):
    """64-bit SimHash signature per document (map-only), surfaced as its
    4×16-bit band chunks.

    Oracle (r8, was rows-only): the md5-based token hash exists verbatim
    in DuckDB, so the exact signature is replayed cross-engine
    (``_SIMHASH_CHUNKS``); chunk values < 2^16 sidestep 64-bit sign
    divergence in the compared surface."""
    d = load_tables(spark, sf_dir)["documents"]
    return _simhash_chunk_cols(dd.simhash(d))


@register(
    "llm_simhash_neardup",
    f"""
    WITH {_SIMHASH_CHUNKS},
    banded AS (
      SELECT doc_id, g.b,
             CASE g.b WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END AS chunk
      FROM chunks, (SELECT unnest(range(4)) AS b) g
    ),
    ok_buckets AS (
      SELECT b, chunk FROM banded GROUP BY b, chunk
      HAVING COUNT(*) > 1 AND COUNT(*) <= 1000
    ),
    pairs AS (
      SELECT DISTINCT x.doc_id AS key_a, y.doc_id AS key_b
      FROM banded x
      JOIN ok_buckets o ON o.b = x.b AND o.chunk = x.chunk
      JOIN banded y ON y.b = x.b AND y.chunk = x.chunk AND x.doc_id < y.doc_id
    )
    SELECT p.key_a, p.key_b,
           CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
              + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
             AS BIGINT) AS hamming
    FROM pairs p
    JOIN chunks a ON a.doc_id = p.key_a
    JOIN chunks b ON b.doc_id = p.key_b
    WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
        + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) <= 3
    """,
)
def llm_simhash_neardup(spark, sf_dir):
    """SimHash near-dup pairs via 4×16-bit banding (exact recall at
    Hamming ≤ 3 by pigeonhole; bucket join, never all-pairs).

    Oracle (r8, was rows-only): same banded bucket join in SQL — bucket
    membership, the ``max_bucket`` skew cap, and the per-pair Hamming
    verify are all deterministic given the md5 signatures; Hamming is
    summed per chunk so neither engine touches a signed 64-bit value."""
    d = load_tables(spark, sf_dir)["documents"]
    return dd.simhash_neardup(d, max_hamming=3)


def _ann_topk_sql(
    k: int = 5, dim: int = 64, n_planes: int = 6, n_tables: int = 4,
    seed: int = 42, qmax: int = 10,
) -> str:
    """DuckDB twin of similarity.ann_topk: the hyperplanes are literal
    doubles generated by the SAME ``hyperplane_values`` call the Spark
    plan embeds, so bucket codes, Hamming-1 probes, and fold-ordered
    cosine scores replay exactly — the ANN result is approximate w.r.t.
    brute force but fully deterministic, hence oracle-checkable."""
    from ..operators.similarity import hyperplane_values

    def dot_lit(vec: str, vals: list[float]) -> str:
        lits = "[" + ", ".join(repr(v) for v in vals) + "]"
        return (
            f"list_reduce(list_prepend(0.0, list_transform(range(1, {dim} + 1), "
            f"i -> {vec}[i]::DOUBLE * ({lits})[i])), (acc, x) -> acc + x)"
        )

    buckets = []
    for t in range(n_tables):
        terms = [
            f"(CASE WHEN {dot_lit('embedding', hyperplane_values(dim, p, seed + 7919 * t))}"
            f" >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        ]
        buckets.append(
            "CAST(" + " + ".join(terms) + f" + {t << n_planes} AS BIGINT) AS b{t}"
        )
    bcols = [f"b{t}" for t in range(n_tables)]
    probes = []
    for bc in bcols:
        probes.append(bc)
        probes += [f"xor({bc}, {1 << p})" for p in range(n_planes)]
    return f"""
    WITH base AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm,
             {', '.join(buckets)}
      FROM embeddings),
    corp AS (SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn,
                    unnest([{', '.join(bcols)}]) AS bucket FROM base),
    probes AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn,
                      unnest([{', '.join(probes)}]) AS bucket
               FROM base WHERE vec_id < {qmax}),
    scored AS (
      SELECT query_id, neighbor_id,
             MAX({_dot_sql('qv', 'cv')} / greatest(qn * cn, 1e-12)) AS sim
      FROM probes JOIN corp USING (bucket)
      WHERE query_id != neighbor_id
      GROUP BY query_id, neighbor_id)
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
               AS rank
      FROM scored)
    WHERE rank <= {k} ORDER BY query_id, rank
    """


@register("llm_ann_topk", _ann_topk_sql())
def llm_ann_topk(spark, sf_dir):
    """LSH-bucketed approximate top-5 (the scale path). Approximate
    w.r.t. brute force (recall pytest-checked) but deterministic given
    the literal hyperplanes, so since r8 it carries an exact DuckDB twin
    (``_ann_topk_sql``) replaying buckets, probes, and fold-ordered
    cosines."""
    e = load_tables(spark, sf_dir)["embeddings"]
    return sim.ann_topk(e, e.where(F.col("vec_id") < 10), k=5, dim=64)


# DuckDB replay of the Arrow-batched encoder's FNV-1a token hash: the
# HUGEINT fold keeps every intermediate in [0, 2^64); xor only ever
# touches the low 7 bits (ASCII bytes), so it is computed on the
# BIGINT-safe `acc % 128` slice — bit-identical to operators.embed's
# Python loop (validated token-for-token).
_FNV_SQL = """list_reduce(
    list_prepend(CAST(14695981039346656037 AS HUGEINT),
      list_transform(generate_series(1, length(token)),
                     i -> CAST(unicode(substr(token, i, 1)) AS HUGEINT))),
    (acc, b) -> ((acc - (acc % 128)
                  + xor(CAST(acc % 128 AS BIGINT), CAST(b AS BIGINT)))
                 * 1099511628211) % 18446744073709551616
  )"""


@register(
    "llm_embed_and_search",
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x != '')) AS token
      FROM documents),
    h AS (SELECT doc_id, CAST({_FNV_SQL} % 32 AS BIGINT) AS dim FROM tok),
    cnt AS (SELECT doc_id, dim, CAST(COUNT(*) AS DOUBLE) AS c
            FROM h GROUP BY doc_id, dim),
    m AS (SELECT doc_id, map(list(dim ORDER BY dim), list(c ORDER BY dim)) AS mm
          FROM cnt GROUP BY doc_id),
    vraw AS (
      SELECT d.doc_id,
             list_transform(generate_series(0, 31),
                            i -> coalesce(map_extract(mm, i)[1], 0.0)) AS v
      FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id),
    emb AS (
      SELECT doc_id AS vec_id,
             list_transform(v, x -> CAST(x / (CASE WHEN s = 0.0 THEN 1.0
                                               ELSE sqrt(s) END) AS REAL))
               AS embedding
      FROM (SELECT doc_id, v,
                   list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                               (a, b) -> a + b) AS s
            FROM vraw)),
    q AS (SELECT vec_id, embedding FROM emb WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_dot_sql('q.embedding', 'c.embedding')}
             / greatest(sqrt({_dot_sql('q.embedding', 'q.embedding')})
                        * sqrt({_dot_sql('c.embedding', 'c.embedding')}),
                        1e-12) AS sim
      FROM q JOIN emb c ON q.vec_id != c.vec_id)
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 3
    """,
)
def llm_embed_and_search(spark, sf_dir):
    """genai.vector.encode + vector top-k end-to-end: Arrow-batched
    embedding of the documents, then cosine top-3 over the fresh column.
    Oracle-paired since r8: the encoder's FNV-1a feature hashing, integer
    bag-of-words, double normalize, and float32 cast replay exactly in
    DuckDB (``_FNV_SQL``) — the engine's one pandas_udf is itself
    differential-tested, not just contract-tested."""
    from ..operators.embed import embed_documents

    d = load_tables(spark, sf_dir)["documents"]
    emb = embed_documents(d, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    return sim.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=3)


@register("llm_multimodal_features")  # rows-only: mapInPandas feature extraction
def llm_multimodal_features(spark, sf_dir):
    """Binary media column → Arrow-batched feature extraction (stubbed codec)."""
    d = load_tables(spark, sf_dir)["documents"]
    return mm.extract_features(mm.attach_media(d)).select(
        "media_id", "format", "n_bytes", F.size("feature").cast("long").alias("feat_dim")
    )


@register("llm_multimodal_frames")  # rows-only: mapInPandas row fan-out (stubbed slicer)
def llm_multimodal_frames(spark, sf_dir):
    """Resize + frame-sample plumbing: one media row fans out to sampled
    frames (media_id, frame_idx, frame bytes) through Arrow batches."""
    d = load_tables(spark, sf_dir)["documents"]
    frames = mm.sample_frames(mm.attach_media(d), frame_bytes=64, every_n=2, max_frames=4)
    return frames.select("media_id", "frame_idx", F.length("frame").cast("long").alias("frame_bytes"))


@register(
    "llm_hash_split",
    """
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(doc_id) AS BIGINT) AS first_id
    FROM (
      SELECT doc_id,
             CASE WHEN SUBSTRING(md5(CONCAT('split', CAST(doc_id AS VARCHAR))), 1, 4) < 'e666' THEN 'train'
                  WHEN SUBSTRING(md5(CONCAT('split', CAST(doc_id AS VARCHAR))), 1, 4) < 'f333' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY split ORDER BY split
    """,
)
def llm_hash_split(spark, sf_dir):
    """Deterministic train/val/test split by hashed key (curation.hash_split):
    map-only, engine-reproducible (md5 hex-threshold), leakage-proof."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return (
        curation.hash_split(d, key_col="doc_id", salt="split", fractions=(0.9, 0.05, 0.05))
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("doc_id").cast("long").alias("first_id"),
        )
        .orderBy("split")
    )


@register(
    "llm_pack_sequences",
    """
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS BIGINT)
               AS n_tokens,
             doc_id % 8 AS _shard
      FROM documents
    ), packed AS (
      SELECT doc_id, n_tokens,
             _shard * 4294967296
               + CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY _shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT)
               AS pack_id,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY _shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % 512 AS "offset"
      FROM toks
    )
    SELECT CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX("offset") AS BIGINT) AS max_offset
    FROM packed
    """,
)
def llm_pack_sequences(spark, sf_dir):
    """Sharded sequence packing (curation.pack_sequences): documents fill
    512-token context windows in key order within 8 deterministic shards —
    the pretraining batch-packing planner, pure integer arithmetic."""
    from ..operators import curation
    from ..operators import text as tx

    d = load_tables(spark, sf_dir)["documents"]
    toks = tx.token_counts(d).select("doc_id", F.col("n_ws_tokens").alias("n_tokens"))
    packed = curation.pack_sequences(
        toks, token_col="n_tokens", key_col="doc_id", budget=512, num_shards=8
    )
    return packed.agg(
        F.countDistinct("pack_id").cast("long").alias("n_packs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.max("offset").cast("long").alias("max_offset"),
    )


@register(
    "llm_exact_dedup_clusters",
    """
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical,
           doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
    FROM documents
    """,
)
def llm_exact_dedup_clusters(spark, sf_dir):
    """Exact-duplicate clustering (curation.exact_dedup_clusters): every
    doc mapped to its canonical identical-text member — the keep-one +
    provenance primitive (filter is_canonical = dedup; join canonical =
    explain every drop)."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return curation.exact_dedup_clusters(d)


@register(
    "llm_neardup_clusters",
    f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    und AS (
      SELECT key_a AS a, key_b AS b FROM scored WHERE jaccard >= 0.8e0
      UNION SELECT key_b, key_a FROM scored WHERE jaccard >= 0.8e0
    ),
    lbl(id, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT u.b, l.comp FROM lbl l JOIN und u ON u.a = l.id
    ),
    comp AS (SELECT id, MIN(comp) AS comp FROM lbl GROUP BY id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN id = comp THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
           CAST(COUNT(DISTINCT comp) AS BIGINT) AS n_clusters
    FROM comp
    """,
)
def llm_neardup_clusters(spark, sf_dir):
    """Near-duplicate clustering: MinHash-LSH pairs → Jaccard verify →
    connected components → canonical per cluster (curation.dedup_clusters).

    Oracle (r8, was rows-only): the md5-base MinHash made the pair set
    deterministic, and min-label WCC converges to a UNIQUE fixpoint —
    the DuckDB twin reaches it by recursive min-label closure over the
    same ≥0.8 verified pairs."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    out = curation.dedup_clusters(d, threshold=0.8)
    return out.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("is_canonical"), 0).otherwise(1)).cast("long").alias("n_dropped"),
        F.countDistinct("canonical").cast("long").alias("n_clusters"),
    )


@register(
    "llm_domain_cap",
    """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents
    ) WHERE rk <= 50
    GROUP BY source ORDER BY source
    """,
)
def llm_domain_cap(spark, sf_dir):
    """Per-domain cap (curation.domain_cap): keep the 50 largest docs per
    source — the anti-overrepresentation curation primitive, one window
    shuffle on the domain key."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return (
        curation.domain_cap(d, domain_col="source", key="doc_id", rank_col="n_chars", k=50)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
        .orderBy("source")
    )


@register(
    "llm_quality_filter_langs",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(list_filter({_TOKS},
                  x -> list_contains(['the','and','of','to','in','is','that','for','it','with'], x)))
                  AS DOUBLE) AS n_sw,
             CAST(len({_PUNCT}) AS DOUBLE) AS n_punct,
             CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_uniq
      FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept FROM t
    WHERE least(n_tok / 100.0, 1.0) * 0.4
          + (n_sw / greatest(n_tok, 1.0)) * 0.3
          + (n_uniq / greatest(n_tok, 1.0)) * 0.2
          + (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 10, 1.0)) * 0.1 >= 0.5
    GROUP BY lang ORDER BY lang
    """,
)
def llm_quality_filter_langs(spark, sf_dir):
    """Quality-threshold corpus filter, per language — the transformation
    is stream-compatible (no global state; test_streaming drives the same
    code path through readStream availableNow and asserts batch parity)."""
    d = load_tables(spark, sf_dir)["documents"]
    kept = tx.quality_score(d).where(F.col("quality") >= 0.5).select("doc_id")
    return (
        d.join(kept, "doc_id", "left_semi")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "llm_scrub_pii",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+\d{1,3}([ -]?\d{2,5}){2,5}', '<PHONE>', 'g')
             AS text
    FROM documents
    """,
)
def llm_scrub_pii(spark, sf_dir):
    """URL/email/IPv4/phone scrub pass (curation.scrub_pii): map-only
    regexp_replace chain in the lookaround-free common Java∩RE2∩DuckDB
    dialect — engine-reproducible."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return curation.scrub_pii(d).select("doc_id", "text")


@register(
    "llm_split_paragraphs",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(list_transform(regexp_split_to_array(text, '\n\s*\n'),
                                        x -> TRIM(x)), x -> x != '') AS parts
      FROM documents)
    SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS para_idx, parts[u.i] AS para
    FROM t, UNNEST(generate_series(1, len(parts))) AS u(i)
    """,
)
def llm_split_paragraphs(spark, sf_dir):
    """Blank-line paragraph chunking (curation.split_paragraphs):
    generator projection, no shuffle."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return curation.split_paragraphs(d)


@register(
    "llm_stratified_sample",
    """
    SELECT doc_id, lang FROM documents
    WHERE substring(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 4)
          < CASE WHEN lang = 'en' THEN '4000' ELSE 'ffff' END
    ORDER BY doc_id
    """,
)
def llm_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (curation.stratified_sample):
    keep 25% of English docs, ~100% of everything else, selected by
    hashed key — corpus mixing that is reproducible across engines,
    partitionings and cluster sizes (16-bit md5 bucket vs per-stratum hex
    threshold; 0x4000/0x10000 = 25%, 65535/65536 → 'ffff' ≈ all — exactly
    the oracle's literal, not a float that truncates to 'fffe')."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    out = curation.stratified_sample(
        d, strata_col="lang", fractions={"en": 0.25}, default_fraction=65535 / 65536
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


@register(
    "llm_decontaminate",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS t FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(t[u.i:u.i + 7], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
      WHERE len(t) >= 8),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
    hits AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (gram))
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def llm_decontaminate(spark, sf_dir):
    """Benchmark decontamination (curation.decontaminate): flag documents
    sharing any 8-word n-gram with the benchmark subset (doc_id % 20 = 0
    stands in for a held-out eval set). One distinct-ngram equi-join —
    never doc×benchmark — so the candidate shape survives a 100 TB corpus
    against a fixed benchmark."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    bench = d.where(F.col("doc_id") % 20 == 0)
    return curation.decontaminate(d, bench, n=8).orderBy("doc_id")


@register(
    "llm_repetition_signals",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)), x -> TRIM(x)),
                         x -> x != '') AS lines,
             regexp_split_to_array(TRIM(lower(text)), '\s+') AS toks
      FROM documents),
    b AS (
      SELECT doc_id, lines,
             CASE WHEN len(toks) > 1
                  THEN list_transform(generate_series(1, len(toks) - 1),
                                      i -> toks[i] || ' ' || toks[i + 1])
                  ELSE [] END AS bi
      FROM t),
    e AS (SELECT doc_id, unnest(bi) AS bg FROM b),
    top AS (
      SELECT doc_id, MAX(c) AS top_c FROM (
        SELECT doc_id, bg, COUNT(*) AS c FROM e GROUP BY doc_id, bg)
      GROUP BY doc_id)
    SELECT b.doc_id,
           CASE WHEN len(lines) > 0
                THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                     / CAST(len(lines) AS DOUBLE)
                ELSE 0.0 END AS dup_line_frac,
           CASE WHEN len(bi) > 0
                THEN CAST(top.top_c AS DOUBLE) / CAST(len(bi) AS DOUBLE)
                ELSE 0.0 END AS top_bigram_frac
    FROM b LEFT JOIN top ON top.doc_id = b.doc_id ORDER BY b.doc_id
    """,
)
def llm_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals (text.repetition_signals):
    duplicate-line fraction (per-row HOF) + top-bigram fraction
    (explode → per-doc max multiplicity — linear, shuffle on the uniform
    (doc, bigram) key); ratios are exact integer divisions so both
    engines agree bit-for-bit."""
    from ..operators import text as T

    d = load_tables(spark, sf_dir)["documents"]
    return T.repetition_signals(d).orderBy("doc_id")


@register(
    "llm_mixing_weights",
    """
    WITH c AS (SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source)
    SELECT domain, n_docs,
           CAST(ROUND(pow(CAST(n_docs AS DOUBLE), 0.7e0)
                      / SUM(pow(CAST(n_docs AS DOUBLE), 0.7e0)) OVER ()
                      * 1e6) AS BIGINT) AS weight_micro
    FROM c ORDER BY domain
    """,
)
def llm_mixing_weights(spark, sf_dir):
    """Temperature-sampling corpus weights (text.mixing_weights, T=0.7):
    w_d ∝ n_d^T normalized over domains. Surfaced as micro-weights
    (ROUND(w·1e6)) — libm pow may differ in the last ulp across engines,
    orders of magnitude below the rounding granularity."""
    from ..operators import text as T

    d = load_tables(spark, sf_dir)["documents"]
    out = T.mixing_weights(d, domain_col="source", temperature=0.7)
    return out.select(
        "domain",
        "n_docs",
        F.round(F.col("weight") * F.lit(1e6)).cast("long").alias("weight_micro"),
    ).orderBy("domain")


@register(
    "llm_vocabulary",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents)
    SELECT token,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
           CAST(COUNT(*) AS BIGINT) AS term_freq
    FROM tok GROUP BY token
    ORDER BY doc_freq DESC, term_freq DESC, token ASC LIMIT 100
    """,
)
def llm_vocabulary(spark, sf_dir):
    """Corpus top-100 vocabulary by document frequency
    (text.vocabulary): explode → two-level aggregate → totally-ordered
    top-k (ties term_freq desc then token asc)."""
    from ..operators import text as T

    d = load_tables(spark, sf_dir)["documents"]
    return T.vocabulary(d, top_k=100)


@register(
    "events_asof_join",
    """
    WITH l AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
    r AS (SELECT user_id, ts, MAX(value) AS value FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT l.event_id, r.value AS value_asof
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def events_asof_join(spark, sf_dir):
    """As-of join (operators/asof.asof_join): each click event enriched
    with the latest at-or-before purchase value for the same user —
    union+window, one shuffle on user_id, verified against DuckDB's
    native ASOF JOIN. The right side is pre-aggregated to unique
    (user, ts) so the most-recent match is engine-deterministic."""
    from ..operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "ts", "user_id")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(clicks, purchases, on="ts", by="user_id", value_cols=("value",))
    return out.select("event_id", F.col("value_asof")).orderBy("event_id")


@register(
    "llm_quality_deciles",
    """
    WITH b AS (
      SELECT doc_id, n_chars,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY bucket
    """,
)
def llm_quality_deciles(spark, sf_dir):
    """Decile bucketing by document size (curation.ntile_exact): the
    quality-binning / curriculum primitive, computed as an ANSI-exact
    NTILE(10) WITHOUT the single-task global window — range repartition +
    per-partition row_number + broadcast offsets (curation.global_rank),
    pure integer bucket arithmetic. Oracle: DuckDB's native NTILE over
    the same total order."""
    from ..operators.curation import ntile_exact

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    b = ntile_exact(d, ["n_chars", "doc_id"], n_buckets=10)
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@register(
    "llm_chunk_documents",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk_text,
           CAST(least(64, len(toks) - i*48) AS BIGINT) AS n_tokens
    FROM d, UNNEST(range(0,
      CASE WHEN len(toks) <= 64 THEN 1
           ELSE (len(toks) - 64 + 47) // 48 + 1 END)) AS t(i)
    """,
)
def llm_chunk_documents(spark, sf_dir):
    """Sliding-window chunking (curation.chunk_documents): 64-token
    windows, 16-token overlap (stride 48) — map-only generator
    projection, zero shuffles. Oracle: the same integer window
    arithmetic over DuckDB list slices."""
    from ..operators.curation import chunk_documents

    d = load_tables(spark, sf_dir)["documents"]
    return chunk_documents(d, chunk_tokens=64, overlap=16)


@register(
    "llm_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
      FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS tc FROM tok GROUP BY token),
    total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok),
    scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             -SUM(ln(CAST(c.tc AS DOUBLE) / (SELECT n FROM total))) / COUNT(*) AS nll
      FROM tok t JOIN counts c ON c.token = t.token
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_tokens, 0) AS n_tokens,
           CAST(ROUND(s.nll * 1e3) AS BIGINT) AS nll_milli
    FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    """,
)
def llm_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality signal (text.unigram_logprob): mean -ln p(tok)
    under the corpus's own unigram distribution. Output milli-rounded —
    ln() is libm-ulp engine-dependent and the per-doc mean sums ~100
    terms, so 1e3 granularity keeps the noise ~9 orders below the
    rounding step."""
    from ..operators.text import unigram_logprob

    d = load_tables(spark, sf_dir)["documents"]
    out = unigram_logprob(d)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("nll") * F.lit(1e3)).cast("long").alias("nll_milli"),
    )


_BIGRAM_LM_SQL = """
    WITH d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM d, UNNEST(range(1, len(toks))) AS t(i)
    ),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
    cctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS n FROM cb GROUP BY w1),
    tok AS (SELECT unnest(toks) AS w FROM d),
    cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
    total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok),
    scored AS (
      SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             -SUM(ln(
               0.5e0 * (CAST(cb.c AS DOUBLE) / CAST(cctx.n AS DOUBLE))
               + 0.5e0 * (CAST(cu.c AS DOUBLE) / (SELECT n FROM total))
             )) / COUNT(*) AS nll
      FROM bg b
      JOIN cb USING (w1, w2) JOIN cctx USING (w1) JOIN cu ON cu.w = b.w2
      GROUP BY b.doc_id
    )
    SELECT d2.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
           CAST(ROUND(s.nll * 1e3) AS BIGINT) AS nll_milli
    FROM documents d2 LEFT JOIN scored s ON s.doc_id = d2.doc_id
"""


@register("llm_bigram_lm", _BIGRAM_LM_SQL)
def llm_bigram_lm(spark, sf_dir):
    """r8: interpolated bigram-LM quality signal (text.bigram_logprob,
    Jelinek-Mercer λ=0.5) — word-ORDER sensitive where the unigram row
    is not. Milli-rounded like llm_unigram_logprob (same libm-ulp
    rationale); the p expression is parenthesized identically on both
    engines."""
    from ..operators.text import bigram_logprob

    d = load_tables(spark, sf_dir)["documents"]
    return bigram_logprob(d).select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("nll") * 1e3).cast("long").alias("nll_milli"),
    )


@register(
    "llm_tfidf_topterms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    dfq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    scored AS (
      SELECT t.doc_id, t.token, t.tf, d.doc_freq,
             CAST(ROUND(CAST(t.tf AS DOUBLE)
                        * ln((SELECT n FROM nd) / CAST(d.doc_freq AS DOUBLE))
                        * 1e3) AS BIGINT) AS score_milli
      FROM tf t JOIN dfq d USING (token)),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_milli DESC, token ASC) AS rn
      FROM scored)
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
           CAST(doc_freq AS BIGINT) AS doc_freq, score_milli
    FROM ranked WHERE rn <= 3
    """,
)
def llm_tfidf_topterms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (text.tfidf_top_terms): ranked by
    the milli-rounded score with a token tiebreak — the rounding makes
    equal-real-score coincidences (2·ln 10 = ln 100) an explicit tie
    instead of a libm-ulp coin flip."""
    from ..operators.text import tfidf_top_terms

    d = load_tables(spark, sf_dir)["documents"]
    return tfidf_top_terms(d, top_k=3)


@register(
    "llm_bm25_search",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
      FROM documents),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / (SELECT n FROM nd) AS a FROM dl),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN ('vector', 'hash', 'spark') GROUP BY doc_id, token),
    dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    per_term AS (
      SELECT t.doc_id,
             ln(1e0 + ((SELECT n FROM nd) - CAST(d.df AS DOUBLE) + 0.5e0)
                      / (CAST(d.df AS DOUBLE) + 0.5e0))
             * (CAST(t.tf AS DOUBLE) * 2.2e0)
             / (CAST(t.tf AS DOUBLE)
                + 1.2e0 * (0.25e0 + 0.75e0 * CAST(l.dl AS DOUBLE)
                                    / (SELECT a FROM avgdl))) AS s
      FROM tf t JOIN dfq d USING (token) JOIN dl l USING (doc_id)),
    scored AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(ROUND(SUM(s) * 1e3) AS BIGINT) AS score_milli
      FROM per_term GROUP BY doc_id)
    SELECT doc_id, n_hits, score_milli FROM scored
    ORDER BY score_milli DESC, doc_id ASC LIMIT 20
    """,
)
def llm_bm25_search(spark, sf_dir):
    """BM25 top-20 for the query 'vector hash spark' (text.bm25,
    k1=1.2 b=0.75): dl/df/N are exact integers, avgdl one division, the
    per-doc sum spans ≤3 terms — milli-rounding absorbs the float noise.
    LIMIT carries the (score, doc_id) total order."""
    from ..operators.text import bm25

    d = load_tables(spark, sf_dir)["documents"]
    return bm25(d, ["vector", "hash", "spark"], top_k=20)


@register(
    "llm_importance_weights",
    """
    WITH tok AS (
      SELECT doc_id, lang = 'en' AS is_t,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
      FROM documents),
    counts AS (
      SELECT token,
             SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cb
      FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS t, CAST(SUM(cb) AS DOUBLE) AS b,
                   CAST(COUNT(*) AS DOUBLE) AS v FROM counts),
    scored AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens,
             CAST(ROUND(SUM(
               ln((CAST(c.ct AS DOUBLE) + 1e0)
                  / ((SELECT t FROM tot) + (SELECT v FROM tot)))
               - ln((CAST(c.cb AS DOUBLE) + 1e0)
                    / ((SELECT b FROM tot) + (SELECT v FROM tot)))
             ) / COUNT(*) * 1e3) AS BIGINT) AS llr_milli
      FROM tok t JOIN counts c USING (token) GROUP BY t.doc_id)
    SELECT d.doc_id, CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           s.llr_milli
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def llm_importance_weights(spark, sf_dir):
    """DSIR-style importance weights (text.importance_weights): per-doc
    mean log-likelihood ratio of the lang='en' target unigram LM vs the
    background LM, add-1 smoothed — the published importance-resampling
    selection signal, milli-rounded like the unigram row."""
    from ..operators.text import importance_weights

    d = load_tables(spark, sf_dir)["documents"]
    return importance_weights(d, F.col("lang") == "en")


@register(
    "llm_bloom_membership",
    """
    WITH bkeys AS (
      SELECT text AS key FROM documents WHERE source IN ('src0', 'src1', 'src2')),
    pos AS (
      SELECT (CAST(CONCAT('0x', substr(md5(key || '#' || CAST(i AS VARCHAR)), 1, 8))
                   AS BIGINT) % 65536) AS pos
      FROM bkeys, range(5) t(i)),
    bloom AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
      FROM pos GROUP BY 1),
    ppos AS (
      SELECT doc_id,
             (CAST(CONCAT('0x', substr(md5(text || '#' || CAST(i AS VARCHAR)), 1, 8))
                   AS BIGINT) % 65536) AS pos
      FROM documents, range(5) t(i)),
    hits AS (
      SELECT p.doc_id, COUNT(*) AS c
      FROM ppos p JOIN bloom b ON b.word = p.pos // 32
      WHERE (b.bits & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INTEGER))) <> 0
      GROUP BY p.doc_id)
    SELECT d.doc_id, COALESCE(h.c, 0) = 5 AS hit
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
)
def llm_bloom_membership(spark, sf_dir):
    """Bloom-filter seen-set membership (dedup.bloom_build/bloom_probe):
    the filter built over sources src0-2 is a ≤2048-row broadcast bitmap;
    probing the whole corpus is map-side hashing + a broadcast lookup.
    Every build-set doc hits (no false negatives); the md5-derived hash
    family makes false positives identical across engines, so the row is
    exact, not statistical."""
    from ..operators.dedup import bloom_build, bloom_probe

    d = load_tables(spark, sf_dir)["documents"]
    bloom = bloom_build(d.where(F.col("source").isin("src0", "src1", "src2")))
    return bloom_probe(d, bloom)


@register(
    "llm_curation_pipeline",
    """
    WITH kept AS (SELECT * FROM documents WHERE n_chars >= 100),
    canon AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM kept),
    ded AS (SELECT doc_id, lang FROM canon WHERE rn = 1),
    sp AS (
      SELECT lang,
             CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4)
                       < 'e666' THEN 'train'
                  WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4)
                       < 'f333' THEN 'val'
                  ELSE 'test' END AS split
      FROM ded)
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM sp GROUP BY split, lang
    """,
)
def llm_curation_pipeline(spark, sf_dir):
    """End-to-end curation composition in ONE lazy DAG: length filter →
    exact dedup (md5-canonical keep-lowest-id) → deterministic hash
    split → per-(split, lang) counts. The point of the row is
    composability: three catalog operators chain without materialization
    barriers, and Catalyst still pushes the n_chars filter into the scan.
    Thresholds 0.9/0.05 are the hash_split defaults (hex 'e666'/'f333')."""
    from ..operators.curation import hash_split
    from ..operators.dedup import exact_dedup

    d = load_tables(spark, sf_dir)["documents"].where(F.col("n_chars") >= 100)
    keep = exact_dedup(d).select(F.col("keep_id").alias("doc_id"))
    ded = d.join(keep, "doc_id", "left_semi")
    return (
        hash_split(ded)
        .groupBy("split", "lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


@register(
    "llm_domain_kl",
    """
    WITH tok AS (
      SELECT source AS domain,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS token
      FROM documents),
    dc AS (SELECT domain, token, COUNT(*) AS cd FROM tok GROUP BY domain, token),
    cc AS (SELECT token, SUM(cd) AS c FROM dc GROUP BY token),
    dt AS (SELECT domain, SUM(cd) AS td FROM dc GROUP BY domain),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t, CAST(COUNT(*) AS DOUBLE) AS v FROM cc),
    per_term AS (
      SELECT dc.domain, dt.td,
             ((CAST(dc.cd AS DOUBLE) + 1e0) / (CAST(dt.td AS DOUBLE) + (SELECT v FROM tot)))
             * ln(((CAST(dc.cd AS DOUBLE) + 1e0) / (CAST(dt.td AS DOUBLE) + (SELECT v FROM tot)))
                  / ((CAST(cc.c AS DOUBLE) + 1e0) / ((SELECT t FROM tot) + (SELECT v FROM tot)))) AS kl
      FROM dc JOIN cc USING (token) JOIN dt USING (domain))
    SELECT domain, CAST(MIN(td) AS BIGINT) AS n_tokens,
           CAST(ROUND(SUM(kl) * 1e3) AS BIGINT) AS kl_milli
    FROM per_term GROUP BY domain
    """,
)
def llm_domain_kl(spark, sf_dir):
    """Per-source KL divergence from the corpus unigram blend
    (text.domain_kl) — the mixing diagnostic; integer counts through one
    closed-form float expression, milli-rounded like the unigram row."""
    from ..operators.text import domain_kl

    d = load_tables(spark, sf_dir)["documents"]
    return domain_kl(d)


def _bpe_sql(k_rounds: int) -> str:
    """Unrolled BPE training as chained DuckDB CTEs — twin of
    ``text.bpe_train``: per round an adjacent-pair weighted count, a
    (cnt DESC, pair ASC) argmax, and a list_reduce left-fold that
    re-segments the vocabulary with the chosen merge (the lambda reads
    the 1-row b{k} via a cross join). All counts are integers and the
    fold is the same greedy-leftmost contract as the Spark aggregate."""
    parts = [
        "WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+', 0)) AS w FROM documents),",
        "words AS (SELECT w, COUNT(*) AS wc FROM tok GROUP BY w),",
        "seg0 AS MATERIALIZED (SELECT w, wc, string_split(w, '') AS seg FROM words),",
    ]
    for k in range(1, k_rounds + 1):
        p = f"seg{k - 1}"
        parts.append(
            f"p{k} AS (SELECT z[1] AS pa, z[2] AS pb, SUM(wc) AS cnt FROM ("
            f"SELECT wc, unnest(list_zip(seg[1:len(seg)-1], seg[2:len(seg)])) AS z "
            f"FROM {p} WHERE len(seg) > 1) GROUP BY pa, pb),"
        )
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT pa, pb, pa || pb AS merged, cnt FROM p{k} "
            f"ORDER BY cnt DESC, pa ASC, pb ASC LIMIT 1),"
        )
        parts.append(
            f"seg{k} AS MATERIALIZED (SELECT w, wc, "
            f"list_reduce(list_transform(seg, t -> [t]), "
            f"(acc, x) -> CASE WHEN acc[-1] = b{k}.pa AND x[1] = b{k}.pb "
            f"THEN acc[:-2] || [b{k}.merged] ELSE acc || x END) AS seg "
            f"FROM {p}, b{k}),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    selects = [
        f"SELECT CAST({k - 1} AS BIGINT) AS rank, pa AS pair_a, pb AS pair_b, "
        f"merged, CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, k_rounds + 1)
    ]
    parts.append(" UNION ALL ".join(selects))
    return "\n".join(parts)


@register("llm_bpe_train", _bpe_sql(6))
def llm_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training (text.bpe_train): 6 merge rules
    learned from the corpus — the corpus collapses to (word, count) once,
    then every round is vocabulary-sized. Oracle: the unrolled-CTE twin
    with the same integer counts, argmax tie-break, and greedy-leftmost
    fold."""
    from ..operators.text import bpe_train

    d = load_tables(spark, sf_dir)["documents"]
    return bpe_train(d, num_merges=6)


def _bpe_encode_sql(k_rounds: int) -> str:
    """``_bpe_sql``'s CTE chain + a document join against the final
    segmentation: per-doc BPE token count under the learned merges."""
    base = _bpe_sql(k_rounds)
    # strip the trailing merge-table UNION; keep the CTE chain
    chain = base[: base.rindex("SELECT CAST(0 AS BIGINT) AS rank")].rstrip()
    if not chain.endswith(","):
        chain += ","
    return (
        chain
        + f"""
    tok2 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
             '[a-z0-9]+', 0)) AS w FROM documents),
    per_doc AS (
      SELECT t.doc_id, SUM(len(g.seg)) AS n
      FROM tok2 t JOIN seg{k_rounds} g USING (w) GROUP BY t.doc_id)
    SELECT d.doc_id, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_bpe_tokens
    FROM documents d LEFT JOIN per_doc p USING (doc_id)"""
    )


@register("llm_bpe_encode", _bpe_encode_sql(6))
def llm_bpe_encode(spark, sf_dir):
    """Apply the 6-rule BPE merge table back to the corpus
    (text.bpe_token_counts): per-document token budget under the learned
    vocabulary — encoding touches DISTINCT words only, then one vocab
    join per document token."""
    from ..operators.text import bpe_token_counts, bpe_train

    d = load_tables(spark, sf_dir)["documents"]
    return bpe_token_counts(d, bpe_train(d, num_merges=6))


def _semantic_dedup_sql() -> str:
    from .gds_queries import _kmeans_sql

    tail = f"""
    , ea AS (SELECT e.vec_id, e.embedding, f.cluster
             FROM embeddings e JOIN fin f ON f.vec_id = e.vec_id)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_SQL} AS cosine
    FROM ea a JOIN ea b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.35
    """
    return _kmeans_sql(10, 64, 3, tail=tail)


@register("llm_semantic_dedup", _semantic_dedup_sql())
def llm_semantic_dedup(spark, sf_dir):
    """Semantic near-dedup with a LEARNED blocking key: k-means over the
    embedding space (quantized-integer Lloyd — gds.kmeans) assigns each
    document a cluster, and cosine candidate pairs only form inside a
    cluster — the end-to-end unsupervised SemDeDup shape (no
    ground-truth label column anywhere). Still never all-pairs: the
    pair join is an equi-join on the learned cell; the sequential-fold
    cosine keeps the score engine-exact."""
    from ..operators import gds

    e = load_tables(spark, sf_dir)["embeddings"]
    pts = e.select(
        F.col("vec_id").alias("id"),
        F.posexplode("embedding").alias("j", "v"),
    ).select("id", "j", F.col("v").cast("double").alias("v"))
    asg = gds.kmeans(pts, k=10, max_iter=3).withColumnRenamed("id", "vec_id")
    blocked = e.join(asg, "vec_id").withColumnRenamed("cluster", "label2")
    return sim.cosine_neardup_blocked(blocked, threshold=0.35, cell_col="label2")


@register(
    "llm_classifier_filter",
    """
    WITH tok AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE t <> ''),
    w AS (
      SELECT doc_id,
             ((CAST(CONCAT('0x', substr(md5(t), 1, 4)) AS BIGINT) % 256)
              * 2654435761) % 1001 - 500 AS wt
      FROM tok)
    SELECT doc_id, CAST(SUM(wt) - 40 AS BIGINT) AS score,
           SUM(wt) - 40 > 0 AS keep
    FROM w GROUP BY doc_id
    """,
)
def llm_classifier_filter(spark, sf_dir):
    """Linear quality-classifier inference (text.linear_classifier_score):
    hashed bag-of-words buckets, fixed integer weight table, one
    integer-sum per document — the fastText-filter serving shape with
    zero driver-side model state."""
    d = load_tables(spark, sf_dir)["documents"]
    return tx.linear_classifier_score(d)


@register(
    "llm_exact_substring_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[u.i:u.i + 9], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 9)) AS u(i)
      WHERE len(t) >= 10),
    keep AS (SELECT gram FROM grams GROUP BY gram
             HAVING COUNT(*) >= 2 AND COUNT(*) <= 50),
    g AS (SELECT gr.doc_id, gr.gram FROM grams gr JOIN keep k USING (gram))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_grams
    FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
)
def llm_exact_substring_pairs(spark, sf_dir):
    """Exact-substring duplication pairs (curation.exact_substring_pairs):
    10-word-gram doc↔doc equi-join with the stop-gram frequency guard —
    never all-pairs, bounded per-gram fan-out."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return curation.exact_substring_pairs(d, n=10, max_gram_docs=50)


@register(
    "llm_freq_spectrum",
    r"""
    WITH tok AS (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS t FROM documents),
    tf AS (SELECT t, COUNT(*) AS f FROM tok WHERE t <> '' GROUP BY t),
    spec AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tf GROUP BY f)
    SELECT CAST(f AS BIGINT) AS freq, n_tokens FROM spec
    ORDER BY freq DESC LIMIT 20
    """,
)
def llm_freq_spectrum(spark, sf_dir):
    """Token frequency-of-frequency spectrum (the Zipf/Good-Turing
    diagnostic corpus audits start from): two chained integer groupBys —
    token→count then count→count-of-counts — and a top-20 on the
    spectrum, which is tiny by construction."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), " ")).alias("t"))
        .where(F.col("t") != "")
    )
    tf = tok.groupBy("t").agg(F.count("*").alias("f"))
    return (
        tf.groupBy("f")
        .agg(F.count("*").cast("long").alias("n_tokens"))
        .select(F.col("f").cast("long").alias("freq"), "n_tokens")
        .orderBy(F.desc("freq"))
        .limit(20)
    )


def _langid_confusion_sql() -> str:
    """Reuses the llm_language_id prediction CTE and cross-tabs it
    against the gold ``lang`` column — the classifier-evaluation join."""
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             {_sw_sql(tx.STOPWORDS["en"])} AS sw_en,
             {_sw_sql(tx.STOPWORDS["de"])} AS sw_de,
             {_sw_sql(tx.STOPWORDS["es"])} AS sw_es,
             {_sw_sql(tx.STOPWORDS["fr"])} AS sw_fr,
             CAST(len(regexp_extract_all(text, '[\\x{{4E00}}-\\x{{9FFF}}]')) AS BIGINT) AS n_cjk
      FROM documents),
    pred AS (
      SELECT doc_id, lang AS gold,
             CASE WHEN n_cjk > 0 THEN 'zh'
                  WHEN sw_en >= sw_de AND sw_en >= sw_es AND sw_en >= sw_fr THEN 'en'
                  WHEN sw_de >= sw_es AND sw_de >= sw_fr THEN 'de'
                  WHEN sw_es >= sw_fr THEN 'es'
                  ELSE 'fr' END AS pred
      FROM t)
    SELECT gold, pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY gold, pred
    """


@register("llm_langid_confusion", _langid_confusion_sql())
def llm_langid_confusion(spark, sf_dir):
    """Language-ID confusion matrix against the gold ``lang`` column —
    the evaluation cross-tab every classifier in the curation pipeline
    gets audited with: one join of predictions onto gold labels, one
    integer groupBy(gold, pred)."""
    d = load_tables(spark, sf_dir)["documents"]
    pred = tx.language_id(d).select("doc_id", F.col("lang_pred").alias("pred"))
    return (
        d.select("doc_id", F.col("lang").alias("gold"))
        .join(pred, "doc_id")
        .groupBy("gold", "pred")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _leakage_free_split_sql(rounds: int) -> str:
    """Unrolled leakage-free split: duplication pairs → ``rounds``
    min-label WCC rounds → one md5 coin per component. The Spark side
    runs the IDENTICAL bounded round count, so both sides agree even on
    an unconverged pathological duplicate chain — no convergence-luck."""
    parts = [
        r"""WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS t FROM documents),
    grams AS MATERIALIZED (
      SELECT DISTINCT doc_id, array_to_string(t[u.i:u.i + 9], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 9)) AS u(i)
      WHERE len(t) >= 10),
    keep AS MATERIALIZED (SELECT gram FROM grams GROUP BY gram
             HAVING COUNT(*) >= 2 AND COUNT(*) <= 50),
    g AS MATERIALIZED (SELECT gr.doc_id, gr.gram FROM grams gr JOIN keep k USING (gram)),
    pr AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id),
    sym AS MATERIALIZED (SELECT id_a, id_b FROM pr UNION ALL SELECT id_b, id_a FROM pr),
    l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS comp FROM documents),"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT l.id, LEAST(l.comp, COALESCE(m.c, l.comp)) AS comp "
            f"FROM l{k - 1} l LEFT JOIN (SELECT s.id_b AS id, MIN(p.comp) AS c "
            f"FROM l{k - 1} p JOIN sym s ON s.id_a = p.id GROUP BY s.id_b) m "
            f"ON m.id = l.id),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(
        f"""SELECT id AS doc_id, comp AS component,
           CASE WHEN substr(md5('lfsplit' || '|' || CAST(comp AS VARCHAR)), 1, 4)
                     < 'cccc'
                THEN 'train' ELSE 'test' END AS split
    FROM l{rounds}"""
    )
    return "\n".join(parts)


@register("llm_leakage_free_split", _leakage_free_split_sql(8))
def llm_leakage_free_split(spark, sf_dir):
    """Leakage-free split (curation.leakage_free_split): documents
    sharing a 10-gram form duplicate components (min-label WCC over the
    pair graph) and each component lands on ONE side via a single md5
    coin on its canonical id — no near-duplicate ever straddles
    train/test. Both sides run the identical 8 bounded min-label rounds
    (``_leakage_free_split_sql``)."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return curation.leakage_free_split(d, n=10, max_gram_docs=50, wcc_rounds=8)


@register(
    "llm_gopher_rules",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS words,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> x != '') AS lines,
             CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_symbols
      FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(words,
                    x -> CAST(length(x) AS BIGINT))), 0) AS BIGINT) AS sum_len,
             n_symbols,
             CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
               AS BIGINT) AS n_alpha,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines, x -> regexp_matches(x, '^[-*•]')))
               AS BIGINT) AS n_bullet,
             CAST(len(list_filter(lines, x -> regexp_matches(x, '(\.\.\.|…)$')))
               AS BIGINT) AS n_ell,
             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                    s -> list_contains(list_transform(words, w2 -> lower(w2)), s)))
               AS BIGINT) AS n_required_stopwords
      FROM w)
    SELECT doc_id, n_words,
           CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE)
                ELSE 0.0 END AS mean_word_len,
           CASE WHEN n_words > 0 THEN CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE)
                ELSE 0.0 END AS symbol_ratio,
           CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
                ELSE 0.0 END AS alpha_frac,
           CASE WHEN n_lines > 0 THEN CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE)
                ELSE 0.0 END AS bullet_frac,
           CASE WHEN n_lines > 0 THEN CAST(n_ell AS DOUBLE) / CAST(n_lines AS DOUBLE)
                ELSE 0.0 END AS ellipsis_frac,
           n_required_stopwords,
           (n_words >= 50 AND n_words <= 100000
            AND (CASE WHEN n_words > 0
                      THEN CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE)
                      ELSE 0.0 END) >= 3.0
            AND (CASE WHEN n_words > 0
                      THEN CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE)
                      ELSE 0.0 END) <= 10.0
            AND (CASE WHEN n_words > 0
                      THEN CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE)
                      ELSE 0.0 END) <= 0.1
            AND (CASE WHEN n_lines > 0
                      THEN CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE)
                      ELSE 0.0 END) <= 0.9
            AND (CASE WHEN n_lines > 0
                      THEN CAST(n_ell AS DOUBLE) / CAST(n_lines AS DOUBLE)
                      ELSE 0.0 END) <= 0.3
            AND (CASE WHEN n_words > 0
                      THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
                      ELSE 0.0 END) >= 0.8
            AND n_required_stopwords >= 2) AS keep
    FROM s ORDER BY doc_id
    """,
)
def llm_gopher_rules(spark, sf_dir):
    """Full Gopher quality-rule suite (text.gopher_rules — Rae et al.
    2021 Appendix A1.1, public): word-count bounds, mean word length,
    symbol ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction, required-stopword rule, and the conjunction ``keep`` flag.
    Map-only HOF arithmetic; every ratio an exact BIGINT/BIGINT→DOUBLE
    division, so the threshold comparisons agree across engines."""
    d = load_tables(spark, sf_dir)["documents"]
    return tx.gopher_rules(d).orderBy("doc_id")


@register(
    "llm_ngram_jaccard_pairs",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents),
    g0 AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) - 2 > 0
             THEN list_transform(generate_series(1, len(toks) - 2),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))
             ELSE [] END) AS gram
      FROM t),
    g1 AS (SELECT DISTINCT doc_id, gram FROM g0),
    keep AS (SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM g1 GROUP BY gram)
             WHERE c <= 200),
    g AS (SELECT g1.doc_id, g1.gram FROM g1 JOIN keep USING (gram)),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared_ngrams
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, shared_ngrams,
           CAST(shared_ngrams AS DOUBLE)
             / CAST(sa.sz + sb.sz - shared_ngrams AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(shared_ngrams AS DOUBLE)
            / CAST(sa.sz + sb.sz - shared_ngrams AS DOUBLE) >= 0.2
    ORDER BY id_a, id_b
    """,
)
def llm_ngram_jaccard_pairs(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs at θ=0.2
    (dedup.ngram_jaccard_pairs): distinct-gram equi-join with the
    stop-gram doc-frequency guard, exact set Jaccard — the ground truth
    the MinHash/SimHash recall tests approximate. At sf0.01 this is
    exactly the 25 planted near-duplicate pairs."""
    d = load_tables(spark, sf_dir)["documents"]
    return dd.ngram_jaccard_pairs(d, n=3, threshold=0.2, max_gram_docs=200).orderBy(
        "id_a", "id_b"
    )


@register(
    "llm_deterministic_shuffle",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5('shuffle-v1' || '|' || CAST(doc_id AS VARCHAR)),
                      doc_id) AS BIGINT) AS shuffle_rank
    FROM documents ORDER BY doc_id
    """,
)
def llm_deterministic_shuffle(spark, sf_dir):
    """Deterministic training-order shuffle (curation.deterministic_shuffle):
    exact global position under the md5(salt|key) order — reproducible
    'randomness' with no single-task window (range repartition +
    broadcast offsets)."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return curation.deterministic_shuffle(d).select("doc_id", "shuffle_rank").orderBy(
        "doc_id"
    )


@register(
    "llm_boilerplate_removal",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      FROM documents),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(list_slice(ws, CAST(i*8+1 AS BIGINT),
                                        CAST((i+1)*8 AS BIGINT)), ' ') AS seg
      FROM toks, unnest(range(0, CAST(ceil(len(ws)/8.0) AS BIGINT))) AS t(i)),
    bp AS (
      SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
    flag AS (
      SELECT s.doc_id, s.seg_idx, s.seg, (b.seg IS NOT NULL) AS is_bp
      FROM segs s LEFT JOIN bp b USING (seg)),
    docs AS (
      SELECT doc_id,
             count(*) AS n_segments,
             CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boilerplate,
             coalesce(array_to_string(
               list(seg ORDER BY seg_idx) FILTER (WHERE NOT is_bp), ' '), '')
               AS cleaned_text
      FROM flag GROUP BY doc_id)
    SELECT doc_id, n_segments, n_boilerplate, cleaned_text,
           CAST(CASE WHEN cleaned_text = '' THEN 0
                ELSE len(regexp_split_to_array(cleaned_text, '\s+')) END
                AS BIGINT) AS retained_words
    FROM docs
    """,
)
def llm_boilerplate_removal(spark, sf_dir):
    """CCNet/RefinedWeb-style boilerplate removal: 8-word segments
    recurring verbatim in ≥2 distinct documents are template boilerplate
    and are cut; each document is rebuilt from its surviving segments.
    Keyed shuffles only (segment-df groupBy, pre-filtered equi-join,
    per-doc reassembly) — no all-pairs stage at any scale."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    return curation.remove_boilerplate(
        d, segment_tokens=8, min_doc_freq=2
    ).orderBy("doc_id")


@register(
    "llm_token_budget_selection",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             CASE WHEN len({_TOKS}) = 0 THEN 0.0
                  ELSE CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS})
             END AS ttr
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens, ttr,
             SUM(n_tokens) OVER (ORDER BY ttr DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, n_tokens, ttr, CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= 10000 ORDER BY cum_tokens
    """,
)
def llm_token_budget_selection(spark, sf_dir):
    """Data selection under a token budget: rank documents by type-token
    ratio (desc, doc_id tiebreak) and keep the prefix whose running token
    total fits 10k tokens — `curation.select_by_budget`, the exact
    distributed prefix sum (range repartition + broadcast offsets; no
    single-task window). The oracle is the same greedy prefix as one
    ordered window cumsum."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"]
    toks = tx.tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(F.size(toks) == 0, F.lit(0.0))
        .otherwise(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        )
        .alias("ttr"),
    )
    out = curation.select_by_budget(
        scored, "n_tokens", [F.desc("ttr"), F.asc("doc_id")], 10_000
    )
    return out.select("doc_id", "n_tokens", "ttr", "cum_tokens").orderBy("cum_tokens")


@register(
    "llm_temperature_resample",
    """
    WITH doms AS (
      SELECT doc_id,
             CASE WHEN doc_id % 8 < 4 THEN 'web'
                  WHEN doc_id % 8 < 6 THEN 'books'
                  WHEN doc_id % 8 = 6 THEN 'code'
                  ELSE 'wiki' END AS domain
      FROM documents),
    c AS (SELECT domain, COUNT(*) AS n FROM doms GROUP BY domain),
    z AS (SELECT SUM(POW(n, 0.5)) AS z FROM c),
    f AS (SELECT domain, n,
                 LEAST(1.0, (POW(n, 0.5) / z.z) * 250 / n) AS frac
          FROM c, z),
    thr AS (SELECT domain, n,
                   CASE WHEN round_even(frac * 65536, 0) >= 65536 THEN 'g'
                        ELSE printf('%04x',
                               CAST(round_even(frac * 65536, 0) AS BIGINT))
                   END AS t
            FROM f),
    kept AS (
      SELECT d.domain, COUNT(*) AS kept
      FROM doms d JOIN thr ON thr.domain = d.domain
      WHERE substr(md5('strat' || CAST(d.doc_id AS VARCHAR)), 1, 4) < thr.t
      GROUP BY d.domain)
    SELECT c.domain, CAST(c.n AS BIGINT) AS n_docs,
           CAST(COALESCE(k.kept, 0) AS BIGINT) AS kept
    FROM c LEFT JOIN kept k USING (domain) ORDER BY c.domain
    """,
)
def llm_temperature_resample(spark, sf_dir):
    """Temperature-balanced corpus materialization: skewed synthetic
    domains (web 4/8, books 2/8, code 1/8, wiki 1/8 of docs by id), T=0.5
    mixture shares from mixing_weights, per-domain keep fraction
    min(1, w·250/n) applied by the deterministic md5 sampler — small
    domains keep a HIGHER fraction (the up-sampling the mixture exists
    for). Oracle replays the share → hex-threshold → md5-bucket chain,
    including hex_thr's banker's rounding (round_even)."""
    from ..operators import curation

    d = load_tables(spark, sf_dir)["documents"].withColumn(
        "domain",
        F.when(F.col("doc_id") % 8 < 4, "web")
        .when(F.col("doc_id") % 8 < 6, "books")
        .when(F.col("doc_id") % 8 == 6, "code")
        .otherwise("wiki"),
    )
    kept = curation.temperature_resample(
        d, domain_col="domain", key_col="doc_id", temperature=0.5, budget=250
    )
    totals = d.groupBy("domain").agg(F.count("*").cast("long").alias("n_docs"))
    kc = kept.groupBy("domain").agg(F.count("*").cast("long").alias("kept"))
    return (
        totals.join(kc, "domain", "left")
        .select("domain", "n_docs", F.coalesce("kept", F.lit(0)).cast("long").alias("kept"))
        .orderBy("domain")
    )
