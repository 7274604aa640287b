"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the training-data-pipeline brief:

- **Brute-force cosine top-k** — the exact baseline. Query set × corpus
  join with a JVM-side dot product (``zip_with`` + ``aggregate``), then a
  per-query window top-k. At scale the *query side* is the small side:
  broadcast it, stream the corpus partition-parallel, and the only shuffle
  is the final top-k (bounded at k rows per query by a partial
  ``min_by``-style pre-aggregation inside each partition via the window).
- **LSH-bucketed ANN** — random-hyperplane (sign-bit) bucketing. Each
  vector maps to a ``2^n_planes``-way bucket id (map-only); queries probe
  their own bucket (plus optional Hamming-1 neighbors), so the join is an
  equi-join on bucket id — never all-pairs. Recall is tested against the
  brute-force baseline in pytest.

Hyperplanes are generated deterministically from a seed via xxhash64 —
no RNG state, reproducible across runs/engines.

No Python UDFs anywhere; the dot product stays in codegen. An
Arrow-batched ``pandas_udf`` embedding *encoder* stub lives in
``multimodal.py`` (the real model is out-of-container by design).
"""

from __future__ import annotations
from ..localframe import local_df

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank).

    ``queries`` is broadcast (the small side); ties break on neighbor id so
    the result is total-ordered and oracle-comparable.
    """
    # Norms are per-row, not per-pair: compute once on each side before the
    # join (identical IEEE result, |Q|+|C| folds instead of 2·|Q|·|C|).
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            l2_norm(F.col(vec_col)).alias("_qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("_qv"), F.col("_cv"))
            / F.greatest(F.col("_qn") * F.col("_cn"), F.lit(1e-12))
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell (the 100 TB path
    when an inverted-file/centroid assignment exists).

    ``cell_col`` is the coarse-quantizer assignment (here the precomputed
    cluster id; in production the argmin-centroid of a trained codebook).
    The join is an equi-join on (cell), so cost is Σ_cell |Q_cell|·|C_cell|
    instead of |Q|·|C|. Deterministic given the assignment — exact within
    the probed cell.
    """
    c = corpus.select(
        F.col(cell_col).alias("_cell"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    q = queries.select(
        F.col(cell_col).alias("_cell"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        q.join(c, "_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("_qv"), F.col("_cv"))
                / F.greatest(F.col("_qn") * F.col("_cn"), F.lit(1e-12))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def cosine_neardup_blocked(
    df: DataFrame,
    threshold: float,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking cell —
    the embedding-space analog of MinHash near-dup: candidates only form
    inside a block (equi-join on the cell), never all-pairs."""
    s = df.select(
        F.col(cell_col).alias("_cell"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    a = s.select(F.col("_cell"), F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = s.select(F.col("_cell"), F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    return (
        a.join(b, "_cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("_va"), F.col("_vb"))
                / F.greatest(F.col("_na") * F.col("_nb"), F.lit(1e-12))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def ivf_build(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Train a KMeans coarse quantizer and assign every corpus vector to a
    cell — the inverted-file build step behind ``ivf_topk``'s assumed cell
    column. Returns (assigned corpus with ``_cell``, centroids frame
    (_cell, _centroid)).

    Scale: the codebook is n_cells×dim floats (driver-tiny, broadcast to
    searches); assignment is one ``model.transform`` map pass; the
    assigned frame is what you'd write back to parquet partitioned by
    cell.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = corpus.select(
        id_col,
        vec_col,
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    model = KMeans(
        k=n_cells, seed=seed, maxIter=20, featuresCol="_v", predictionCol="_cell"
    ).fit(v)
    assigned = model.transform(v).select(
        id_col, vec_col, F.col("_cell").cast("long").alias("_cell")
    )
    spark = corpus.sparkSession
    centroids = local_df(spark, 
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "_cell long, _centroid array<double>",
    )
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN over a trained inverted file: each query probes its ``nprobe``
    nearest cells (ranked by centroid distance against the broadcast
    codebook), then exact cosine within the probed cells — cost
    Σ_probed |cell|, never |Q|·|C|."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    d = F.col("_qv").cast("array<double>")
    dist2 = F.aggregate(
        F.zip_with(d, F.col("_centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("_d2"), F.asc("_cell"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "_qv", "_qn", "_cell", dist2.alias("_d2"))
        .withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= nprobe)
        .select("query_id", "_qv", "_qn", "_cell")
    )
    c = assigned.select(
        "_cell",
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        probes.join(c, "_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("_qv"), F.col("_cv"))
                / F.greatest(F.col("_qn") * F.col("_cn"), F.lit(1e-12))
            ).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim")
    )


def hyperplane_values(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane components (splitmix64-style
    mix in Python). Exposed as plain floats so the DuckDB oracle can embed
    the IDENTICAL literals — one source of truth for impl and oracle."""

    def mix(x: int) -> float:
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        return (x % 10_000_001) / 5_000_000.0 - 1.0

    return [mix((seed << 32) ^ (plane << 16) ^ j) for j in range(dim)]


def _hyperplane(dim: int, plane: int, seed: int = 42) -> Column:
    """Hyperplane as a flat literal-double array expression (no
    per-component hash chain inside the plan).

    Built as ONE parsed SQL string instead of ``F.array(*[F.lit(v) …])``:
    the per-component form cost 65 py4j round-trips per plane — ~1.5 k
    driver calls per ann_topk side before Spark saw the query (r14, guide
    §7.3 driver-side cost). ``repr(float)`` round-trips exactly and the
    ``D`` suffix makes each component a SQL double, so the parsed literal
    array is bit-identical to the old one."""
    vals = ", ".join(f"{v!r}D" for v in hyperplane_values(dim, plane, seed))
    return F.expr(f"array({vals})")


def _dot_sql(a: str, b: str) -> str:
    """SQL-text form of ``dot`` — same casts, same sequential fold order,
    so the computed values are bit-identical. Exists because each
    ``zip_with``/``aggregate`` lambda costs ~30 ms of py4j round-trips to
    construct (guide §7.3 driver cost); one parsed string is ~free."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def _bucket_sql(vec: str, dim: int, n_planes: int, seed: int, table: int) -> str:
    """SQL-text form of ``ann_topk``'s per-table bucket id (lsh_bucket +
    table offset): the same CASE/shiftleft/| /+ chain the Column DSL
    built, parsed in ONE ``F.expr`` instead of ~6 HOF lambdas per table
    per side (measured r14: the DSL form cost ~2.5 s of driver build per
    bench pass at n_tables=4)."""
    tseed = seed + 7919 * table
    code = None
    for p in range(n_planes):
        vals = ", ".join(f"{v!r}D" for v in hyperplane_values(dim, p, tseed))
        d = _dot_sql(vec, f"array({vals})")
        bit = (
            f"(CASE WHEN {d} >= 0 THEN shiftleft(CAST(1 AS BIGINT), {p}) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
        code = bit if code is None else f"({code} | {bit})"
    return f"({code} + CAST({table << n_planes} AS BIGINT))"


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id: n_planes sign bits packed to a long."""
    bits = [
        F.when(dot(vec, _hyperplane(dim, p, seed)) >= 0, F.shiftleft(F.lit(1).cast("long"), p))
        .otherwise(F.lit(0).cast("long"))
        for p in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via multi-table LSH bucket equi-join (the 100 TB path).

    ``n_tables`` independent hyperplane sets; each vector lands in one
    bucket per table (corpus side = map-only ``n_tables``-way explode),
    each query probes its own bucket plus all Hamming-1 neighbors per
    table. Candidates are the union across tables — the standard
    recall-vs-cost dial. The join shuffles on bucket id only; there is no
    all-pairs path anywhere.
    """

    def bucket(vec_sql: str, table: int) -> Column:
        # Global bucket id = table << n_planes | sign-bit code — built as
        # ONE parsed SQL string (see _bucket_sql; the Column-DSL form via
        # lsh_bucket cost ~2.5 s/pass of py4j lambda construction).
        return F.expr(_bucket_sql(vec_sql, dim, n_planes, seed, table))

    vec_sql = f"`{vec_col}`"
    # Materialize per-table bucket ids ONCE (a probe fan-out referencing the
    # bucket expression directly would recompute every hyperplane dot
    # product n_planes+1 times — no CSE across the explode).
    bcols = [f"_b{t}" for t in range(n_tables)]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.expr(f"sqrt({_dot_sql(vec_sql, vec_sql)})").alias("_cn"),
        *[bucket(vec_sql, t).alias(bc) for t, bc in enumerate(bcols)],
    ).select(
        "neighbor_id", "_cv", "_cn", F.explode(F.array(*bcols)).alias("bucket")
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.expr(f"sqrt({_dot_sql(vec_sql, vec_sql)})").alias("_qn"),
        *[bucket(vec_sql, t).alias(bc) for t, bc in enumerate(bcols)],
    )
    probes = []
    for bc in bcols:
        probes.append(F.col(bc))
        probes += [F.col(bc).bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(n_planes)]
    q = qb.select(
        "query_id", "_qv", "_qn", F.explode(F.array(*probes)).alias("bucket")
    )
    # Score INSIDE the join pipeline (before any shuffle), then dedupe
    # multi-table hits on the (query, neighbor, sim) scalar triple — a
    # dropDuplicates on the raw candidate rows would shuffle both full
    # embedding vectors (~40× more bytes) per candidate instead.
    # The PROBE side is broadcast explicitly (r14, guide §3.1): the query
    # set is the bounded side by contract, while stats-blind planning was
    # observed broadcasting the exploded CORPUS (vectors × n_tables) —
    # a driver collect of the whole corpus, and a scale-killer at 100 TB.
    scored = (
        F.broadcast(q).join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.expr(_dot_sql("_qv", "_cv"))
                / F.greatest(F.col("_qn") * F.col("_cn"), F.lit(1e-12))
            ).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim")
    )
