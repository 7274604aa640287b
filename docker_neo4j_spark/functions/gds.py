"""GDS scalar similarity functions (``gds.similarity.*`` — the
RETURN-position function surface of the plugin the reference bundles,
calver/coredb/neo4j-plugins.json:24-30).

All pure JVM fold expressions over array columns — ``zip_with`` +
sequential ``aggregate`` — so the arithmetic order is deterministic and
identical to a sequential SQL fold (the property the oracle row
``fn_gds_similarity_suite`` relies on). No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _fold_sum(arr: Column) -> Column:
    """Sequential left fold Σ — same order as DuckDB list_reduce."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def cosine(a, b) -> Column:
    """gds.similarity.cosine — dot/(‖a‖·‖b‖), 0-guarded denominator."""
    ca, cb = _c(a), _c(b)
    denom = F.sqrt(_dot(ca, ca)) * F.sqrt(_dot(cb, cb))
    return _dot(ca, cb) / F.greatest(denom, F.lit(1e-12))


def euclidean_distance(a, b) -> Column:
    """gds.similarity.euclideanDistance — L2 norm of the difference."""
    ca, cb = _c(a), _c(b)
    diff = F.zip_with(
        ca, cb, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(_fold_sum(diff))


def euclidean(a, b) -> Column:
    """gds.similarity.euclidean — similarity form 1/(1+distance)."""
    return F.lit(1.0) / (F.lit(1.0) + euclidean_distance(a, b))


def jaccard(a, b) -> Column:
    """gds.similarity.jaccard — |A∩B| / |A∪B| over the DISTINCT elements."""
    ca, cb = _c(a), _c(b)
    inter = F.size(F.array_intersect(ca, cb)).cast("double")
    union = F.size(F.array_union(ca, cb)).cast("double")
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def overlap(a, b) -> Column:
    """gds.similarity.overlap — |A∩B| / min(|A|,|B|) over distinct sets."""
    ca, cb = _c(a), _c(b)
    inter = F.size(F.array_intersect(ca, cb)).cast("double")
    mn = F.least(
        F.size(F.array_distinct(ca)), F.size(F.array_distinct(cb))
    ).cast("double")
    return F.when(mn == 0, F.lit(1.0)).otherwise(inter / mn)


def pearson(a, b) -> Column:
    """gds.similarity.pearson — Pearson correlation of two equal-length
    vectors via the single-pass sums formula, every fold sequential so
    the fp result replays engine-exactly:
    (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²))."""
    ca, cb = _c(a), _c(b)
    n = F.size(ca).cast("double")
    dot = _dot(ca, cb)
    sx = _fold_sum(F.transform(ca, lambda x: x.cast("double")))
    sy = _fold_sum(F.transform(cb, lambda x: x.cast("double")))
    sxx = _dot(ca, ca)
    syy = _dot(cb, cb)
    num = n * dot - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    # Zero-variance (constant) vector ⇒ correlation undefined: NULL, not
    # the enormous spurious value a clamped denominator would produce.
    return F.when(den == 0, F.lit(None).cast("double")).otherwise(num / den)
