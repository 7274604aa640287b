"""Skew mitigation: salted joins for hot keys (SURVEY.md §4.2).

AQE's skew-join split handles sort-merge skew automatically when
statistics surface it; salting is the explicit, deterministic fallback
for the worst case — a broadcast-sized dimension joined to a fact table
where a handful of keys dominate (the power-law shape of web corpora:
one domain = 10% of documents).

Mechanics: the fact side gets a deterministic salt in [0, n) derived by
hashing a unique column (never ``rand()`` — re-evaluation under retries
would re-salt rows and duplicate/lose matches); the dimension side is
replicated n× with every salt value. The join key becomes (key, salt),
splitting each hot key's rows across n tasks. Replication cost is
n × |dim| — only ever salt the side that is small enough to replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with the hot-key rows of
    ``fact`` spread across ``n_salts`` partitions.

    ``salt_from`` is a fact column with high cardinality (a unique id is
    ideal); the salt is ``pmod(xxhash64(salt_from), n_salts)`` —
    deterministic under task retries. ``dim`` is replicated ``n_salts``×
    (explode over the salt range), so keep it the small side. Result
    columns = fact columns then dim columns (minus its join key).
    """
    f = fact.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)))
    d = dim.withColumn(
        "_dsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    ).withColumnRenamed(key, "_dkey")
    out = f.join(
        d, (F.col(key) == F.col("_dkey")) & (F.col("_salt") == F.col("_dsalt")), how
    )
    return out.drop("_salt", "_dsalt", "_dkey")
