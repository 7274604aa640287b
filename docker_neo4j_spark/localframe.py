"""Driver-side row lists → JVM LocalRelation via a pyarrow Table.

``spark.createDataFrame(list_of_rows)`` parallelizes the list into a
Python RDD, so the resulting frame plans as ``Scan ExistingRDD``
(``applySchemaToPythonRDD``) — EVERY downstream job evaluation of that
frame forks a Python worker to re-serve the rows.  On sandboxed or
throttled hosts a single one-row collect through that path measures
4–6 s; the interactive Cypher write path (small CREATE batches unioned
onto the store) compounds it into minutes (the r10 dog-corpus smoke
corpus took 133 s for a one-row CREATE…RETURN even after its join plan
was fixed).

Routing the same rows through ``pyarrow.Table`` makes Spark build a
``LocalTableScan`` (a JVM LocalRelation): the data ships to the JVM
once at creation and every evaluation is pure JVM — measured 0.05 s
for the same collect, and Catalyst can constant-fold / broadcast a
LocalRelation far more aggressively than an opaque Python RDD scan.

``local_df`` is a drop-in for the ``createDataFrame(rows, ddl_or_
StructType)`` shapes this package uses.  It falls back to the classic
path whenever the arrow conversion could diverge from classic
semantics (schema-less rows containing dicts/Decimals/datetimes,
TimestampNTZ fields, non-struct schemas, conversion errors), so
behavior is identical by construction — only the physical plan of the
happy path changes.

Scale note: this is for SMALL driver-side control-plane lists (write
batches, SHOW results, procedure outputs).  Bulk data always comes
from parquet scans; nothing here changes that path.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Any, Iterable

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import StructType, TimestampNTZType


def _arrow_frame(spark: SparkSession, rows: list, schema) -> DataFrame:
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    st: StructType | None = None
    if isinstance(schema, str):
        st = StructType.fromDDL(schema)
    elif isinstance(schema, StructType):
        st = schema
    elif schema is not None:
        raise TypeError("non-struct schema: classic path")

    if st is not None:
        if any(isinstance(f.dataType, TimestampNTZType) for f in st.fields):
            # arrow round-trips NTZ to a tz-ful timestamp — schema drift
            raise TypeError("timestamp_ntz: classic path")
        names = st.names
        norm = []
        for r in rows:
            if isinstance(r, Row):
                norm.append(r.asDict(recursive=True))
            elif isinstance(r, dict):
                norm.append(r)
            elif isinstance(r, (tuple, list)):
                norm.append(dict(zip(names, r)))
            else:
                raise TypeError("scalar rows: classic path")
        table = pa.Table.from_pylist(
            [{n: d.get(n) for n in names} for d in norm],
            schema=to_arrow_schema(st),
        )
    else:
        if not rows:
            raise ValueError("empty rows without schema")
        norm = []
        for r in rows:
            if isinstance(r, Row):
                r = r.asDict(recursive=True)
            if not isinstance(r, dict):
                raise TypeError("schema-less inference needs dict rows")
            norm.append(r)
        for d in norm:
            for v in d.values():
                # classic inference maps dict→MapType (arrow: struct),
                # Decimal→decimal(38,18) (arrow: native precision),
                # datetime→TimestampType (arrow: NTZ) — divergent, punt
                if isinstance(v, (dict, decimal.Decimal, datetime.datetime)):
                    raise TypeError("inference-divergent value: classic path")
        table = pa.Table.from_pylist(norm)
    return spark.createDataFrame(table)


def local_df(spark: SparkSession, data: Iterable[Any], schema=None) -> DataFrame:
    """``spark.createDataFrame(data, schema)`` that plans as a JVM
    LocalRelation (``LocalTableScan``) instead of a Python-RDD scan.
    Semantics-preserving: any shape the arrow route can't represent
    identically falls back to the classic builder."""
    if isinstance(data, DataFrame):
        return data
    rows = data if isinstance(data, list) else list(data)
    try:
        return _arrow_frame(spark, rows, schema)
    except Exception:
        if schema is not None:
            return spark.createDataFrame(rows, schema)
        return spark.createDataFrame(rows)
