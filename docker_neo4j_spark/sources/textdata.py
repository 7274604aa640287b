"""Text-corpus sources/sinks: JSONL (the training-data interchange format).

The reference's import surface is CSV (`/import` mount,
docker-entrypoint.sh:502-505) and dump files; a training-data pipeline's
lingua franca is JSON-Lines. Spark reads both natively — the value here
is the contract: explicit schema (no inference scan at 100 TB), partition
parallelism preserved, and a sink that round-trips losslessly.

Scale notes: ``spark.read.json`` with an explicit schema is a single
streaming pass (schema inference would read the data twice); output is
written with one file per partition — repartition before writing to
control file count, never coalesce(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read a JSON-Lines corpus. Pass ``schema`` in production — inference
    costs an extra full scan and can mistype sparse fields."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a frame as JSON-Lines (one object per line, per-partition
    files — the layout every training-data loader shards on)."""
    df.write.mode(mode).json(path)


def export_graph_csv(graph, path: str) -> None:
    """``apoc.export.csv.all`` analog: nodes and rels as CSV directories
    (``<path>/nodes``, ``<path>/rels``). Array columns (labels) are
    joined with ``;`` — the neo4j-admin import list delimiter."""
    def csv_safe(df: DataFrame) -> DataFrame:
        for c, t in df.dtypes:
            if t.startswith("array"):
                df = df.withColumn(c, F.array_join(F.col(c).cast("array<string>"), ";"))
            elif t in ("void", "null"):  # null-padded schema-union columns
                df = df.withColumn(c, F.col(c).cast("string"))
        return df

    csv_safe(graph.nodes).write.mode("overwrite").option("header", True).csv(f"{path}/nodes")
    csv_safe(graph.rels).write.mode("overwrite").option("header", True).csv(f"{path}/rels")
