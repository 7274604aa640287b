"""Plan-shape regression tests: the physical plans the engine is designed
to produce must survive code evolution (pushdown, pruning, broadcast,
no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from docker_neo4j_spark.plans.audit import (
    assert_columns_pruned,
    assert_no_cartesian,
    audit,
)


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_q1_scan_prunes_to_needed_columns(spark, sf_dir, queries):
    df = queries["agg_q1_pricing_summary"](spark, sf_dir)
    # lineitem has 16 columns; Q1 needs 6
    assert_columns_pruned(df, {"l_returnflag": 6})
    facts = audit(df)
    assert facts.n_cartesian == 0
    assert facts.n_exchanges == 1  # partial agg map-side, one shuffle, final agg


def test_two_hop_uses_broadcast_joins_and_prunes(spark, sf_dir, queries):
    df = queries["expand_two_hop"](spark, sf_dir)
    facts = audit(df)
    assert facts.n_broadcast_joins >= 3  # all pattern joins broadcastable at test SF
    assert facts.n_cartesian == 0
    # the rel-id window (lineitem shuffle) must stay pruned out of expands
    assert "Window" not in facts.text


def test_property_filter_pushes_down(spark, sf_dir, queries):
    df = queries["property_lookup"](spark, sf_dir)
    facts = audit(df)
    assert any("IsNotNull" in p or "EqualTo" in p for p in facts.pushed_filters), (
        "property filter did not reach the parquet scan"
    )


def test_brute_force_topk_broadcasts_query_side(spark, sf_dir):
    from docker_neo4j_spark.operators.similarity import brute_force_topk
    from docker_neo4j_spark.sources.tpch import load_tables

    e = load_tables(spark, sf_dir)["embeddings"]
    df = brute_force_topk(e, e.where(F.col("vec_id") < 5), k=3)
    facts = audit(df)
    # the query side is an explicit broadcast: the pair join must not be a
    # shuffle join (nested-loop on the != predicate over a broadcast is fine)
    assert facts.n_sort_merge_joins == 0


def test_exact_dedup_single_shuffle(spark, sf_dir):
    from docker_neo4j_spark.operators.dedup import exact_dedup
    from docker_neo4j_spark.sources.tpch import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    facts = audit(exact_dedup(d))
    assert facts.n_exchanges == 1  # one hash shuffle on the digest, nothing else


def test_token_counts_reads_two_columns(spark, sf_dir):
    from docker_neo4j_spark.operators.text import token_counts
    from docker_neo4j_spark.plans.audit import assert_columns_pruned
    from docker_neo4j_spark.sources.tpch import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    assert_columns_pruned(token_counts(d), {"documents": 2})


def test_simhash_neardup_no_cartesian(spark, sf_dir):
    from docker_neo4j_spark.operators import dedup as dd
    from docker_neo4j_spark.plans.audit import assert_no_cartesian
    from docker_neo4j_spark.sources.tpch import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    assert_no_cartesian(dd.simhash_neardup(d))


def test_hash_split_is_map_only(spark, sf_dir):
    """hash_split must add zero exchanges — a pure map over the scan."""
    from docker_neo4j_spark.operators.curation import hash_split
    from docker_neo4j_spark.sources.tpch import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    facts = audit(hash_split(d))
    assert facts.n_exchanges == 0
    assert facts.n_cartesian == 0


def test_pack_sequences_one_shuffle_per_shard_window(spark, sf_dir):
    """pack_sequences: exactly one exchange (hash by shard) feeding the
    window — no global single-partition sort."""
    from docker_neo4j_spark.operators.curation import pack_sequences
    from docker_neo4j_spark.operators.text import token_counts
    from docker_neo4j_spark.sources.tpch import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    toks = token_counts(d).select("doc_id", F.col("n_ws_tokens").alias("n_tokens"))
    facts = audit(pack_sequences(toks, budget=512, num_shards=8))
    assert facts.n_exchanges == 1
    # hash-partitioned by shard, NOT a global range/single partition
    assert "hashpartitioning" in facts.text.lower()
    assert "singlepartition" not in facts.text.lower()
