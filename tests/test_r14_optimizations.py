"""r14 optimization-round internals: the fused BSP supersteps release
superseded state frames (r14 rewrote the release logic to "one round
behind" around lazy checkpoints — a leak here regresses the O(1)-frames
memory contract that matters at the 100 TB target).

Each kernel may leave its RETURNED frame (and nothing else) pinned: the
result is a localCheckpoint whose blocks the caller still reads. The
pre-r14 code pinned O(rounds) frames in several kernels (LPA, topological
layers, min-label, k-core, Louvain kept every round's state alive)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_neo4j_spark.operators import gds
from docker_neo4j_spark.operators.text import bpe_train


def _pinned(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def _pinned_settled(spark, limit: int, timeout: float = 15.0) -> int:
    """Block-removal is asynchronous (Dataset.unpersist and RDD.unpersist
    are non-blocking by default), so under load the registry can lag the
    release calls — poll until it settles or the timeout expires."""
    import time

    deadline = time.time() + timeout
    n = _pinned(spark)
    while n > limit and time.time() < deadline:
        time.sleep(0.25)
        n = _pinned(spark)
    return n


def _clear(spark) -> None:
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def _edges(spark, pairs, weights=None):
    if weights is None:
        return spark.createDataFrame(pairs, ["src", "dst"])
    return spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(pairs, weights)], ["src", "dst", "weight"]
    )


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["id"])


# a graph with enough rounds to expose per-round leaks: two 4-cliques
# joined by a path tail (BFS/label depth > 3)
_PAIRS = (
    [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    + [(4, 6), (6, 7), (7, 8), (8, 10)]
)
_IDS = list(range(1, 5)) + [6, 7, 8] + list(range(10, 14))


@pytest.mark.parametrize(
    "run",
    [
        pytest.param(
            lambda s, e, n: gds.pagerank(e, n, iterations=4), id="pagerank"
        ),
        pytest.param(
            lambda s, e, n: gds.personalized_pagerank(
                e, _nodes(s, [1]), n, iterations=4
            ),
            id="personalized",
        ),
        pytest.param(lambda s, e, n: gds.wcc(e, n), id="wcc"),
        pytest.param(
            lambda s, e, n: gds.sssp(
                _edges(s, _PAIRS, weights=[1.0] * len(_PAIRS)), _nodes(s, [1])
            ),
            id="sssp",
        ),
        pytest.param(
            lambda s, e, n: gds.label_propagation(e, n, max_iter=4), id="lpa"
        ),
        pytest.param(
            lambda s, e, n: gds.topological_layers(
                _edges(s, [(1, 2), (2, 3), (3, 4), (1, 4)]), _nodes(s, [1, 2, 3, 4])
            ),
            id="topological",
        ),
        pytest.param(lambda s, e, n: gds.kcore(e, k=3), id="kcore"),
        pytest.param(lambda s, e, n: gds.louvain(e, n, max_iter=4), id="louvain"),
        pytest.param(
            lambda s, e, n: gds.eigenvector(gds.undirect(e), n, iterations=4),
            id="eigenvector",
        ),
        pytest.param(lambda s, e, n: gds.hits(e, n, iterations=3), id="hits"),
        pytest.param(
            lambda s, e, n: gds.betweenness(e, _nodes(s, [1, 6, 10]), max_depth=8),
            id="betweenness",
        ),
        pytest.param(
            lambda s, e, n: gds.dfs_preorder(e, _nodes(s, [1]), max_iter=8),
            id="dfs",
        ),
        pytest.param(lambda s, e, n: gds.ktruss(e, k=3), id="ktruss"),
        # the r14 second-wave fusions: probe-free Borůvka rounds (plus
        # deep-release of each round's folded-in wcc relabel state),
        # single-checkpoint k1coloring rounds, sllpa memory frames, and
        # steiner's fused Dijkstra + walk/peel releases
        pytest.param(
            lambda s, e, n: gds.spanning_forest(
                _edges(s, _PAIRS, weights=[float(i % 5 + 1) for i in range(len(_PAIRS))]),
                n,
            ),
            id="spanning_forest",
        ),
        pytest.param(
            lambda s, e, n: gds.k1coloring(e, n, max_rounds=20), id="k1coloring"
        ),
        pytest.param(lambda s, e, n: gds.sllpa(e, n, rounds=4), id="sllpa"),
        pytest.param(
            lambda s, e, n: gds.steiner_tree(
                _edges(s, _PAIRS, weights=[float(i % 5 + 1) for i in range(len(_PAIRS))]),
                _nodes(s, [1, 10, 13]),
            ),
            id="steiner",
        ),
    ],
)
def test_fused_kernels_release_superseded_state(spark, run):
    _clear(spark)
    e = _edges(spark, _PAIRS)
    n = _nodes(spark, _IDS)
    out = run(spark, e, n)
    out.collect()  # materialize fully (lazy-checkpoint results included)
    # only the returned frame's checkpoint (≤2 RDDs: result + an internal
    # rank/union stage some kernels checkpoint into the result) may stay
    assert _pinned_settled(spark, 2) <= 2, (
        "fused kernel leaked superseded state frames"
    )
    _clear(spark)


def test_astar_releases_superseded_state(spark):
    """astar's fused loop releases superseded state one round behind.

    The per-hop walk checkpoints ARE the result (as in random_walk) and
    the final Dijkstra state feeds the walk, so those stay pinned: on a
    3-edge path the budget is 4 hop frames + the final state + slack.
    Pre-fusion the same run pinned every round's improved+state pair
    (~11 frames)."""
    _clear(spark)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)], weights=[1.0, 1.0, 1.0])
    coords = spark.createDataFrame(
        [(i, float(i), 0.0) for i in range(1, 5)], ["id", "x", "y"]
    )
    rows = gds.astar(e, coords, 1, 4).collect()
    assert len(rows) == 1 and rows[0]["path"] == "1,2,3,4"
    assert _pinned_settled(spark, 6) <= 6, "astar leaked superseded state frames"
    _clear(spark)


def test_leakage_free_split_releases_superseded_labels(spark):
    """curation.leakage_free_split's min-label fixpoint releases
    superseded label checkpoints one round behind (pre-r14 it pinned one
    frame per wcc round) and folds change detection into the merge; only
    the returned label checkpoint may stay pinned."""
    from docker_neo4j_spark.operators.curation import leakage_free_split

    _clear(spark)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa xx"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa yy"),
            (3, "one two three four five six seven eight nine ten eleven"),
            (4, "one two three four five six seven eight nine ten twelve"),
            (5, "completely unrelated words that share no ten gram at all ok"),
        ],
        ["doc_id", "text"],
    )
    rows = leakage_free_split(docs, wcc_rounds=6).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # duplicate components land on the same side atomically
    assert by_id[1]["split"] == by_id[2]["split"]
    assert by_id[3]["split"] == by_id[4]["split"]
    assert len(rows) == 5
    assert _pinned_settled(spark, 2) <= 2, (
        "leakage_free_split leaked superseded label frames"
    )
    _clear(spark)


def test_bpe_train_single_job_rounds_release_vocab(spark):
    _clear(spark)
    df = spark.createDataFrame(
        [("low lower lowest newest newer new",), ("wide wider widest low low",)],
        ["text"],
    )
    merges = bpe_train(df, num_merges=4).collect()
    assert len(merges) == 4 and merges[0]["rank"] == 0
    # every intermediate re-segmentation frame must be released; the merge
    # table itself is a local driver frame, not a checkpoint
    assert _pinned_settled(spark, 1) <= 1, "bpe_train leaked re-segmentation frames"
    _clear(spark)


class TestLoopWidth:
    """r14 size-derived loop width: with AQE off inside static_loop_plan
    there is no partition coalescing, so the BSP body runs under a
    shuffle width derived from the kernel's edge-frame size instead of
    the session constant (guide §2.2). Co-partitioning holds at any
    width, so this must be invisible to results and restored on exit."""

    def test_width_derived_from_size_and_capped(self, spark):
        from docker_neo4j_spark.operators._mem import _loop_width

        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
        tiny = spark.range(10).selectExpr("id as src", "id+1 as dst")
        assert _loop_width(spark, tiny) == 1
        assert _loop_width(spark, None) == cap
        # ~16 bytes/row: 10M-row range sizes ≈ 160 MB >> 8 MiB * cap
        huge = spark.range(10_000_000).selectExpr("id as src", "id+1 as dst")
        assert _loop_width(spark, huge) == cap

    def test_forced_override_and_restore(self, spark, monkeypatch):
        from docker_neo4j_spark.operators._mem import (
            _loop_width,
            static_loop_plan,
        )

        monkeypatch.setenv("SPARK_GRAFT_LOOP_PARTS", "3")
        assert _loop_width(spark, None) == 3
        monkeypatch.delenv("SPARK_GRAFT_LOOP_PARTS")

        before = spark.conf.get("spark.sql.shuffle.partitions")
        tiny = spark.range(10).selectExpr("id as src", "id+1 as dst")
        with static_loop_plan(spark, sized_by=tiny):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == before

    def test_loop_output_partitioning_matches_width(self, spark):
        """The kernel's returned checkpoint inherits the derived width —
        the in-loop groupBy/repartition really resolve from it. (Uses a
        range-backed frame: RDD-backed frames have unknown stats and
        deliberately fall back to the session cap.)"""
        edges = spark.range(1, 5).selectExpr("id as src", "id+1 as dst")
        out = gds.wcc(edges, edges.selectExpr("src as id").union(
            edges.selectExpr("dst as id")).distinct())
        assert out.rdd.getNumPartitions() == 1
        assert [r["comp"] for r in out.orderBy("id").collect()] == [1] * 5


class TestCodegenCacheSizing:
    """r14 fifth continuation: the generated-class cache must hold a whole
    statement's codegen working set. Spark's default (100 entries) is
    smaller than ONE betweenness execution (110 units measured via
    CodegenMetrics), so every statement in a multi-statement session
    re-paid Janino + C2 JIT for identical generated source — measured as
    a -17% headline_total once fixed."""

    def test_default_covers_measured_working_set(self):
        from docker_neo4j_spark.session import ENGINE_DEFAULT_CONF

        val = int(ENGINE_DEFAULT_CONF["spark.sql.codegen.cache.maxEntries"])
        # largest single-statement unit count measured this round is 110
        # (gds_betweenness_cosupply); the default must hold a full
        # session's worth, not just one statement's.
        assert val >= 1000

    def test_caller_can_override(self):
        from docker_neo4j_spark.session import resolve_conf

        out = resolve_conf({"spark.sql.codegen.cache.maxEntries": "250"})
        assert out["spark.sql.codegen.cache.maxEntries"] == "250"

    def test_live_session_applies_static_conf(self, spark):
        # static SQL conf: readable from the live session the fixtures
        # built through get_spark (would throw if the key were unknown).
        assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 1000
