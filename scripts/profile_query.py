"""Per-query profiling harness (r14 optimization round — guide §1).

For each named headline query, splits wall time into:
  - build: ``queries()[name](spark, sf_dir)`` — driver-side plan construction
  - run1:  first noop write (codegen compile + execution)
  - run2:  second noop write (warm execution)
and counts Spark jobs/stages/tasks via the status tracker, so driver-bound
queries (planning, job-count overhead) are distinguishable from
executor-bound ones before anything is changed.

Usage: python scripts/profile_query.py [sf_dir] [query ...]
Defaults to the full bench HEADLINE at /root/testdata/sf0.1 on local[32].
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = [a for a in args if "/" not in a]

    import __spark_entry__ as e
    from bench import HEADLINE
    from docker_neo4j_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker

    qs = e.queries()
    todo = names or [n for n in HEADLINE if n in qs]

    # identical warmup to bench.py
    from docker_neo4j_spark.sources.tpch import build_graph, load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).write.mode("overwrite").format("noop").save()
    build_graph(spark, sf_dir)

    print(f"{'query':35s} {'build':>7s} {'run1':>7s} {'run2':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for name in todo:
        spark.catalog.clearCache()
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        group = f"prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.time()
        jobs = tracker().getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        for j in jobs:
            ji = tracker().getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker().getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        # run2: rebuild the frame (some queries mutate session state /
        # caches internally; a fresh build matches what bench pass 2 does)
        sc.setJobGroup(group + "-2", name)
        df2 = qs[name](spark, sf_dir)
        t3 = time.time()
        df2.write.mode("overwrite").format("noop").save()
        t4 = time.time()
        print(
            f"{name:35s} {t1-t0:7.2f} {t2-t1:7.2f} {t4-t3:7.2f} "
            f"{len(jobs):5d} {n_stages:6d} {n_tasks:6d}"
        )
        sc.setJobGroup("", "")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
