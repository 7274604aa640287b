"""Dump .explain("formatted") for headline queries to plans/r14/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> [query ...]
(tag = "before" / "after"; default queries = the bench HEADLINE list)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from bench import HEADLINE
    from docker_neo4j_spark import get_spark

    spark = get_spark(app_name="dump-plans")
    qs = e.queries()
    todo = names or [n for n in HEADLINE if n in qs]
    outdir = "/root/repo/plans/r14"
    os.makedirs(outdir, exist_ok=True)
    for name in todo:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{outdir}/{name}_{tag}.txt", "w") as f:
                f.write(buf.getvalue())
            print(f"ok    {name}")
        except Exception as ex:  # noqa: BLE001 - report and continue
            print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:200]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
