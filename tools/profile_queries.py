"""Per-query phase profiler for the optimization rounds (guide §1).

For each selected query, times:
  build   — calling the query function (driver-side plan construction)
  noop    — df.write.format("noop") (full compute, no transfer; guide §1.4)
  pandas  — len(df.toPandas()) (the bench's timed action, incl. transfer)
and counts Exchange / BatchEvalPython / ArrowEvalPython / Join nodes in the
formatted plan. Prints a TSV sorted by pandas time.

Usage: python tools/profile_queries.py [sf_dir] [query ...]
       (no query list = all; SPARK_GRAFT_CPUS honoured like bench.py)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.1"
    only = [a for a in argv if "/" not in a]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from btrdb_server_spark.session import get_spark

    spark = get_spark("profile-queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = only or sorted(qs)

    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.range(cpus).repartition(cpus).mapInPandas(lambda it: it, "id long").count()
    from btrdb_server_spark.sources.testdata import (
        ensure_events_ladder,
        ensure_events_store,
    )

    ensure_events_ladder(spark, sf_dir)
    ensure_events_store(spark, sf_dir)

    rows = []
    for name in names:
        try:
            # rep 1: cold-ish (after warmup); rep 2: warm — keep both.
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t_build = time.perf_counter() - t0

            jvm = spark.sparkContext._jvm
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            plan = df._jdf.queryExecution().explainString(mode)
            n_exch = len(re.findall(r"\bExchange\b", plan))
            n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow", plan))
            n_join = len(re.findall(r"Join\b", plan))

            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_noop = time.perf_counter() - t0

            t0 = time.perf_counter()
            df2 = qs[name](spark, sf_dir)
            n = len(df2.toPandas())
            t_pandas = time.perf_counter() - t0
            rows.append((name, t_build, t_noop, t_pandas, n_exch, n_py, n_join, n))
            print(
                f"{name}\t{t_build:.3f}\t{t_noop:.3f}\t{t_pandas:.3f}\t"
                f"ex={n_exch}\tpy={n_py}\tjoin={n_join}\trows={n}",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"{name}\tERROR\t{type(e).__name__}: {e}", file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)

    rows.sort(key=lambda r: -r[3])
    print("query\tbuild\tnoop\tpandas\texch\tpy\tjoin\trows")
    for r in rows:
        print(f"{r[0]}\t{r[1]:.3f}\t{r[2]:.3f}\t{r[3]:.3f}\t{r[4]}\t{r[5]}\t{r[6]}\t{r[7]}")


if __name__ == "__main__":
    main()
