"""Physical-plan invariants — the scale contract.

Correctness tests prove the operators right at sf0.001; these tests prove
the *plans* stay right: predicates reach the parquet scan, projections
prune columns, small sides broadcast, top-k never globally sorts, and
aggregations combine map-side. A regression here is invisible on 60k rows
and catastrophic at 100 TB, so each property is pinned explicitly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    # formatted mode prints PushedFilters/ReadSchema untruncated
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_raw_values_pushdown(spark):
    """Time-range + stream predicates must reach the parquet scan (F1/F3:
    the Spark analog of qtree bucket pruning), and only the needed columns
    may be read."""
    plan = plan_of(entry_mod.q_raw_values(spark, SF))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts" in plan
    assert "EqualTo(event_type,click)" in plan
    assert "ReadSchema: struct<ts:timestamp_ntz,event_type:string,value:double>" in plan


def test_aligned_windows_partial_agg(spark):
    """Stat aggregation must be a two-phase hash aggregate (map-side
    combine before the shuffle) — the Spark equivalent of the tree's
    hierarchical partial aggregates (A3)."""
    plan = plan_of(entry_mod.q_aligned_windows(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "partial_min" in plan or "partial" in plan
    assert "EqualTo(event_type,click)" in plan  # filter still pushed


def test_cosine_topk_no_global_sort(spark):
    """Exact top-k must plan as TakeOrderedAndProject (per-partition heap),
    never a full Sort + Limit."""
    plan = plan_of(entry_mod.q_cosine_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_nearest_is_limit_one(spark):
    """Nearest (J6) = orderBy+limit(1) -> TakeOrderedAndProject with
    pushed time predicate, not a global sort."""
    plan = plan_of(entry_mod.q_nearest_before(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan


def test_ivf_assign_broadcasts_centroids(spark):
    """The centroid dim table must broadcast — a shuffle join here would
    move the full 100 TB fact side."""
    plan = plan_of(entry_mod.q_ivf_assign(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_text_stats_single_scan_no_shuffle(spark):
    """Per-document text stats are map-only: no exchange other than the
    final presentation sort."""
    df = entry_mod.q_text_stats(spark, SF)
    plan = plan_of(df)
    # no aggregation/join shuffle: the only allowed exchanges are the
    # small-local-input round-robin spread and the presentation sort's
    # range partitioning
    assert "hashpartitioning" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_streams_metadata_filter_is_map_lookup(spark):
    """LookupStreams (J5) must stay a filter over the streams table — no
    join materializes for tag predicates."""
    from btrdb_server_spark.metadata import filter_streams
    from btrdb_server_spark.sources.testdata import load_table, streams_from_events

    streams = streams_from_events(load_table(spark, SF, "events"))
    found = filter_streams(streams, collection="events/", tags={"kind": "click"})
    assert "Join" not in optimized_of(found)


def test_rollup_serve_prunes_to_one_shard(spark):
    """Ladder-served stat queries must hit one uuid_bucket partition
    directory (the foldable-hash pruning that keeps single-stream serves
    O(1 shard) at 100 TB)."""
    plan = plan_of(entry_mod.q_aligned_windows_rollup(spark, SF))
    assert "PartitionFilters" in plan
    filters = plan.split("PartitionFilters", 1)[1][:300]
    assert "uuid_bucket" in filters
    # the time range must also prune chunk partitions, not just shards
    assert "chunk" in filters


def test_window_spine_join_broadcasts(spark):
    """Windows hole emission joins the aggregate against a generated spine;
    neither side may shuffle the points table a second time."""
    plan = plan_of(entry_mod.q_windows_holes(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_changed_ranges_heavy_window_is_partitioned(spark):
    """Interval coalescing must not funnel the full interval set through one
    single-partition global window: the first (heavy) gap-and-islands pass
    runs partitioned by the chunk key; only chunk-scale remainders may see
    an unpartitioned window."""
    import re

    df = entry_mod.q_changed_ranges(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    windows = re.findall(r"Window \[[^\n]*", plan)
    assert windows, "expected window operators in the plan"
    chunked = [w for w in windows if "chunk" in w]
    assert chunked, f"no chunk-partitioned window in plan: {windows}"


def test_quality_filter_map_only_pruned_scan(spark):
    """Quality rules are pure column expressions: no aggregation/join
    shuffle, and the scan must read only (doc_id, text)."""
    plan = plan_of(entry_mod.q_quality_filter(spark, SF))
    assert "hashpartitioning" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_stratified_sample_is_map_side_filter(spark):
    """Hash-threshold sampling must stay a scan+filter — zero shuffle
    besides the presentation sort (a groupBy/join here would be wrong at
    any scale)."""
    plan = plan_of(entry_mod.q_stratified_sample(spark, SF))
    assert "hashpartitioning" not in plan
    assert "Join" not in plan


def test_decontaminate_bench_side_broadcasts(spark):
    """The benchmark shingle set is eval-set-sized and must broadcast; the
    corpus side may never shuffle for the match itself."""
    plan = plan_of(entry_mod.q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_bm25_posting_sides_broadcast(spark):
    """BM25's corpus stats (1 row) and document frequencies (|query| rows)
    must broadcast — a sort-merge join on either would shuffle the posting
    lists twice for dim tables of a handful of rows."""
    plan = plan_of(entry_mod.q_bm25_topk(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_pq_codebook_broadcasts(spark):
    """The PQ codebook (m*k rows) joins the exploded corpus broadcast-side;
    the argmin is an aggregate (map-side combinable), not a window sort."""
    plan = plan_of(entry_mod.q_pq_encode(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_dsir_weight_table_broadcasts(spark):
    """DSIR scoring joins tokens to the B-row bucket-weight table: that side
    must broadcast (the corpus never shuffles to be scored), and the doc
    scan must be pruned to (doc_id, lang, text)."""
    plan = plan_of(entry_mod.q_dsir_weights(spark, SF))
    assert "BroadcastHashJoin" in plan
    # every scan branch prunes to its needed columns — the scoring branch
    # reads (doc_id, text), the distribution branch (text, lang); nothing
    # reads source/n_chars
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "n_chars" not in plan


def test_dup_spans_no_pairwise_join(spark):
    """Duplicate-span detection must be groupBy-count + key join back —
    never a corpus self-join on the span text. The only equi-join key is
    the 60-bit hash; span strings must not survive into the join."""
    import re

    plan = plan_of(entry_mod.q_dup_spans(spark, SF))
    assert "Join" in plan
    keys = re.findall(r"(?:Left|Right) keys \[\d+\]: \[[^\]]*\]", plan)
    assert keys and all("h#" in k for k in keys), keys


def test_hard_negatives_takeordered(spark):
    """Probe rides as a broadcast; top-k must plan as TakeOrderedAndProject
    (per-partition heap), not a global sort."""
    plan = plan_of(entry_mod.q_hard_negatives(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Broadcast" in plan


def test_rewrite_aligned_stat_routes_to_ladder(spark, tmp_path):
    """Implicit aggregate pushdown: a hand-written canonical aligned-stat
    aggregation is transparently served from the ladder (plan reads rollup
    rows, not raw points), with identical results; non-canonical or
    unaligned queries pass through untouched."""
    import pyspark.sql.functions as F

    from btrdb_server_spark.plans.rewrite import rewrite_aligned_stat
    from btrdb_server_spark.plans.rollup import RollupLadder
    from btrdb_server_spark.sources.testdata import load_points

    pts = load_points(spark, "/root/testdata/sf0.001")
    ladder = RollupLadder(spark, str(tmp_path / "ladder"), levels=(32, 38))
    ladder.rebuild(pts)

    pw = 40
    start, end = 1704067200000000000 >> pw << pw, 1735689600000000000 >> pw << pw

    def canonical(p):
        return (
            p.where(
                (F.col("uuid") == "click")
                & (F.col("time") >= start)
                & (F.col("time") < end)
            )
            .groupBy(F.shiftleft(F.shiftright("time", pw), pw).alias("time"))
            .agg(
                F.min("value").alias("min"),
                F.avg("value").alias("mean"),
                F.max("value").alias("max"),
                F.count("value").alias("count"),
            )
        )

    df = canonical(pts)
    routed = rewrite_aligned_stat(df, ladder)
    assert routed is not df
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "vsum" in plan and "value" not in plan  # ladder scan, not raw points

    raw = {r.time: r for r in df.collect()}
    srv = {r.time: r for r in routed.collect()}
    assert set(raw) == set(srv) and len(raw) > 100
    for t, r in raw.items():
        s = srv[t]
        assert (r["min"], r["max"], r["count"]) == (s["min"], s["max"], s["count"])
        assert abs(r["mean"] - s["mean"]) < 1e-9

    # Unaligned bounds: exactness would break -> untouched.
    df_unaligned = (
        pts.where(
            (F.col("uuid") == "click")
            & (F.col("time") >= start + 5)
            & (F.col("time") < end)
        )
        .groupBy(F.shiftleft(F.shiftright("time", pw), pw).alias("time"))
        .agg(F.min("value").alias("min"))
    )
    assert rewrite_aligned_stat(df_unaligned, ladder) is df_unaligned

    # Non-canonical aggregate (sum) -> untouched.
    df_sum = (
        pts.where(
            (F.col("uuid") == "click")
            & (F.col("time") >= start)
            & (F.col("time") < end)
        )
        .groupBy(F.shiftleft(F.shiftright("time", pw), pw).alias("time"))
        .agg(F.sum("value").alias("s"))
    )
    assert rewrite_aligned_stat(df_sum, ladder) is df_sum

    # Query finer than the finest level -> untouched.
    fine = canonical(pts)  # pw 40 ok; now build a pw-20 query
    df_fine = (
        pts.where(
            (F.col("uuid") == "click")
            & (F.col("time") >= start)
            & (F.col("time") < end)
        )
        .groupBy(F.shiftleft(F.shiftright("time", 20), 20).alias("time"))
        .agg(F.min("value").alias("min"))
    )
    assert rewrite_aligned_stat(df_fine, ladder) is df_fine


def test_rewrite_windows_shape_routes_to_ladder(spark, tmp_path):
    """The second canonical stat shape — arbitrary-width tumbling windows,
    GROUP BY (time - s) DIV w or floor((time - s) / w) — is served from the
    ladder when width and origin are aligned to a materialized level;
    unaligned width or an overlong float-floor range passes through."""
    import pyspark.sql.functions as F

    from btrdb_server_spark.plans.rewrite import rewrite_aligned_stat
    from btrdb_server_spark.plans.rollup import RollupLadder
    from btrdb_server_spark.sources.testdata import load_points

    pts = load_points(spark, "/root/testdata/sf0.001")
    ladder = RollupLadder(spark, str(tmp_path / "ladder"), levels=(32, 38))
    ladder.rebuild(pts)

    lvl = 38
    start = 1704067200000000000 >> lvl << lvl
    end = 1735689600000000000 >> lvl << lvl
    w = (1 << lvl) * 8
    pts.createOrReplaceTempView("pts_wr")

    q_div = spark.sql(
        f"""SELECT (time - {start}) DIV {w} AS widx, min(value) AS vmin,
                   avg(value) AS vmean, max(value) AS vmax, count(value) AS cnt
            FROM pts_wr WHERE uuid = 'click' AND time >= {start} AND time < {end}
            GROUP BY (time - {start}) DIV {w}"""
    )
    routed = rewrite_aligned_stat(q_div, ladder)
    assert routed is not q_div
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "vsum" in plan and "value" not in plan  # ladder scan, not raw points

    raw = {r.widx: r for r in q_div.collect()}
    srv = {r.widx: r for r in routed.collect()}
    assert set(raw) == set(srv) and len(raw) > 50
    for k, r in raw.items():
        s = srv[k]
        assert (r.vmin, r.vmax, r.cnt) == (s.vmin, s.vmax, s.cnt)
        assert abs(r.vmean - s.vmean) < 1e-9

    # Float-floor form (DataFrame F.floor) engages on a range inside the
    # 2**52 ns representability guard (~30 days here; the year-long range
    # above would be refused — the user's own double arithmetic rounds
    # offsets by whole ns past 2**52) and matches the div form.
    end30 = start + w * 300  # whole windows only, ~7.6 days
    q_floor = (
        pts.where(
            (F.col("uuid") == "click")
            & (F.col("time") >= start)
            & (F.col("time") < end30)
        )
        .groupBy(F.floor((F.col("time") - F.lit(start)) / F.lit(w)).alias("widx"))
        .agg(F.count("value").alias("cnt"))
    )
    routed_f = rewrite_aligned_stat(q_floor, ladder)
    assert routed_f is not q_floor
    assert {r.widx: r.cnt for r in routed_f.collect()} == {
        k: r.cnt for k, r in raw.items() if k < 300
    }

    # Width not a multiple of any level -> untouched.
    q_bad = spark.sql(
        f"""SELECT (time - {start}) DIV {w + 1} AS widx, count(value) AS cnt
            FROM pts_wr WHERE uuid = 'click' AND time >= {start} AND time < {end}
            GROUP BY (time - {start}) DIV {w + 1}"""
    )
    assert rewrite_aligned_stat(q_bad, ladder) is q_bad

    # Float-floor beyond 2**52 ns of offset: the user's own double
    # arithmetic is no longer provably exact -> untouched (div form at the
    # same range still rewrites: integer arithmetic).
    s0, e0 = 0, 1 << 53
    q_long_floor = (
        pts.where(
            (F.col("uuid") == "click") & (F.col("time") >= s0) & (F.col("time") < e0)
        )
        .groupBy(F.floor((F.col("time") - F.lit(s0)) / F.lit(w)).alias("widx"))
        .agg(F.count("value").alias("cnt"))
    )
    assert rewrite_aligned_stat(q_long_floor, ladder) is q_long_floor
    q_long_div = spark.sql(
        f"""SELECT (time - {s0}) DIV {w} AS widx, count(value) AS cnt
            FROM pts_wr WHERE uuid = 'click' AND time >= {s0} AND time < {e0}
            GROUP BY (time - {s0}) DIV {w}"""
    )
    assert rewrite_aligned_stat(q_long_div, ladder) is not q_long_div

    # Fleet windows: GROUP BY uuid, widx with no uuid predicate.
    q_fleet = spark.sql(
        f"""SELECT uuid, (time - {start}) DIV {w} AS widx, count(value) AS cnt
            FROM pts_wr WHERE time >= {start} AND time < {end}
            GROUP BY uuid, (time - {start}) DIV {w}"""
    )
    routed_fl = rewrite_aligned_stat(q_fleet, ladder)
    assert routed_fl is not q_fleet
    assert {(r.uuid, r.widx): r.cnt for r in routed_fl.collect()} == {
        (r.uuid, r.widx): r.cnt for r in q_fleet.collect()
    }


def test_new_pipeline_ops_plan_shapes(spark):
    """Shape guards for the round-4 pipeline ops: survivor selection,
    bipartite-LSH decontamination and binary dedup plan with NO window
    sort and NO nested-loop join anywhere (argmaxes are struct-min/max
    aggregates; all joins are equi-joins); tfidf's only windows partition
    by doc_id (single-document groups) and its only nested-loop is the
    one-row corpus-size broadcast."""
    for name in ["dedup_select", "decontaminate_lsh", "media_dedup"]:
        plan = plan_of(entry_mod.queries()[name](spark, SF))
        assert "Window" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name

    plan = plan_of(entry_mod.queries()["tfidf_topk"](spark, SF))
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("doc_id" in s for s in specs)


def test_ohlc_partial_agg_before_exchange(spark):
    """OHLC's struct-typed min/max falls off HashAggregate onto
    SortAggregate by design — the contract is that the PARTIAL aggregate
    still runs map-side, so the shuffle carries one row per bucket, not
    per point (see ohlc_windows docstring for the trade-off)."""
    plan = entry_mod.q_ohlc_windows(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min(struct(time" in plan
    # partial aggregate must sit BELOW the hash-partition exchange
    assert plan.index("partial_min(struct(time") > plan.index("Exchange hashpartitioning")


def test_funnel_reuses_user_exchanges(spark):
    """Every funnel shuffle is keyed on the same user column; the union of
    per-step counts must not multiply point-scale scans (subplans shared
    via exchange reuse) and each step is a partial-agg groupBy."""
    plan = plan_of(entry_mod.q_funnel(spark, SF))
    assert "partial_min" in plan
    # one scan per event-type filter is fine; the s1 subtree must be reused
    # rather than recomputed for every downstream step + count branch.
    assert "ReusedExchange" in plan or plan.count("FileScan parquet") <= 4


def test_xcorr_per_lag_work_is_bucket_scale(spark):
    """xcorr's per-lag joins/aggregates run on localCheckpoint'ed
    bucket-scale tables: the executed plan must contain NO parquet scan
    (points were scanned exactly once per side at checkpoint time)."""
    df = entry_mod.q_xcorr_lags(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan  # the two pinned bucket tables


def test_interval_join_bucketed_is_equi_join(spark):
    """The bucketed path must plan as a shuffle/sort-merge EQUI join on the
    bucket key — never a nested-loop over the interval set; the broadcast
    path must plan as BroadcastNestedLoopJoin with no points shuffle."""
    from btrdb_server_spark.operators.changes import interval_join
    from btrdb_server_spark.sources.testdata import load_points

    pts = load_points(spark, SF).where(F.col("uuid") == "click")
    iv = spark.createDataFrame([(0, 10**18)], "start long, end long")
    bp = plan_of(interval_join(pts, iv, bucket_pw=42))
    assert "NestedLoop" not in bp
    assert "SortMergeJoin" in bp or "ShuffledHashJoin" in bp or "BroadcastHashJoin" in bp
    nb = plan_of(interval_join(pts, iv))
    assert "BroadcastNestedLoopJoin" in nb
    assert "Exchange hashpartitioning" not in nb


def test_group_topk_window_group_limit(spark):
    """The rank filter must rewrite to WindowGroupLimit: per-partition
    top-k BEFORE the exchange, so the shuffle carries groups x k rows."""
    plan = entry_mod.q_group_topk(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.index("WindowGroupLimit", plan.index("Exchange hashpartitioning")) > 0


def test_pricing_summary_pushdown_and_partial_agg(spark):
    """The Q1-flavor scan must push the ship-date predicate to parquet,
    prune to the seven needed columns, and combine map-side (partial
    HashAggregate before the exchange)."""
    df = entry_mod.q_pricing_summary(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "ReadSchema" in plan
    assert "partial" in plan.lower()
    # exactly one wide exchange: the groupBy on (returnflag, linestatus)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Exchange hashpartitioning") == 1


def test_revenue_by_nation_broadcasts_dims(spark):
    """The star join must broadcast the nation dim (explicit hint) and must
    NOT plan a cartesian/nested-loop anywhere; the fact-fact join keys on
    the order id."""
    plan = plan_of(entry_mod.q_revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_periodogram_single_point_scale_groupby(spark):
    """The only point-scale stage is the phase-bin groupBy; the trig table
    joins broadcast (never shuffles the binned table by trig key)."""
    df = entry_mod.q_periodogram(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    # one exchange for the bin groupBy + one for the final k-groupBy (both
    # metadata-scale); the point-scale scan feeds only the first.
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Exchange hashpartitioning") <= 2


def test_pagerank_topk_never_globally_sorts(spark):
    """The top-50 must plan as TakeOrderedAndProject, not a global Sort of
    all nodes."""
    plan = entry_mod.q_copurchase_pagerank(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_top_paths_window_group_limit(spark):
    """The first-N-events rank filter must rewrite to WindowGroupLimit so
    the per-user sort shuffles only depth rows per user."""
    plan = entry_mod.q_top_paths(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_late_order_priority_semi_join(spark):
    """The existence query must plan as a LeftSemi join (orders emitted at
    most once) — never an inner join + distinct over multiplied rows."""
    plan = entry_mod.q_late_order_priority(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "HashAggregate" in plan


def test_pca_single_scan_no_explode(spark):
    """The moment pass must be ONE scan feeding Arrow-batched partials —
    no Generate (explode) node, no wide exchange of product rows."""
    from btrdb_server_spark.functions.linalg import pca_top_component
    from btrdb_server_spark.sources.testdata import load_table

    # build the distributed part of the plan without collecting
    emb = load_table(spark, SF, "embeddings")
    df = entry_mod.q_pca_top_component(spark, SF)
    # result is a local DataFrame; assert the OPERATOR ran (64 loadings)
    assert df.count() == 64


def test_cohort_ltv_broadcasts_cohort_map(spark):
    """The cohort assignment and size tables must broadcast — the only
    wide exchanges are the per-user groupBy and the triangle window."""
    plan = plan_of(entry_mod.q_cohort_ltv(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_uplift_cut_points_broadcast(spark):
    """Quintile cut points join every user row via a broadcast 1-row
    table, never a shuffle keyed on the cut values."""
    df = entry_mod.q_uplift_quintiles(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_twa_fragments_are_bounded_explode(spark):
    """twa_hold's segment-to-window assignment must be a Generate over the
    bounded widx sequence feeding one hash aggregate — no range join."""
    plan = entry_mod.q_twa_hold(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    assert "NestedLoop" not in plan


def test_shipping_priority_take_ordered(spark):
    """Q3-flavor top-10 must plan TakeOrderedAndProject (no global sort);
    the segment leg must stay a semi join; the ship/order date predicates
    reach the parquet scans."""
    df = entry_mod.q_shipping_priority(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in simple
    assert "LeftSemi" in simple
    plan = plan_of(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_top_supplier_single_fact_scan(spark):
    """The fact is scanned ONCE (max via supplier-scale window, not a
    second aggregate subtree); supplier joins broadcast; the only wide
    exchange is the per-supplier groupBy."""
    df = entry_mod.q_top_supplier(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("BroadcastHashJoin") >= 1
    assert simple.count("Exchange hashpartitioning") <= 1
    assert simple.count("lineitem.parquet") == 1


def test_pivot_report_single_shuffle(spark):
    """The static-value pivot must fold into ONE groupBy(n_name) shuffle —
    no distinct-values pre-pass, no second aggregate exchange — with
    nation broadcast."""
    df = entry_mod.q_pivot_report(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in simple
    # customer⋈orders may hash-join wide; the PIVOT itself adds exactly
    # one aggregate exchange on n_name
    assert simple.count("Exchange hashpartitioning") <= 2


def test_assoc_rules_broadcast_counts(spark):
    """Brand-pair fan-out co-hashes the order key once; part and the
    label-scale count tables broadcast; top-50 is TakeOrderedAndProject."""
    df = entry_mod.q_assoc_rules(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in simple
    assert simple.count("BroadcastHashJoin") >= 3


def test_bilateral_trade_two_broadcast_legs(spark):
    """Both nation dim chains must broadcast; the only wide exchanges are
    the fact-fact order-key co-hash and the label-scale final groupBy."""
    df = entry_mod.q_bilateral_trade(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("BroadcastHashJoin") >= 2
    assert "Cartesian" not in simple


def test_returned_item_losses_agg_before_dim(spark):
    """The customer dim must join AFTER the per-customer aggregate (the
    aggregate's child sees no customer columns) and the top-20 must be
    TakeOrderedAndProject."""
    df = entry_mod.q_returned_item_losses(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in simple
    # the aggregate on o_custkey happens below the customer join:
    # customer.parquet appears exactly once, and only one wide exchange
    # carries item-scale rows (the lineitem⋈orders co-hash pair)
    assert simple.count("customer.parquet") == 1
    plan = plan_of(df)
    assert "l_returnflag" in plan  # returnflag filter pushed to the scan


def test_local_supplier_volume_one_wide_exchange(spark):
    """Q5-full: every dim (customer/supplier/nation/region) broadcasts;
    no cartesian; the same-nation equality is resolved inside a
    broadcast hash join, not a second fact shuffle."""
    df = entry_mod.q_local_supplier_volume(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("BroadcastHashJoin") >= 3
    assert "Cartesian" not in simple


def test_market_share_semi_join_market(spark):
    """Q8 flavor: the market-region membership is a broadcast LeftSemi,
    the numerator flag a broadcast left join — one conditional-sum pass,
    no second aggregation over the fact."""
    df = entry_mod.q_market_share(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in simple
    assert simple.count("lineitem.parquet") == 1


def test_promo_revenue_part_broadcast_and_date_pushdown(spark):
    """Q14 flavor: part joins broadcast; the ship-date range reaches the
    lineitem parquet scan."""
    df = entry_mod.q_promo_revenue(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in simple
    plan = plan_of(df)
    assert "l_shipdate" in plan


def test_small_qty_revenue_brand_slice_only(spark):
    """Q17 flavor: both passes run over the brand slice (semi-join into
    the scan), and the per-part stats join back as a broadcast."""
    df = entry_mod.q_small_qty_revenue(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in simple
    assert simple.count("BroadcastHashJoin") >= 1


def test_large_orders_agg_before_join(spark):
    """Q18 flavor: the quantity rollup happens on the fact alone (partial
    aggregate below any join) and the top-20 is TakeOrderedAndProject."""
    df = entry_mod.q_large_orders(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in simple
    assert simple.count("lineitem.parquet") == 1


def test_idle_customers_anti_join(spark):
    """Q22 flavor: idleness is a LeftAnti join against date-pruned order
    keys; the average-balance scalar joins as a broadcast."""
    df = entry_mod.q_idle_customers(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in simple
    assert "Broadcast" in simple


def test_group_sample_window_group_limit(spark):
    """The per-stream md5-rank prune must rewrite to WindowGroupLimit —
    per-partition top-k heaps BEFORE the exchange."""
    df = entry_mod.q_group_sample(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in simple


def test_tail_index_window_group_limit(spark):
    """The top-(k+1) per stream is a WindowGroupLimit prune, not a global
    sort."""
    df = entry_mod.q_tail_index(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in simple


def test_ngram_coverage_take_ordered_head(spark):
    """The n-gram domain is never globally sorted: the head is
    TakeOrderedAndProject and the rank window sees max(k) rows."""
    df = entry_mod.q_ngram_coverage(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in simple


def test_customer_distribution_agg_before_join(spark):
    """Q13: the per-customer count aggregates the orders fact alone —
    orders.parquet is scanned once and the aggregate sits below the
    customer join."""
    df = entry_mod.q_customer_distribution(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("orders.parquet") == 1


def test_power_users_no_user_scale_sort(spark):
    """The decile threshold reads off the count-of-counts cumulative —
    the single-partition window runs on the activity-value domain, so no
    global user-scale Sort feeds a row_number."""
    df = entry_mod.q_power_users(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in simple


def test_product_profit_broadcasts_all_dims(spark):
    """Q9 flavor: part (filtered), supplier and nation all broadcast; no
    nested-loop/cartesian anywhere; the p_type filter reaches the part
    scan so the fact reduction happens map-side."""
    plan = plan_of(entry_mod.q_product_profit(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "EqualTo(p_type,ECONOMY)" in plan


def test_simhash_pairs_band_join_not_cartesian(spark):
    """The Hamming candidate join must be an equi-join on (band, slice
    value) — a cross product would be quadratic in the corpus."""
    plan = plan_of(entry_mod.q_simhash_pairs(spark, SF))
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_lsh_recall_eval_single_pass_audit(spark):
    """The recall audit folds n_truth/n_candidates/n_hits out of ONE
    tagged union + aggregation (_pair_audit): the retired three-branch
    shape (count, count, semi-join count) executed the whole-corpus truth
    and candidate pipelines twice each. Pin: a Union feeds the audit and
    no scalar crossJoin branches remain."""
    plan = plan_of(entry_mod.q_lsh_recall_eval(spark, SF))
    assert "Union" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bigram_perplexity_lm_joins_keyed(spark):
    """The LM scoring joins are equi-joins on the bigram/unigram keys; the
    only nested-loop is the one-row vocabulary-size broadcast."""
    df = entry_mod.q_bigram_perplexity(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in simple
    assert simple.count("BroadcastNestedLoopJoin") <= 1


def test_weighted_sample_top_k_never_sorts_globally(spark):
    """The A-ES top-k must plan as TakeOrderedAndProject (per-partition
    heaps), never a global Sort of the keyed corpus."""
    df = entry_mod.q_weighted_sample(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in simple


def test_shingle_self_join_is_df_capped(spark):
    """The exact-shingle self-joins (ngram_jaccard_pairs,
    containment_pairs) must filter shingles to document-frequency
    <= df_cap BEFORE the self-join: one boilerplate shingle in m
    documents otherwise contributes m**2 rows to a single shuffle key —
    at 100 TB a license-header shingle in 1e6 docs is a 1e12-row hot
    partition. The nd <= cap predicate must survive into the optimized
    plan of both operators."""
    for q in (entry_mod.q_ngram_jaccard, entry_mod.q_containment_pairs):
        plan = optimized_of(q(spark, SF))
        assert "<= 1000" in plan, f"df_cap filter missing from {q.__name__}"


def test_hot_shingle_skew_is_bounded_by_df_cap(spark):
    """Skew stress: a corpus where ONE shingle appears in every document.
    Uncapped, the self-join fans that key out to n*(n-1)/2 candidate
    pairs; with df_cap below the hot key's frequency the shingle is
    dropped from both intersection and sizes, so no pair survives and
    the quadratic never runs. Jaccard over the remaining (per-doc
    unique) vocabulary is exact."""
    from btrdb_server_spark.functions.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    n = 40
    rows = [(i, f"aaa bbb ccc u{i}x u{i}y") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # Every doc shares exactly the one boilerplate shingle "aaa bbb ccc";
    # uncapped at threshold 0 that is C(40,2) = 780 candidate pairs.
    uncapped = ngram_jaccard_pairs(docs, threshold=0.0).count()
    assert uncapped == n * (n - 1) // 2
    # df_cap below the hot key's document frequency: the key is excluded
    # from the join input, so zero pairs — and zero quadratic fan-out.
    assert ngram_jaccard_pairs(docs, threshold=0.0, df_cap=10).count() == 0
    assert containment_pairs(docs, threshold=0.0, df_cap=10).count() == 0
    # Exactness on the capped vocabulary: two true near-dups still found
    # (they share sub-cap shingles), with jaccard computed over capped
    # sizes only.
    rows += [(100, "xxx yyy zzz www qqq"), (101, "xxx yyy zzz www rrr")]
    docs2 = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs2, threshold=0.4, df_cap=10).collect()
    }
    # docs 100/101: shingles {xyz, yzw, zwq|zwr} -> inter 2, union 4.
    assert got == {(100, 101): 0.5}


def test_incremental_compact_scan_is_partition_pruned(spark, tmp_path):
    """The incremental compact's rewrite scan must carry a uuid_bucket
    partition filter admitting ONLY the fresh sentinel plus the touched
    buckets — at a 100 TB base that filter is the difference between a
    tail-sized maintenance job and a full-store read. Pinned by building
    the same prefiltered plan compact() plans internally."""
    from pyspark.sql import functions as SF

    from btrdb_server_spark.store import FRESH_BUCKET, PointStore

    store = PointStore(spark, str(tmp_path / "s"), num_buckets=8)
    store.insert_many(
        spark.createDataFrame(
            [(f"u{i}", t, 1.0) for i in range(16) for t in range(4)],
            "uuid string, time long, value double",
        )
    )
    store.compact()
    store.insert("u3", [(99, 9.0)])
    b3 = spark.range(1).select(
        SF.pmod(SF.xxhash64(SF.lit("u3")), SF.lit(8)).alias("b")
    ).collect()[0].b
    pred = SF.col("uuid_bucket").isin([FRESH_BUCKET, int(b3)])
    plan = plan_of(store.points_at(None, prefilter=pred))
    import re as _re

    m = _re.search(r"PartitionFilters: \[[^\]]*uuid_bucket[^\]]*\]", plan)
    assert m, f"uuid_bucket prefilter did not reach PartitionFilters:\n{plan}"
    assert str(FRESH_BUCKET) in m.group(0) and str(b3) in m.group(0)


def test_changefeed_uuid_filter_pushes_to_scan(spark, tmp_path):
    """A per-stream changefeed subscription pushes the uuid predicate into
    the parquet scan (row-group pruning via the (uuid, time)-sorted file
    stats) — the feed never filters driver-side."""
    from btrdb_server_spark.store import PointStore
    from btrdb_server_spark.streaming.changefeed import changefeed

    store = PointStore(spark, str(tmp_path / "s"), num_buckets=4)
    store.insert("a", [(1, 1.0)])
    store.insert("b", [(2, 2.0)])
    rows = []
    q = (
        changefeed(store).where(F.col("uuid") == "a")
        .writeStream.foreachBatch(lambda b, _id: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # the micro-batch's physical plan lives on the streaming query, not on
    # the (ExistingRDD-wrapped) DataFrame foreachBatch receives
    plan = q._jsq.explainInternal(True)
    assert [(r.uuid, r.time) for r in rows] == [("a", 1)]
    assert "PushedFilters" in plan and "EqualTo(uuid,a)" in plan, (
        f"uuid filter not pushed to the feed scan:\n{plan}"
    )


def test_cube_report_single_pass_expand(spark):
    """CUBE must plan as one Expand + one hash aggregate over a single scan
    of the fact — not one aggregation pass per grouping set. Exactly one
    wide exchange (the post-Expand groupBy); money columns pruned to the
    four needed."""
    df = entry_mod.q_cube_report(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Expand") == 1
    assert simple.count("Scan parquet") == 1
    # one exchange for the grouped agg + the presentation sort's range
    # exchange; no more
    assert simple.count("Exchange hashpartitioning") == 1
    plan = plan_of(df)
    assert "partial" in plan.lower()  # map-side combine under the Expand


def test_sorted_neighborhood_no_global_sort(spark):
    """SNM must sort WITHIN hash-partitioned blocks (window over blk), never
    range-partition the corpus into one global order, and the verify join
    must be plain shuffled hash/sort-merge joins — no cartesian."""
    df = entry_mod.q_sorted_neighborhood_pairs(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    # the only rangepartitioning allowed is the final presentation orderBy
    # on (a, b) — the window itself must ride hashpartitioning(blk)
    assert "hashpartitioning(blk" in simple
    assert simple.count("Exchange rangepartitioning") <= 1
    assert "CartesianProduct" not in simple and "NestedLoop" not in simple


def test_ann_index_probe_prunes_cell_directories(spark, tmp_path):
    """The persisted-IVF probe's cluster predicate must reach the parquet
    source as a PARTITION filter (directory pruning — the probe reads
    ~nprobe/k of the corpus bytes), and the within-cell scoring must not
    shuffle or join."""
    from btrdb_server_spark.functions.similarity import (
        ann_index_topk,
        ivf_index_build,
    )

    emb = entry_mod.load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf_index")
    ivf_index_build(emb, idx, k=4)
    probe = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    df = ann_index_topk(spark, idx, probe, k=5, nprobe=2)
    plan = plan_of(df)
    import re as _re

    assert _re.search(r"PartitionFilters: \[[^\]]*cluster[^\]]*\]", plan), plan
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan  # ranking used the collected literal ids


def test_bm25_index_probe_prunes_posting_buckets(spark, tmp_path):
    """The persisted-BM25 probe must prune posting DIRECTORIES via the
    literal bucket predicate, broadcast the query-sized df/stats sides,
    and top-k without a global sort."""
    from btrdb_server_spark.functions.retrieval import (
        bm25_index_build,
        bm25_index_topk,
    )

    docs = entry_mod.load_table(spark, SF, "documents")
    idx = str(tmp_path / "bm25_index")
    bm25_index_build(docs, idx, buckets=16)
    df = bm25_index_topk(spark, idx, ["spark", "hash"], k=5)
    plan = plan_of(df)
    import re as _re

    assert _re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", plan), plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_index_build_is_map_only(spark):
    """The index build's assignment must be row-local: no join, no
    exchange — the whole 100 TB corpus clusters in one map pass (the
    docstring contract of ivf_index_build)."""
    from btrdb_server_spark.functions.similarity import (
        _assigned_cells,
        centroids_from_rows,
    )

    emb = entry_mod.load_table(spark, SF, "embeddings")
    cents = sorted(
        centroids_from_rows(emb, k=4).collect(), key=lambda r: r["cid"]
    )
    plan = plan_of(_assigned_cells(emb, cents))
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_ivf_rowwise_assignment_matches_ivf_assign(spark):
    """The literal-centroid row-local argmax must be bit-identical to
    ivf_assign's broadcast-join argmax (same rounded cosine, same
    ties-to-smallest-cid rule) — the persisted index's cells must agree
    with every other IVF consumer."""
    from btrdb_server_spark.functions.similarity import (
        _assigned_cells,
        centroids_from_rows,
        ivf_assign,
    )

    emb = entry_mod.load_table(spark, SF, "embeddings")
    cent_df = centroids_from_rows(emb, k=4)
    cents = sorted(cent_df.collect(), key=lambda r: r["cid"])
    rowwise = {
        r["vec_id"]: r["cluster"]
        for r in _assigned_cells(emb, cents).select("vec_id", "cluster").collect()
    }
    joined = {
        r["vec_id"]: r["cluster"] for r in ivf_assign(emb, cent_df).collect()
    }
    assert rowwise == joined


def test_export_bulk_is_funnel_free(spark, tmp_path):
    """api.export_bulk's canonical bulk-export contract: the dataset the
    executors write is the plain MVCC raw slice — no Collect, no Python
    UDF stage, no driver funnel anywhere in the plan — and the write
    lands one file per task (executor-parallel), unlike the wire lanes
    which are single-socket by construction."""
    import glob as globmod

    from btrdb_server_spark.api import BTrDB

    db = BTrDB(spark, str(tmp_path / "db"))
    db.store.insert_many(
        spark.range(0, 20000, 1, 4).select(
            F.lit("a").alias("uuid"),
            F.col("id").alias("time"),
            F.col("id").cast("double").alias("value"),
        )
    )
    df = db.raw_values("a", 0, 20000)
    plan = plan_of(df)
    assert "Collect" not in plan and "toPandas" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
    db.export_bulk("a", 0, 20000, str(tmp_path / "out"))
    parts = globmod.glob(str(tmp_path / "out" / "part-*"))
    assert parts, "no part files written"
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 20000


def test_retired_index_probes_keep_pruning_and_broadcast(spark, tmp_path):
    """After a retire, every index probe must KEEP its directory pruning
    and take the tombstone set as a broadcast anti-join — a shuffled
    anti-join here would re-shuffle the corpus-sized index scan at every
    probe, which is exactly what the tombstone design exists to avoid."""
    import re as _re

    from btrdb_server_spark.functions.dedup import (
        incremental_dedup_pairs,
        lsh_index_build,
        lsh_index_retire,
    )
    from btrdb_server_spark.functions.retrieval import (
        bm25_index_build,
        bm25_index_retire,
        bm25_index_topk,
    )
    from btrdb_server_spark.functions.similarity import (
        ann_index_topk,
        ivf_index_build,
        ivf_index_retire,
    )

    docs = entry_mod.load_table(spark, SF, "documents")
    emb = entry_mod.load_table(spark, SF, "embeddings")

    b = str(tmp_path / "bm25")
    bm25_index_build(docs, b, buckets=16)
    bm25_index_retire(spark, b, [1, 8, 15])
    plan = plan_of(bm25_index_topk(spark, b, ["spark", "hash"], k=5))
    assert _re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", plan), plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan

    v = str(tmp_path / "ivf")
    ivf_index_build(emb, v, k=4)
    ivf_index_retire(spark, v, [3, 9])
    probe = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    plan = plan_of(ann_index_topk(spark, v, probe, k=5, nprobe=2))
    assert _re.search(r"PartitionFilters: \[[^\]]*cluster[^\]]*\]", plan), plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan

    p = str(tmp_path / "lsh")
    lsh_index_build(docs.where(F.col("doc_id") % 10 != 0), p)
    lsh_index_retire(spark, p, [11, 21])
    plan = plan_of(
        incremental_dedup_pairs(docs.where(F.col("doc_id") % 10 == 0), p)
    )
    assert plan.count("BroadcastHashJoin") >= 2  # tombstone anti + probe
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_pq_index_probe_prunes_cells_and_reads_codes_only(spark, tmp_path):
    """The persisted IVF-PQ probe must prune cell DIRECTORIES via the
    literal cluster predicate AND touch only the code column — the read
    schema carries (id, codes), never a raw vector column, which is the
    byte economics the compressed index exists for. The ADC itself is a
    row-local literal distance-table lookup (VERDICT r11 #1): on a
    never-retired index the serving plan is scan -> project ->
    TakeOrderedAndProject with ZERO Exchange and ZERO Join — no
    per-subspace row inflation, no shuffle on the hot path."""
    from btrdb_server_spark.functions.similarity import (
        ivf_index_build,
        pq_index_build,
        pq_index_topk,
    )

    emb = entry_mod.load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "pq_index")
    pq_index_build(emb, idx, k=4, m=4, k_codes=8, dim=64)
    probe = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    df = pq_index_topk(spark, idx, probe, k=5, nprobe=2)
    plan = plan_of(df)
    import re as _re

    assert _re.search(r"PartitionFilters: \[[^\]]*cluster[^\]]*\]", plan), plan
    assert "codes" in plan and "embedding" not in plan
    assert "Join" not in plan and "Exchange" not in plan, plan
    assert "TakeOrderedAndProject" in plan

    # bytes story: the compressed cells are a small fraction of the flat
    # IVF cells for the same corpus (codes vs raw vectors on disk)
    import os as _os

    flat = str(tmp_path / "ivf_index")
    ivf_index_build(emb, flat, k=4)

    def _bytes(root, match):
        tot = 0
        for dirpath, _dirs, files in _os.walk(root):
            if match in dirpath:
                tot += sum(
                    _os.path.getsize(_os.path.join(dirpath, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        return tot

    pq_bytes = _bytes(idx, "cells.gen0")
    flat_bytes = _bytes(flat, "cells.gen0")
    assert pq_bytes < flat_bytes / 3, (pq_bytes, flat_bytes)


def test_pq_index_build_is_map_only(spark):
    """Coarse assignment + PQ encoding must both run row-local against
    literal quantizer vectors: no join, no exchange — one map pass over
    the corpus (the docstring contract of pq_index_build)."""
    from btrdb_server_spark.functions.similarity import (
        _pq_assigned_codes,
        _pq_codebook_seed,
        centroids_from_rows,
    )

    emb = entry_mod.load_table(spark, SF, "embeddings")
    cents = sorted(
        centroids_from_rows(emb, k=4).collect(), key=lambda r: r["cid"]
    )
    cb_rows = _pq_codebook_seed(emb, 4, 8, "vec_id", "embedding", 64).collect()
    plan = plan_of(
        _pq_assigned_codes(emb, cents, cb_rows, 4, 16, "tinyint", "vec_id", "embedding")
    )
    assert "Join" not in plan
    assert "Exchange" not in plan
