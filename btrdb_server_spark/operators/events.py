"""Event-plane operators over the raw events table (beyond the points
projection): JSON property extraction and per-entity activity pivots.

The reference's data plane is (time, value) only — everything else lives in
stream metadata. A modern ingest feed carries typed envelopes (entity ids,
JSON property bags); these operators show the engine consuming that
envelope natively: JSON scalar extraction stays in JVM expressions
(get_json_object — no Python), and the per-entity pivot is a conditional
aggregation with a FIXED category list, so the plan is one
map-side-combined groupBy (a dynamic pivot would need a distinct-scan
first and break plan determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def props_histogram(
    events: DataFrame,
    json_col: str = "props",
    field: str = "k",
    type_col: str = "event_type",
) -> DataFrame:
    """Distribution of a JSON property per event type: one row per
    (event_type, value-of-field) with its count — the cardinality /
    skew probe run before choosing a partition key for a new feed.
    Columns: event_type, k (extracted int), cnt. All-integer output,
    engine-exact; ordered by (event_type, k)."""
    k = F.get_json_object(F.col(json_col), f"$.{field}").cast("long")
    return (
        events.select(F.col(type_col).alias("event_type"), k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type", "k")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type", "k")
    )


def user_activity(
    events: DataFrame,
    types: tuple[str, ...] = ("click", "view", "purchase", "signup", "error"),
    value_quantum: float = 0.01,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user activity profile: event counts per type (fixed category
    list -> static conditional aggregation, one shuffle) plus the exact
    total value in quantum units. The feature row a personalization or
    abuse model consumes. Columns: user_id, n_<type>..., total_q (int64
    quantum units — exactly associative), n_events."""
    aggs = [
        F.coalesce(
            F.sum(F.when(F.col(type_col) == t, F.lit(1))), F.lit(0)
        ).alias(f"n_{t}")
        for t in types
    ]
    aggs.append(
        F.sum(F.round(F.col("value") / F.lit(value_quantum)).cast("long")).alias(
            "total_q"
        )
    )
    aggs.append(F.count("*").alias("n_events"))
    return (
        events.groupBy(F.col(user_col).alias("user_id"))
        .agg(*aggs)
        .orderBy("user_id")
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed steps[0], then
    steps[1] STRICTLY AFTER their first steps[0], then steps[2] strictly
    after that, ... One row per step: (step, event_type, users), users
    monotonically non-increasing — the activation/conversion readout of
    an event feed.

    Semantics: t_1 = min ts of step 1; t_k = min ts of step k with
    ts > t_{k-1}. A user counts for step k iff t_k exists. Strictly
    sequential (each later event must be after the user's EARLIEST
    qualifying previous step), the standard window-less funnel definition.
    With `within` set (same units as ts_col — e.g. an INTERVAL-free
    integer when ts is numeric), every later step must ALSO land at or
    before t_1 + within: the windowed-conversion variant ("purchased
    within 7 days of first view"). The first-step time threads through
    the per-step aggregates, so the window costs no extra shuffle.

    Scale shape: one groupBy(user) per step plus one join per transition —
    every shuffle is keyed on the same user column, so the exchanges
    co-partition and the per-step subplans are reused across the final
    union (ReuseExchange); no window sorts, no per-user event collection.
    All-integer output, engine-exact."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    user, ts = F.col(user_col), F.col(ts_col)
    stages = []
    prev = (
        events.where(F.col(type_col) == F.lit(steps[0]))
        .groupBy(user.alias("u"))
        .agg(F.min(ts).alias("t"))
        .select("u", "t", F.col("t").alias("t1"))
    )
    stages.append(prev)
    for st in steps[1:]:
        cond = F.col("ets") > F.col("t")
        if within is not None:
            cond = cond & (F.col("ets") <= F.col("t1") + F.lit(within))
        nxt = (
            events.where(F.col(type_col) == F.lit(st))
            .select(user.alias("u"), ts.alias("ets"))
            .join(prev, "u")
            .where(cond)
            .groupBy("u")
            # t1 is functionally dependent on u; min() carries it exactly
            .agg(F.min("ets").alias("t"), F.min("t1").alias("t1"))
        )
        stages.append(nxt)
        prev = nxt
    counts = [
        s.agg(F.count("*").alias("users")).select(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(name).alias("event_type"),
            F.col("users"),
        )
        for i, (name, s) in enumerate(zip(steps, stages))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out.orderBy("step")


def retention_cohorts(
    events: DataFrame,
    anchor: int,
    week_ns: int = 7 * 86_400_000_000_000,
    time_col: str = "time",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly retention triangle: cohort_week = the week (since `anchor`)
    of each user's first event; for every later week they were active,
    one (cohort_week, week_offset, users) row — the classic cohort
    retention table. `time_col` is int64 epoch ns (see
    sources.testdata.epoch_ns_expr for the events table).

    Scale shape: (user, week) pairs are distinct-ed first (map-side
    combine collapses each user-week to one row before the shuffle), the
    cohort assignment is a groupBy(user) min over that already-tiny set,
    and the join back is keyed on the same user column — co-partitioned
    with the distinct's exchange. The final count(*) equals distinct
    users per cell because the join's left side is already unique per
    (user, week). All-integer output, engine-exact."""
    uw = (
        events.where(F.col(time_col) >= F.lit(anchor))
        .select(
            F.col(user_col).alias("u"),
            # int64 div, not double /: a year of ns exceeds 2^53 and a
            # float quotient can mis-bucket a boundary point.
            F.expr(f"({time_col} - {anchor}L) div {week_ns}L").alias("week"),
        )
        .distinct()
    )
    cohort = uw.groupBy("u").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "u")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("users"))
        .orderBy("cohort_week", "week_offset")
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence: one row per (from_type, to_type) with the number of times a
    user's event of from_type was IMMEDIATELY followed by to_type — the
    path-analysis matrix behind "where do users go after a view?". The
    per-user order is (ts, event_id), so a duplicate-timestamp tie
    resolves deterministically by the unique event id.

    Scale shape: one window shuffle partitioned by user (per-user event
    counts bound the sort — the same key and skew profile as
    sessionization), then a map-side-combined groupBy on the tiny
    (type x type) key domain. All-integer output, engine-exact."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    nx = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    )
    return (
        nx.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("from_type", "to_type")
    )


def dau_wau(
    events: DataFrame,
    anchor: int,
    day_ns: int = 86_400_000_000_000,
    time_col: str = "time",
    user_col: str = "user_id",
) -> DataFrame:
    """Daily/weekly active users and the DAU/WAU stickiness ratio per
    active day — the engagement dashboard row. WAU at day d counts
    distinct users active in the trailing 7-day window [d-6, d],
    computed WITHOUT a range join: each distinct (user, day) pair
    explodes to the 7 days it covers and a countDistinct per covered day
    does the rest (fan-out exactly 7; both aggregations map-side
    combine). Output restricted to days with activity. stickiness =
    dau / wau, one double division over exact counts. Columns: day,
    dau, wau, stickiness; ordered by day. `time_col` is int64 epoch ns
    (see sources.testdata.epoch_ns_expr)."""
    ud = (
        events.where(F.col(time_col) >= F.lit(anchor))
        .select(
            F.col(user_col).alias("u"),
            F.expr(f"({time_col} - {anchor}L) div {day_ns}L").alias("day"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds both the dau and wau aggs
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    cover = ud.select(
        "u", F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6))).alias("day")
    )
    wau = cover.groupBy("day").agg(F.countDistinct("u").alias("wau"))
    stick = F.col("dau").cast("double") / F.col("wau").cast("double")
    return (
        dau.join(wau, "day")
        .select("day", "dau", "wau", stick.alias("stickiness"))
        .orderBy("day")
    )


def transition_lift(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov transition LIFT: for every (from_type, to_type) edge of the
    next-event matrix, how much more likely to_type is right after
    from_type than in general —

        lift = P(to|from) / P(to) = (n_ft * n) / (n_f * n_t)

    with n_ft the transition count, n_f the from-marginal (outgoing),
    n_t the to-marginal (incoming), n the total transition count — the
    "what does a view actually drive" reading of event_transitions.
    Every factor is an exact int64 count; lift is one double expression:
    bit-identical in any engine.

    Scale shape: one window shuffle per user (shared with
    event_transitions' plan shape), one tiny groupBy on the (type x
    type) domain, then marginals and total derive from THAT tiny table —
    no second pass over the events. Columns: from_type, to_type, cnt,
    lift; ordered by (from_type, to_type)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)  # tiny; feeds marginals + total
    )
    nf = pairs.groupBy("from_type").agg(F.sum("cnt").alias("n_f"))
    nt = pairs.groupBy("to_type").agg(F.sum("cnt").alias("n_t"))
    total = pairs.agg(F.sum("cnt").alias("n"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        pairs.join(nf, "from_type")
        .join(nt, "to_type")
        .crossJoin(F.broadcast(total))
        .select(
            "from_type",
            "to_type",
            "cnt",
            ((d("cnt") * d("n")) / (d("n_f") * d("n_t"))).alias("lift"),
        )
        .orderBy("from_type", "to_type")
    )


def attribution_last_touch(
    events: DataFrame,
    conversion: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    within: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "time",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: for every conversion event, the user's most
    recent touch event (any of `touch_types`) STRICTLY BEFORE it — the
    "which click gets credit for this purchase" join of marketing
    analytics. With `within` set (same units as time_col), touches older
    than `within` before the conversion leave it unattributed (NULL touch
    columns). Ties (several touches at one timestamp) resolve to the
    highest event id; a conversion at the exact timestamp of a touch does
    NOT credit it (strictly before).

    Scale shape: an as-of join expressed as ONE ordered carry per user —
    union the (filtered) touch and conversion rows, sort each user's
    slice by (time, kind, id) with conversions BEFORE touches at equal
    times, and take last(touch, ignorenulls) over the strictly-preceding
    frame. One window shuffle keyed on user (bounded per-user groups, the
    sessionization skew profile), no join, no per-user collection.
    Columns: event_id, conv_time, touch_event_id, touch_type, touch_time,
    latency (all int64, touch_* NULL when unattributed); ordered by
    event_id. Mirrors the reference's nearest-point (backward) semantics
    on the event plane (engine.go Nearest / qtree.go FindNearestValue)."""
    from pyspark.sql import Window

    user, typ = F.col(user_col), F.col(type_col)
    src = events.where(typ.isin(conversion, *touch_types)).select(
        user.alias("u"),
        F.col(time_col).alias("t"),
        F.col(id_col).alias("eid"),
        typ.alias("et"),
        # At equal t: conversions (0) sort before touches (1), so the
        # strictly-preceding frame never admits an equal-time touch.
        F.when(typ == F.lit(conversion), F.lit(0)).otherwise(F.lit(1)).alias("kind"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy("t", "kind", "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("kind") == 1, F.struct(F.col("t"), F.col("eid"), F.col("et"))
    )
    carried = src.select(
        "*", F.last(touch, ignorenulls=True).over(w).alias("lt")
    ).where(F.col("kind") == 0)
    ok = F.col("lt").isNotNull()
    if within is not None:
        ok = ok & (F.col("t") - F.col("lt.t") <= F.lit(within))
    return carried.select(
        F.col("eid").alias("event_id"),
        F.col("t").alias("conv_time"),
        F.when(ok, F.col("lt.eid")).alias("touch_event_id"),
        F.when(ok, F.col("lt.et")).alias("touch_type"),
        F.when(ok, F.col("lt.t")).alias("touch_time"),
        F.when(ok, F.col("t") - F.col("lt.t")).alias("latency"),
    ).orderBy("event_id")


def time_to_convert(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "time",
) -> DataFrame:
    """Conversion-latency distribution: per user, the time from their
    FIRST from_type event to their first to_type event STRICTLY AFTER it
    (the funnel's step-2 latency); then exact type-1 percentiles of those
    per-user latencies (see derive.exact_percentiles). The "how long does
    a view take to become a purchase" readout. All-integer output,
    engine-exact. Columns: n_converted, lat_min, lat_max, p<q>...; one
    row.

    Scale shape: two map-side-combined groupBy(user) minima joined on the
    user key (co-partitioned exchanges), then the histogram-cumulation
    selection on the latency value domain — no window over event rows."""
    from btrdb_server_spark.operators.derive import exact_percentiles

    user, typ, t = F.col(user_col), F.col(type_col), F.col(time_col)
    first_from = (
        events.where(typ == F.lit(from_type))
        .groupBy(user.alias("u"))
        .agg(F.min(t).alias("t0"))
    )
    lat = (
        events.where(typ == F.lit(to_type))
        .select(user.alias("u"), t.alias("t1"))
        .join(first_from, "u")
        .where(F.col("t1") > F.col("t0"))
        .groupBy("u")
        .agg(F.min(F.col("t1") - F.col("t0")).alias("lat"))
        .select("lat")
    )
    return exact_percentiles(
        lat, "lat", qs, n_label="n_converted", min_label="lat_min",
        max_label="lat_max",
    )


def user_rfm(
    events: DataFrame,
    anchor_end: int,
    value_quantum: float = 0.01,
    user_col: str = "user_id",
    time_col: str = "time",
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation: per user the ns
    since their last event, their event count, and their exact
    quantum-unit value total, each scored 1-5 against the POPULATION's
    exact type-1 quintile boundaries (20/40/60/80th percentiles) —
    the classic customer-value grid. score = 1 + #(boundaries strictly
    below the value); recency is reversed (fresher = higher). Ties share
    a score, so the output is engine-exact with no ordering ambiguity.

    Scale shape: one map-side-combined groupBy(user), then each metric's
    quintile boundaries come from derive.exact_percentiles (value-domain
    histogram cumulation) and broadcast back as ONE row — no global-sort
    ntile window, which would funnel the whole user table through a
    single partition. Columns: user_id, recency, frequency, monetary_q,
    r_score, f_score, m_score, rfm (r*100+f*10+m); ordered by user_id."""
    from btrdb_server_spark.operators.derive import exact_percentiles

    qs = (0.2, 0.4, 0.6, 0.8)
    q = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    u = (
        events.where(F.col(time_col) < F.lit(anchor_end))
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            (F.lit(anchor_end) - F.max(time_col)).alias("recency"),
            F.count("*").alias("frequency"),
            F.sum(q).alias("monetary_q"),
        )
    )
    out = u
    for metric in ("recency", "frequency", "monetary_q"):
        b = exact_percentiles(u.select(metric), metric, qs).select(
            *[F.col(f"p{int(q_ * 100)}").alias(f"_{metric}_b{i}") for i, q_ in enumerate(qs)]
        )
        out = out.crossJoin(F.broadcast(b))

    def score_high(metric: str):
        s = F.lit(1)
        for i in range(4):
            s = s + F.when(F.col(metric) > F.col(f"_{metric}_b{i}"), 1).otherwise(0)
        return s.cast("long")

    r_score = (F.lit(6) - score_high("recency")).alias("r_score")
    f_score = score_high("frequency").alias("f_score")
    m_score = score_high("monetary_q").alias("m_score")
    return (
        out.select(
            "user_id", "recency", "frequency", "monetary_q",
            r_score, f_score, m_score,
        )
        .withColumn(
            "rfm",
            (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")),
        )
        .orderBy("user_id")
    )


def top_paths(
    events: DataFrame,
    depth: int = 5,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common user journeys: each user's first `depth` events (by
    time, event id breaking ties) concatenated into a '>'-joined path
    string, ranked by how many users walked it — the path-analysis readout
    behind "what do people do right after signup?". Columns:
    (path, users), top k by users desc then path asc (deterministic).

    Scale shape: ONE window sort keyed by user (rank within user), then two
    map-side-combined groupBys; per-user work is bounded by `depth`, and
    user cardinality keeps the window partitions small and many — no skew
    amplification at 100x. The per-user sequence is rebuilt with
    array_sort(struct(rn, type)) rather than relying on collect_list
    order (which Spark does not guarantee)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    first_n = (
        events.select(user_col, type_col, ts_col, id_col)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= depth)
    )
    paths = first_n.groupBy(user_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", F.col(type_col).alias("t")))),
                lambda s: s["t"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("users"))
        .orderBy(F.col("users").desc(), "path")
        .limit(k)
    )


def markov_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Predictability of the event feed as two numbers: the conditional
    entropy rate H(next | current) = -Σ_{u,v} p(u,v)·log2 p(v|u) of the
    first-order Markov chain over event types, and the marginal entropy
    H(next) — their gap is exactly the information the previous event
    carries about the next one (how "sticky" the journeys are). One row:
    n_trans, n_states, h_cond, h_marg.

    Exactness: counts are integers; the float work is a SORTED fold over
    the (from, to) term list (~|types|² rows, metadata-scale), so the
    summation order is fixed and the result bit-identical in any engine —
    the same fixed-order-fold discipline as ewma/holt, needed here
    because -x·log2(y) terms are not associatively safe. log2 runs
    through the libm pandas_udf (JVM Math.log is 1-ulp off libm on some
    inputs — surfaced at sf0.001; the terms are metadata-scale rows).

    Scale shape: identical to event_transitions (one user-keyed window,
    one tiny groupBy); everything after the count matrix is a single-row
    fold over a type²-sized array."""
    from btrdb_server_spark.utils import libm_log2

    # strict: inputs are cnt/cu and cv/t with every count >= 1 (observed
    # transitions only)
    _log2 = libm_log2(strict=True)  # libm shim; raises on nonpositive

    tr = event_transitions(events, user_col, type_col, ts_col, id_col)
    from_tot = tr.groupBy("from_type").agg(F.sum("cnt").alias("cu"))
    to_tot = tr.groupBy("to_type").agg(F.sum("cnt").alias("cv"))
    tot = tr.agg(F.sum("cnt").alias("t"), F.count("*").alias("n_cells"))
    terms = (
        tr.join(F.broadcast(from_tot), "from_type")
        .join(F.broadcast(to_tot), "to_type")
        .crossJoin(F.broadcast(tot))
        .select(
            F.struct(
                "from_type",
                "to_type",
                (
                    -(F.col("cnt").cast("double") / F.col("t"))
                    * _log2(F.col("cnt").cast("double") / F.col("cu"))
                ).alias("hc"),
                "cv",
                "cnt",
                "t",
            ).alias("s")
        )
    )
    folded = terms.agg(
        F.array_sort(F.collect_list("s")).alias("arr"),
        F.sum("s.cnt").alias("n_trans"),
    )
    hc = F.aggregate(
        F.col("arr"), F.lit(0.0), lambda acc, x: acc + x["hc"]
    )
    # marginal: one term per distinct to_type — dedupe via the sorted
    # distinct cv list keyed by to_type
    marg = (
        to_tot.crossJoin(F.broadcast(tot))
        .select(
            F.struct(
                "to_type",
                (
                    -(F.col("cv").cast("double") / F.col("t"))
                    * _log2(F.col("cv").cast("double") / F.col("t"))
                ).alias("hm"),
            ).alias("s")
        )
        .agg(
            F.array_sort(F.collect_list("s")).alias("marr"),
            F.count("*").alias("n_states"),
        )
    )
    hm = F.aggregate(
        F.col("marr"), F.lit(0.0), lambda acc, x: acc + x["hm"]
    )
    return folded.crossJoin(F.broadcast(marg)).select(
        F.col("n_trans"),
        F.col("n_states"),
        hc.alias("h_cond"),
        hm.alias("h_marg"),
    )


def ab_experiment(
    events: DataFrame,
    split_ns: int,
    start: int,
    end: int,
    metric_type: str = "purchase",
    salt: str = "ab",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_quantum: float = 0.01,
) -> DataFrame:
    """One-stop A/B experiment readout over the event feed: users are
    hash-assigned to two arms (salted md5 — deterministic, no RNG state),
    X = each user's pre-period metric total (ts < split_ns), Y = the
    experiment-period total (ts >= split_ns). Per arm: n, mean_x, mean_y,
    and the CUPED-adjusted mean  mean_y - θ·(mean_x - mean_x_overall)
    with θ = cov(X,Y)/var(X) pooled — the industry-standard variance
    reduction — plus the sample-ratio-mismatch chi² (detects broken
    assignment before anyone reads the metric). Columns: arm, n, mean_x,
    mean_y, mean_y_adj, theta, srm_chi2; 2 rows.

    Exactness: X/Y are exact integer quantum totals; θ uses the raw-sums
    form (N·Sxy − Sx·Sy)/(N·Sxx − Sx²) — integer numerators in
    decimal(38,0), ONE double division; every emitted double is a fixed
    op sequence over exact integers (mirrored by the oracle).

    Scale shape: one groupBy(user) with conditional aggregation builds the
    per-user (X, Y) table; everything after runs on 1-row/2-row moment
    frames, cross-joined broadcast."""
    from btrdb_server_spark.sources.testdata import epoch_ns_expr

    t = epoch_ns_expr(events, ts_col)
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    per_user = (
        events.where(
            (F.col(type_col) == F.lit(metric_type))
            & (t >= F.lit(start))
            & (t < F.lit(end))
        )
        .select(
            F.col(user_col).alias("u"),
            F.when(t < F.lit(split_ns), vq).otherwise(F.lit(0)).alias("xq"),
            F.when(t >= F.lit(split_ns), vq).otherwise(F.lit(0)).alias("yq"),
        )
        .groupBy("u")
        .agg(F.sum("xq").alias("x"), F.sum("yq").alias("y"))
        .select(
            "u",
            "x",
            "y",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(salt), F.col("u"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pooled = per_user.agg(
        F.count("*").alias("n_all"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    theta = (
        (d("n_all") * d("sxy") - d("sx") * d("sy"))
        / (d("n_all") * d("sxx") - d("sx") * d("sx"))
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("x").alias("ax"), F.sum("y").alias("ay")
    )
    q = float(round(1.0 / value_quantum))
    j = arms.crossJoin(F.broadcast(pooled))
    mean_x = d("ax") / d("n") / F.lit(q)
    mean_y = d("ay") / d("n") / F.lit(q)
    gmean_x = d("sx") / d("n_all") / F.lit(q)
    e = d("n_all") / F.lit(2.0)
    chi_term = (d("n") - e) * (d("n") - e) / e
    out = j.select(
        "arm",
        "n",
        mean_x.alias("mean_x"),
        mean_y.alias("mean_y"),
        (mean_y - theta * (mean_x - gmean_x)).alias("mean_y_adj"),
        theta.alias("theta"),
        chi_term.alias("chi_term"),
    )
    chi2 = out.agg(F.sum("chi_term").alias("srm_chi2"))
    return (
        out.crossJoin(F.broadcast(chi2))
        .select("arm", "n", "mean_x", "mean_y", "mean_y_adj", "theta", "srm_chi2")
        .orderBy("arm")
    )


def welch_ttest(
    events: DataFrame,
    split_ns: int,
    start: int,
    end: int,
    metric_type: str = "purchase",
    salt: str = "ab",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_quantum: float = 0.01,
) -> DataFrame:
    """Welch's unequal-variance t-test between the two hash arms of
    ab_experiment, on the experiment-period per-user totals: t statistic
    and Welch-Satterthwaite degrees of freedom — the significance readout
    next to the effect size. One row: n_a, n_b, mean_a, mean_b, t_stat,
    df.

    Exactness: per-arm n, Σy, Σy² are exact integers (decimal(38,0));
    sample variance, t and df are fixed double op sequences over them,
    mirrored by the oracle. Scale shape: one groupBy(user), one 2-row
    aggregate."""
    from btrdb_server_spark.sources.testdata import epoch_ns_expr

    t = epoch_ns_expr(events, ts_col)
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    per_user = (
        events.where(
            (F.col(type_col) == F.lit(metric_type))
            & (t >= F.lit(split_ns))
            & (t < F.lit(end))
        )
        .select(F.col(user_col).alias("u"), vq.alias("yq"))
        .groupBy("u")
        .agg(F.sum("yq").alias("y"))
        .select(
            "y",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(salt), F.col("u"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a = arms.where(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("sy").alias("sy_a"), F.col("syy").alias("syy_a")
    )
    b = arms.where(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("sy").alias("sy_b"), F.col("syy").alias("syy_b")
    )
    j = a.crossJoin(F.broadcast(b))
    q = float(round(1.0 / value_quantum))
    mean_a = d("sy_a") / d("n_a") / F.lit(q)
    mean_b = d("sy_b") / d("n_b") / F.lit(q)
    var_a = (
        (d("syy_a") - d("sy_a") * d("sy_a") / d("n_a"))
        / (d("n_a") - F.lit(1.0))
        / F.lit(q * q)
    )
    var_b = (
        (d("syy_b") - d("sy_b") * d("sy_b") / d("n_b"))
        / (d("n_b") - F.lit(1.0))
        / F.lit(q * q)
    )
    se2a = var_a / d("n_a")
    se2b = var_b / d("n_b")
    t_stat = (mean_a - mean_b) / F.sqrt(se2a + se2b)
    df = (
        (se2a + se2b)
        * (se2a + se2b)
        / (
            se2a * se2a / (d("n_a") - F.lit(1.0))
            + se2b * se2b / (d("n_b") - F.lit(1.0))
        )
    )
    return j.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        t_stat.alias("t_stat"),
        df.alias("df"),
    )


def gini_spend(
    events: DataFrame,
    start: int,
    end: int,
    metric_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_quantum: float = 0.01,
) -> DataFrame:
    """Gini coefficient of per-user spend concentration — "do 1% of users
    drive 99% of revenue?" — from the sorted-rank identity
    G = 2·Σ i·y₍ᵢ₎ / (n·Σy) − (n+1)/n over the ranked per-user totals.
    One row: n_users, total, gini.

    Exactness: per-user totals and the rank-weighted sum Σ i·y₍ᵢ₎ are
    exact integers (decimal(38,0); ranks ordered by (total, user) so ties
    break deterministically); the Gini is a fixed 4-op double sequence.
    Scale shape: one groupBy(user), one rank window over the USER-count
    table (not events), one 1-row aggregate."""
    from pyspark.sql import Window as W

    from btrdb_server_spark.sources.testdata import epoch_ns_expr

    t = epoch_ns_expr(events, ts_col)
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    per_user = (
        events.where(
            (F.col(type_col) == F.lit(metric_type))
            & (t >= F.lit(start))
            & (t < F.lit(end))
        )
        .select(F.col(user_col).alias("u"), vq.alias("yq"))
        .groupBy("u")
        .agg(F.sum("yq").alias("y"))
    )
    w = W.orderBy("y", "u")
    ranked = per_user.select(
        "y", F.row_number().over(w).cast("long").alias("i")
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("ty"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("y")).alias("iy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    q = float(round(1.0 / value_quantum))
    gini = (
        F.lit(2.0) * d("iy") / (d("n") * d("ty"))
        - (d("n") + F.lit(1.0)) / d("n")
    )
    return agg.select(
        F.col("n").alias("n_users"),
        (d("ty") / F.lit(q)).alias("total"),
        gini.alias("gini"),
    )


def kaplan_meier(
    events: DataFrame,
    start: int,
    end: int,
    churn_gap_ns: int = 604_800_000_000_000,  # 7 days
    day_ns: int = 86_400_000_000_000,
    metric_type: str | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime: per user, lifetime =
    last activity − first activity (whole days); a user has CHURNED
    (event observed) if their last activity is more than churn_gap before
    the range end, else they are right-censored — the standard retention
    curve that, unlike naive "days active" averages, handles censoring
    correctly. One row per distinct lifetime with an observed churn:
    (t_days, n_risk, n_churn, survival), survival = Π_{t'<=t}
    (1 − d_{t'}/n_{t'}).

    Exactness: lifetimes, risk sets and churn counts are integers; the
    KM product is a SORTED fold over the (few) distinct-lifetime factors,
    each factor a fixed 3-op double — engine-exact like every other
    sequential fold here.

    Scale shape: one groupBy(user) (min/max), one groupBy(lifetime), a
    cumulative window over the distinct-lifetime table, a 1-row fold."""
    from pyspark.sql import Window as W

    from btrdb_server_spark.sources.testdata import epoch_ns_expr

    t = epoch_ns_expr(events, ts_col)
    cond = (t >= F.lit(start)) & (t < F.lit(end))
    if metric_type is not None:
        # lifetime on a sparse activity type (e.g. purchases): a feed
        # where every user pings daily has no churners on the full stream
        cond = cond & (F.col(type_col) == F.lit(metric_type))
    per_user = (
        events.where(cond)
        .select(F.col(user_col).alias("u"), t.alias("t"))
        .groupBy("u")
        .agg(F.min("t").alias("first_t"), F.max("t").alias("last_t"))
        .select(
            F.expr(f"(last_t - first_t) div {day_ns}").alias("life"),
            (F.col("last_t") < F.lit(end - churn_gap_ns)).alias("churned"),
        )
    )
    by_life = per_user.groupBy("life").agg(
        F.count("*").alias("n_at"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d"),
    )
    # risk set: users with lifetime >= t (they were "alive" through t)
    w = W.orderBy(F.col("life").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = by_life.select(
        "life", "d", F.sum("n_at").over(w).alias("n_risk")
    ).where(F.col("d") > 0)
    # sorted product fold over the (life, factor) table
    factor = F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double")
    folded = risk.select(
        F.struct("life", factor.alias("f"), "d", "n_risk").alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("arr"))
    # running product per row: emit (life, n_risk, d, survival) by folding
    # prefixes — the array is distinct-lifetime-sized, so the quadratic
    # prefix replay is metadata-scale.
    rows = folded.select(
        F.explode(
            F.transform(
                F.col("arr"),
                lambda s, i: F.struct(
                    s["life"].alias("t_days"),
                    s["n_risk"].alias("n_risk"),
                    s["d"].alias("n_churn"),
                    F.aggregate(
                        F.slice(F.col("arr"), 1, i + 1),
                        F.lit(1.0),
                        lambda acc, x: acc * x["f"],
                    ).alias("survival"),
                ),
            )
        ).alias("r")
    )
    return rows.select("r.t_days", "r.n_risk", "r.n_churn", "r.survival").orderBy(
        "t_days"
    )


def cohort_ltv(
    events: DataFrame,
    start: int,
    week_ns: int = 604_800_000_000_000,
    metric_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_quantum: float = 0.01,
) -> DataFrame:
    """Cohort lifetime-value triangle: users grouped by FIRST-ACTIVITY
    week, each cohort's per-user cumulative metric revenue tracked by
    week offset — the growth-accounting companion to retention_cohorts
    (which counts comebacks; this one sums what they spend). One row per
    (cohort_week, week_offset): n_users, rev, cum_ltv.

    Exactness: revenue totals are integer quantum sums; the cumulative is
    an int64 running sum over the tiny (cohort × offset) table; cum_ltv
    is one double division per row. Scale shape: one groupBy(user) for
    cohort assignment, one broadcast join back, one map-side groupBy on
    the (cohort, offset) key, one window over the triangle table."""
    from pyspark.sql import Window as W

    from btrdb_server_spark.sources.testdata import epoch_ns_expr

    t = epoch_ns_expr(events, ts_col)
    firsts = (
        events.select(F.col(user_col).alias("u"), t.alias("t"))
        .groupBy("u")
        .agg(F.min("t").alias("first_t"))
        .select(
            "u", F.expr(f"(first_t - ({start})) div {week_ns}").alias("cohort_week")
        )
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("n_users"))
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    rev = (
        events.where(F.col(type_col) == F.lit(metric_type))
        .select(
            F.col(user_col).alias("u"),
            (t - F.lit(start)).alias("off_ns"),
            vq.alias("vq"),
        )
        .join(F.broadcast(firsts), "u")
        .select(
            "cohort_week",
            (
                F.expr(f"off_ns div {week_ns}") - F.col("cohort_week")
            ).alias("week_offset"),
            "vq",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("vq").alias("rev_q"))
    )
    w = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    q = float(round(1.0 / value_quantum))
    return (
        rev.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            (F.col("rev_q").cast("double") / F.lit(q)).alias("rev"),
            F.sum("rev_q").over(w).alias("cum_q"),
        )
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            "rev",
            (
                F.col("cum_q").cast("double")
                / F.col("n_users").cast("double")
                / F.lit(q)
            ).alias("cum_ltv"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def uplift_quintiles(
    events: DataFrame,
    split_ns: int,
    start: int,
    end: int,
    metric_type: str = "purchase",
    salt: str = "ab",
    n_bins: int = 5,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_quantum: float = 0.01,
) -> DataFrame:
    """Heterogeneous treatment effect readout: users bucketed into
    quintiles of their PRE-period metric total (exact type-1 cut points),
    then per (quintile, arm) the experiment-period mean — the uplift
    column answers "does the effect concentrate in heavy or light users?"
    One row per quintile: qbin, n_a, n_b, mean_y_a, mean_y_b, uplift.

    Exactness: cut points are order-statistic picks on the integer X
    histogram; per-cell sums are integers; means and the uplift are fixed
    double sequences. Scale shape: one groupBy(user), a value-domain cut
    window, broadcast cuts, one tiny (bins × arms) aggregate."""
    from pyspark.sql import Window as W

    from btrdb_server_spark.sources.testdata import epoch_ns_expr

    t = epoch_ns_expr(events, ts_col)
    vq = F.round(F.col("value") / F.lit(value_quantum)).cast("long")
    per_user = (
        events.where(
            (F.col(type_col) == F.lit(metric_type))
            & (t >= F.lit(start))
            & (t < F.lit(end))
        )
        .select(
            F.col(user_col).alias("u"),
            F.when(t < F.lit(split_ns), vq).otherwise(F.lit(0)).alias("xq"),
            F.when(t >= F.lit(split_ns), vq).otherwise(F.lit(0)).alias("yq"),
        )
        .groupBy("u")
        .agg(F.sum("xq").alias("x"), F.sum("yq").alias("y"))
        .select(
            "x",
            "y",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(salt), F.col("u"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
        )
    )
    h = per_user.groupBy("x").agg(F.count("*").alias("c"))
    w = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = h.select("x", F.sum("c").over(w).alias("cum"))
    tot = h.agg(F.sum("c").alias("n"))
    picks = [
        F.min(
            F.when(
                F.col("cum")
                >= F.ceil(F.col("n").cast("double") * F.lit(k / n_bins)),
                F.col("x"),
            )
        ).alias(f"c{k}")
        for k in range(1, n_bins)
    ]
    cuts = cum.crossJoin(F.broadcast(tot)).groupBy("n").agg(*picks)
    qbin = None
    for k in range(1, n_bins):
        term = F.when(F.col("x") >= F.col(f"c{k}"), F.lit(1)).otherwise(F.lit(0))
        qbin = term if qbin is None else qbin + term
    cells = (
        per_user.crossJoin(F.broadcast(cuts))
        .select(qbin.cast("long").alias("qbin"), "arm", "y")
        .groupBy("qbin")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("sy_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("sy_b"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    q = float(round(1.0 / value_quantum))
    # try_divide: an empty (quintile, arm) cell — real under user skew or
    # tiny windows — yields NULL, matching DuckDB's x/0.0 semantics,
    # instead of an ANSI DIVIDE_BY_ZERO abort of the whole readout.
    mean_a = F.try_divide(d("sy_a"), d("n_a")) / F.lit(q)
    mean_b = F.try_divide(d("sy_b"), d("n_b")) / F.lit(q)
    return cells.select(
        "qbin",
        "n_a",
        "n_b",
        mean_a.alias("mean_y_a"),
        mean_b.alias("mean_y_b"),
        (mean_a - mean_b).alias("uplift"),
    ).orderBy("qbin")


def dormancy_stats(
    events: DataFrame,
    start: int,
    end: int,
    dormant_ns: int = 604_800_000_000_000,  # 7 days
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Dormancy/winback readout: each user's LONGEST silence between
    consecutive events in the range; how many users went dormant (silence
    >= dormant_ns) yet came back, plus exact type-1 percentiles of the
    max-silence distribution — the re-engagement sizing number ("how many
    winback emails would have fired?"). One row: n_users, n_dormant,
    g_min, g_max, p50/p90/p99 (ns).

    Exactness: gaps and their max are integers; the percentile machinery
    is exact_percentiles (operators/derive.py) on the per-user max-gap
    table. Scale shape: one user-keyed lag window (same key/skew profile
    as sessionization), one groupBy(user) max, then value-domain-scale
    percentile selection."""
    from pyspark.sql import Window as W

    from btrdb_server_spark.operators.derive import exact_percentiles
    from btrdb_server_spark.sources.testdata import epoch_ns_expr

    t = epoch_ns_expr(events, ts_col)
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    gaps = (
        events.where((t >= F.lit(start)) & (t < F.lit(end)))
        .select(
            F.col(user_col).alias("u"),
            (t - F.lag(t).over(w)).alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    per_user = gaps.groupBy("u").agg(F.max("g").alias("maxg"))
    pct = exact_percentiles(
        per_user.select(F.col("maxg").alias("v")), "v", qs,
        n_label="n_users", min_label="g_min", max_label="g_max",
    )
    dorm = per_user.agg(
        F.sum(F.when(F.col("maxg") >= F.lit(dormant_ns), 1).otherwise(0)).alias(
            "n_dormant"
        )
    )
    return pct.crossJoin(F.broadcast(dorm)).select(
        "n_users", "n_dormant", "g_min", "g_max",
        *[f"p{q * 100:g}".replace(".", "_") for q in qs],
    )


def frequent_sequences(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Most frequent length-`n` CONSECUTIVE event sequences across all
    user streams (sliding window, time order with event-id tiebreak) —
    the behavioral-motif miner behind "what three-step pattern precedes
    churn". Unlike top_paths (each user's first events once), every
    position in every stream contributes one n-gram.

    Pure integer counts; top-k by count desc then sequence asc — fully
    deterministic. Scale shape: one user-keyed window sort (partitions
    bounded by per-user activity), n-1 lead taps, one map-side-combined
    groupBy; TakeOrderedAndProject for the top-k. Columns: seq, cnt."""
    if n < 2:
        raise ValueError("need n >= 2")
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cols = [F.col(type_col)]
    df = events.select(user_col, type_col, ts_col, id_col)
    for j in range(1, n):
        df = df.withColumn(f"e{j}", F.lead(type_col, j).over(w))
        cols.append(F.col(f"e{j}"))
    grams = df.where(F.col(f"e{n-1}").isNotNull()).select(
        F.array_join(F.array(*cols), ">").alias("seq")
    )
    return (
        grams.groupBy("seq")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "seq")
        .limit(k)
    )


def power_users(
    events: DataFrame,
    decile: int = 10,
    user_col: str = "user_id",
) -> DataFrame:
    """Activity concentration (the Pareto readout): what share of all
    events comes from the top 1/`decile` most active users. k =
    max(1, n_users div decile); the cut is by event count desc (ties at
    the threshold all contribute the threshold count, so the result is
    rank-tiebreak-independent). share is ONE division of exact int64
    sums.

    Scale shape: NO global user sort — the per-user counts collapse to a
    count-of-counts table (activity-value domain, tiny), the k-th-user
    threshold T is read off its descending cumulative, and
    top_events = sum(c * n_c for c > T) + (k - users_above) * T (every
    user tied AT the threshold contributes exactly T, so the rank
    tiebreak cannot change the sum). One map-side-combined per-user
    count, one domain-scale window, three scalar reduces. Columns:
    n_users, k, top_events, total_events, share."""
    if decile < 2:
        raise ValueError("need decile >= 2")
    from pyspark.sql import Window

    per_user = events.groupBy(user_col).agg(F.count("*").alias("cnt"))
    coc = per_user.groupBy("cnt").agg(F.count("*").alias("nu"))
    n_users = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum("cnt").alias("total_events"),
    )
    k_expr = F.greatest(F.lit(1).cast("long"), F.expr(f"n_users div {decile}"))
    wd = Window.orderBy(F.col("cnt").desc())
    cum = coc.select(
        "cnt",
        "nu",
        (F.col("cnt") * F.col("nu")).alias("ev"),
        F.coalesce(
            F.sum("nu").over(wd) - F.col("nu"), F.lit(0)
        ).alias("users_above"),
        F.coalesce(
            F.sum(F.col("cnt") * F.col("nu")).over(wd)
            - F.col("cnt") * F.col("nu"),
            F.lit(0),
        ).alias("events_above"),
    )
    thr = (
        cum.join(F.broadcast(n_users))
        .where(
            (F.col("users_above") < k_expr)
            & (k_expr <= F.col("users_above") + F.col("nu"))
        )
        .select(
            (
                F.col("events_above")
                + (k_expr - F.col("users_above")) * F.col("cnt")
            ).alias("top_events")
        )
    )
    return (
        n_users.join(F.broadcast(thr))
        .select(
            "n_users",
            k_expr.alias("k"),
            "top_events",
            "total_events",
            (
                F.col("top_events").cast("double")
                / F.col("total_events").cast("double")
            ).alias("share"),
        )
    )


def mix_entropy(
    events: DataFrame,
    types: tuple[str, ...] = ("click", "view", "purchase", "signup", "error"),
    width: int = 86_400_000_000_000,
    start: int | None = None,
    end: int | None = None,
    time_col: str = "time",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-window Shannon entropy of the event-type mix plus the
    dominant type — the workload-diversity timeline ("did the feed
    collapse to one event kind?"). Fixed category list -> one static
    conditional aggregate; H sums the per-type terms -(c/N) ln(c/N) in
    DECLARED category order (a fixed float fold, the markov_entropy
    discipline), dominant type by count desc then name asc.

    Integer counts; each term's ratio is exact, and its ln goes through
    the libm pandas UDF (JVM Math.log is 1-ulp off libm — the
    hurst_exponent note). Scale shape: one map-side-combined groupBy
    over windows; the UDF touches windows x |types| doubles. Columns:
    time, n_events, h, h_norm, dominant."""
    if not types or width <= 0:
        raise ValueError("need types and positive width")
    t = F.col(time_col)
    src = events
    if start is not None:
        src = src.where(t >= start)
    if end is not None:
        src = src.where(t < end)
    origin = start if start is not None else 0
    aggs = [
        F.sum((F.col(type_col) == ty).cast("long")).alias(f"c{i}")
        for i, ty in enumerate(types)
    ]
    aggs.append(F.count("*").alias("N"))
    per = src.groupBy(
        F.expr(f"({time_col} - ({origin})) div {width}").alias("widx")
    ).agg(*aggs)
    import math as _math

    from btrdb_server_spark.utils import libm_ln

    # NOT strict by design: p_i = c_i/N is ZERO for types absent from a
    # window; the fold guards each term with when(c_i > 0, ...), so the
    # NaN from ln(0) is dropped — NaN propagation is the contract here.
    _ln = libm_ln()

    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # stage the ratios once so each _ln input is a plain column
    per = per.select(
        "*", *[(d(f"c{i}") / d("N")).alias(f"p{i}") for i in range(len(types))]
    )
    per = per.select(
        "*", *[_ln(F.col(f"p{i}")).alias(f"l{i}") for i in range(len(types))]
    )
    h = F.lit(0.0)
    for i in range(len(types)):
        h = h + F.when(
            F.col(f"c{i}") > 0, -(F.col(f"p{i}") * F.col(f"l{i}"))
        ).otherwise(F.lit(0.0))
    import math

    dom = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"c{i}").alias("c"),
                    F.lit(-i).alias("ni"),
                )
                for i in range(len(types))
            ]
        )
    )
    # dominant: max count, ties to the earlier DECLARED type
    name_arr = F.array(*[F.lit(ty) for ty in types])
    return per.select(
        (F.lit(origin) + F.col("widx") * F.lit(width)).alias("time"),
        F.col("N").alias("n_events"),
        h.alias("h"),
        (h / F.lit(math.log(float(len(types))))).alias("h_norm"),
        F.element_at(name_arr, (-dom["ni"] + 1).cast("int")).alias("dominant"),
    ).orderBy("time")


def user_novelty(
    events: DataFrame,
    width: int = 86_400_000_000_000,
    start: int | None = None,
    end: int | None = None,
    time_col: str = "time",
    user_col: str = "user_id",
) -> DataFrame:
    """New vs returning active users per window: a user is NEW in the
    window of their first-ever event (within the queried range) and
    RETURNING in every later active window — the growth-accounting
    timeline behind every "DAU by cohort age" panel.

    All-integer; new_share is ONE division. Scale shape: (user, window)
    pairs distinct-ed first (map-side combine), the first-window
    assignment is a groupBy(user) min over that user-window table, and
    the join back is co-partitioned on the same user key (the
    retention_cohorts shape). Columns: time, active_users, new_users,
    returning_users, new_share."""
    if width <= 0:
        raise ValueError("width must be positive")
    t = F.col(time_col)
    src = events
    if start is not None:
        src = src.where(t >= start)
    if end is not None:
        src = src.where(t < end)
    origin = start if start is not None else 0
    uw = (
        src.select(
            F.col(user_col).alias("u"),
            F.expr(f"({time_col} - ({origin})) div {width}").alias("widx"),
        )
        .distinct()
    )
    first = uw.groupBy("u").agg(F.min("widx").alias("w0"))
    return (
        uw.join(first, "u")
        .groupBy("widx")
        .agg(
            F.count("*").alias("active_users"),
            F.sum((F.col("widx") == F.col("w0")).cast("long")).alias(
                "new_users"
            ),
        )
        .select(
            (F.lit(origin) + F.col("widx") * F.lit(width)).alias("time"),
            "active_users",
            "new_users",
            (F.col("active_users") - F.col("new_users")).alias(
                "returning_users"
            ),
            (
                F.col("new_users").cast("double")
                / F.col("active_users").cast("double")
            ).alias("new_share"),
        )
        .orderBy("time")
    )


def hourly_conversion(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    time_col: str = "time",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion-rate clock: per hour of day, the volume of the source
    and target event types and their ratio — "when do views actually
    become purchases?" (a volume-ratio clock; the per-user ordered
    funnel is operators/events.py funnel).

    Integer counts; cvr is ONE division (null when no source events in
    the hour). Scale shape: one map-side-combined groupBy over a
    24-cell domain. Columns: hod, n_from, n_to, cvr."""
    hod = F.expr(f"({time_col} div 3600000000000) % 24")
    src = events.where(F.col(type_col).isin(from_type, to_type)).select(
        hod.alias("hod"),
        (F.col(type_col) == from_type).cast("long").alias("is_from"),
        (F.col(type_col) == to_type).cast("long").alias("is_to"),
    )
    agg = src.groupBy("hod").agg(
        F.sum("is_from").alias("n_from"), F.sum("is_to").alias("n_to")
    )
    return agg.select(
        "hod",
        "n_from",
        "n_to",
        F.when(
            F.col("n_from") > 0,
            F.col("n_to").cast("double") / F.col("n_from").cast("double"),
        ).alias("cvr"),
    ).orderBy("hod")


def session_conversion(
    events: DataFrame,
    gap_ns: int = 1_800_000_000_000,
    conversion: str = "purchase",
    time_col: str = "time",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Does engagement depth buy conversion? Gap-based user sessions
    (a new session after `gap_ns` of silence), then per DEPTH (events
    in the session): how many sessions reached that depth and how many
    contained a conversion — the engagement-vs-outcome curve.

    All-integer counts; cvr is ONE division. Scale shape: one user-
    keyed lag window (per-user partitions), a cumulative session index,
    one session-scale aggregate, one depth-domain rollup. Columns:
    depth, n_sessions, n_converted, cvr."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(time_col, id_col)
    sessions = (
        events.select(user_col, time_col, id_col, type_col)
        .withColumn("prev_t", F.lag(time_col).over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev_t").isNull()
                | (F.col(time_col) - F.col("prev_t") > gap_ns)
            ).cast("long"),
        )
        .withColumn("sid", F.sum("new_s").over(w))
    )
    per = sessions.groupBy(user_col, "sid").agg(
        F.count("*").alias("depth"),
        F.max((F.col(type_col) == conversion).cast("long")).alias("conv"),
    )
    return (
        per.groupBy("depth")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("conv").alias("n_converted"),
        )
        .select(
            "depth",
            "n_sessions",
            "n_converted",
            (
                F.col("n_converted").cast("double")
                / F.col("n_sessions").cast("double")
            ).alias("cvr"),
        )
        .orderBy("depth")
    )


def activity_histogram(
    events: DataFrame,
    width: int = 86_400_000_000_000,
    start: int | None = None,
    end: int | None = None,
    time_col: str = "time",
    user_col: str = "user_id",
) -> DataFrame:
    """How bursty are individual users? The distribution of per-(user,
    window) event counts: one row per activity level k with how many
    user-windows hit exactly k events — the per-entity load histogram
    behind rate-limit and abuse thresholds.

    All-integer; share is ONE division. Scale shape: one map-side-
    combined (user, window) count, one count-of-counts rollup (activity
    domain, tiny). Columns: events_in_window, n_user_windows, share."""
    if width <= 0:
        raise ValueError("width must be positive")
    t = F.col(time_col)
    src = events
    if start is not None:
        src = src.where(t >= start)
    if end is not None:
        src = src.where(t < end)
    origin = start if start is not None else 0
    per = src.groupBy(
        F.col(user_col).alias("u"),
        F.expr(f"({time_col} - ({origin})) div {width}").alias("widx"),
    ).agg(F.count("*").alias("k"))
    tot = per.agg(F.count("*").alias("t"))
    return (
        per.groupBy(F.col("k").alias("events_in_window"))
        .agg(F.count("*").alias("n_user_windows"))
        .join(F.broadcast(tot))
        .select(
            "events_in_window",
            "n_user_windows",
            (
                F.col("n_user_windows").cast("double")
                / F.col("t").cast("double")
            ).alias("share"),
        )
        .orderBy("events_in_window")
    )
