"""Relational rollups over the warehouse tables (lineitem/orders/customer/
nation) — the classic scan-aggregate and star-join shapes a user runs NEXT
TO the points plane when the same lake holds both telemetry and business
tables. The reference keeps these out of scope (its plane is (time, value)
only — qtree/qtree.go); on Spark they come free, and they demonstrate the
two plans that matter at 100 TB:

* `pricing_summary` — one full-scan groupBy with map-side combine and a
  pushed date predicate (TPC-H Q1 flavor). The scan reads exactly the
  seven columns it needs (ReadSchema) and skips row groups past the ship
  date (PushedFilters).
* `revenue_by_nation` — a star join: fact⋈fact co-partitioned shuffle join
  (lineitem⋈orders on orderkey) with the dimension chain broadcast
  (customer→nation is dimension-sized here; nation ALWAYS broadcast). At
  1000 executors the only wide exchange is the two facts hashing on the
  same key; every dim hop is a map-side hash join.

Exactness: every money column in the lake is 2-decimal quantized, so all
sums run on exact integers — cents for prices, hundredths for
discount/tax rates, and their integer products for the derived
disc_price/charge terms (units 1e-4 and 1e-6) — accumulated in
decimal(38,0) so a 100 TB fact table cannot overflow. Output doubles are
single divisions of exact integers (bit-identical in any engine, any
aggregation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2-decimal quantized double -> exact integer hundredths. The /0.01 form is
# deliberate (mirrors the DuckDB oracle text CAST(round(x/0.01) AS BIGINT)):
# exact-2-dec inputs never sit on .5 ties, so HALF_UP vs banker's is moot.
def _h(col) -> F.Column:
    return F.round(col / F.lit(0.01)).cast("long")


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H-Q1-flavor pricing summary: per (returnflag, linestatus) the
    exact sums of quantity, base price, discounted price and charge plus
    their means and the discount mean. One map-side-combined groupBy over
    a pruned scan; the date predicate reaches the parquet row groups.

    disc_price = extendedprice*(1-discount) is computed as the INTEGER
    product cents*(100-disc_hundredths) (units 1e-4); charge additionally
    multiplies by (100+tax_hundredths) (units 1e-6). Sums in decimal(38,0);
    every emitted double is one division of exact integers."""
    cents = _h(F.col("l_extendedprice"))
    disc_h = _h(F.col("l_discount"))
    tax_h = _h(F.col("l_tax"))
    qty = F.round(F.col("l_quantity")).cast("long")
    dp4 = cents * (F.lit(100) - disc_h)                         # 1e-4 units
    src = lineitem.where(
        F.to_date(F.col("l_shipdate")) < F.lit(ship_before).cast("date")
    ).select(
        "l_returnflag",
        "l_linestatus",
        qty.alias("qty"),
        cents.alias("cents"),
        disc_h.alias("disc_h"),
        dp4.alias("dp4"),
        (dp4 * (F.lit(100) + tax_h)).alias("ch6"),              # 1e-6 units
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    agg = src.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        F.sum(dec("cents")).alias("s_cents"),
        F.sum(dec("dp4")).alias("s_dp4"),
        F.sum(dec("ch6")).alias("s_ch6"),
        F.sum("disc_h").alias("s_disc_h"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        (d("s_cents") / F.lit(100.0)).alias("sum_base_price"),
        (d("s_dp4") / F.lit(10000.0)).alias("sum_disc_price"),
        (d("s_ch6") / F.lit(1000000.0)).alias("sum_charge"),
        (F.col("sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        (d("s_cents") / F.col("count_order") / F.lit(100.0)).alias("avg_price"),
        (
            F.col("s_disc_h").cast("double") / F.col("count_order") / F.lit(100.0)
        ).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    order_from: str = "1996-01-01",
    order_before: str = "1997-01-01",
) -> DataFrame:
    """Revenue per customer nation for orders in [order_from, order_before):
    the star-join rollup (TPC-H Q5 flavor, minus the supplier leg).
    revenue = Σ extendedprice*(1-discount), exact in 1e-4 integer units.

    Plan shape (asserted in tests/test_plans.py): nation is broadcast
    EXPLICITLY; customer joins as a dim hop (broadcast at dim scale, AQE
    decides past the hint threshold); the one wide exchange is
    lineitem⋈orders co-hashing l_orderkey/o_orderkey. The date filter cuts
    orders BEFORE the fact-fact join, so the join's build side is already
    range-pruned. Columns: n_name, revenue, n_orders, n_items."""
    od = F.to_date(F.col("o_orderdate"))
    o = orders.where(
        (od >= F.lit(order_from).cast("date"))
        & (od < F.lit(order_before).cast("date"))
    ).select("o_orderkey", "o_custkey")
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    rev4 = _h(F.col("l_extendedprice")) * (
        F.lit(100) - _h(F.col("l_discount"))
    )
    li = lineitem.select("l_orderkey", rev4.alias("rev4"))
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
    )
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    return (
        joined.groupBy("n_name")
        .agg(
            F.sum(dec("rev4")).alias("s_rev4"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count("*").alias("n_items"),
        )
        .select(
            "n_name",
            (F.col("s_rev4").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_orders",
            "n_items",
        )
        .orderBy("n_name")
    )


def late_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 90,
    order_from: str = "1996-01-01",
    order_before: str = "1997-01-01",
) -> DataFrame:
    """Orders (in a date range) having AT LEAST ONE line item shipped more
    than `late_days` after the order date, counted per order priority —
    the TPC-H-Q4-flavor existence query whose right plan is a SEMI join:
    the lineitem side is reduced to qualifying order keys and each order
    row is emitted at most once, never multiplied by its line items.

    Plan shape (pinned in tests): date-filtered orders ⋈ lineitem
    co-hashed on the order key as LeftSemi — the aggregate sees one row
    per order, so no count-distinct is needed. All-integer output.
    Columns: o_orderpriority, n_orders."""
    od = F.to_date(F.col("o_orderdate"))
    o = orders.where(
        (od >= F.lit(order_from).cast("date"))
        & (od < F.lit(order_before).cast("date"))
    ).select("o_orderkey", "o_custkey", "o_orderpriority", od.alias("odate"))
    li = lineitem.select(
        "l_orderkey", F.to_date(F.col("l_shipdate")).alias("sdate")
    )
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("sdate") > F.date_add(F.col("odate"), late_days)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def revenue_rollup(lineitem: DataFrame) -> DataFrame:
    """Hierarchical ROLLUP cube over (returnflag, linestatus): per-cell,
    per-returnflag-subtotal and grand-total revenue in ONE aggregation
    pass — Catalyst expands the grouping sets and the shuffle still
    map-side combines, so the cube costs one scan, not three. gid is the
    standard grouping bitmask (0 = leaf cell, 1 = linestatus rolled up,
    3 = grand total). Revenue exact in integer cents. Columns:
    l_returnflag, l_linestatus, gid, revenue, n_items."""
    cents = _h(F.col("l_extendedprice"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return (
        lineitem.select("l_returnflag", "l_linestatus", cents.alias("cents"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum(dec("cents")).alias("s_cents"),
            F.count("*").alias("n_items"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "gid",
            (F.col("s_cents").cast("double") / F.lit(100.0)).alias("revenue"),
            "n_items",
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


def shipping_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1996-07-01",
    top: int = 10,
) -> DataFrame:
    """Unshipped-revenue shipping queue (TPC-H Q3 flavor): for one market
    segment, the `top` orders placed before `cutoff` ranked by the revenue
    of their line items still shipping after it. revenue exact in 1e-4
    integer units, so the rank has no float ties — orderkey is a pure
    formality tiebreak.

    Plan shape: both date filters cut their fact BEFORE the
    lineitem⋈orders co-hash; the segment-filtered customer column pair
    joins as a dim hop; the final TakeOrderedAndProject keeps only `top`
    rows per partition before the single-reducer merge — no global sort
    materializes. Columns: l_orderkey, revenue, o_orderdate, n_lines."""
    cut = F.lit(cutoff).cast("date")
    o = (
        orders.where(F.to_date(F.col("o_orderdate")) < cut)
        .select(
            "o_orderkey",
            "o_custkey",
            F.to_date(F.col("o_orderdate")).cast("string").alias("o_orderdate"),
        )
    )
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = lineitem.where(F.to_date(F.col("l_shipdate")) > cut).select(
        "l_orderkey", rev4.alias("rev4")
    )
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"], "left_semi")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(dec("rev4")).alias("s_rev4"), F.count("*").alias("n_lines"))
        .select(
            "l_orderkey",
            (F.col("s_rev4").cast("double") / F.lit(10000.0)).alias("revenue"),
            "o_orderdate",
            "n_lines",
        )
        .orderBy(F.col("s_rev4").desc(), "l_orderkey")
        .limit(top)
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    ship_from: str = "1996-01-01",
    ship_before: str = "1996-04-01",
) -> DataFrame:
    """Maximum-revenue supplier(s) for a shipping quarter (TPC-H Q15
    flavor): per-supplier discounted revenue, then the row(s) equal to the
    maximum. Revenue is an exact 1e-4 integer, so the max-equality join is
    deterministic — the float formulation of Q15 needs a VIEW precisely
    because a double max can tie-break differently between plans; integers
    make the semantics engine-independent.

    Plan shape: ONE date-pruned fact scan groupBy l_suppkey (map-side
    combine), then the global max as an unpartitioned window over the
    per-supplier rows — supplier cardinality is dim-scale, so the single
    window task is bounded and the fact is never scanned twice (the
    broadcast-the-max formulation plans a second scan+aggregate of the
    same subtree pre-AQE-reuse). Supplier name a broadcast dim hop.
    Columns: s_suppkey, s_name, total_revenue."""
    from pyspark.sql.window import Window

    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    sd = F.to_date(F.col("l_shipdate"))
    per_supp = (
        lineitem.where(
            (sd >= F.lit(ship_from).cast("date"))
            & (sd < F.lit(ship_before).cast("date"))
        )
        .select("l_suppkey", rev4.alias("rev4"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("rev4").cast("decimal(38,0)")).alias("s_rev4"))
    )
    # supplier-scale rows only — the unpartitioned window is bounded
    mx = per_supp.withColumn(
        "mx", F.max("s_rev4").over(Window.partitionBy())
    )
    s = supplier.select("s_suppkey", "s_name")
    return (
        mx.where(F.col("s_rev4") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            (F.col("s_rev4").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


PIVOT_YEARS = list(range(1995, 2002))


def pivot_report(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Nation x order-year revenue crosstab via the DataFrame pivot
    operator: one row per customer nation, one column per order year
    (y1995..y2001), cell = exact total order value in dollars. The pivot
    value list is STATIC (PIVOT_YEARS) — Catalyst folds the crosstab into
    a single groupBy(n_name) over year-conditional partial aggregates, no
    distinct-values pre-scan and no second shuffle; absent cells are 0.

    Plan shape: orders groupBy (nationkey via dim hops) — customer joins
    at dim scale, nation broadcast; ONE wide exchange hashing n_name.
    Columns: n_name, y1995..y2001."""
    o = orders.select(
        "o_custkey",
        F.year(F.col("o_orderdate")).alias("yr"),
        _h(F.col("o_totalprice")).alias("cents"),
    )
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"]
    )
    piv = (
        joined.groupBy("n_name")
        .pivot("yr", PIVOT_YEARS)
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")))
    )
    cols = [
        (F.coalesce(F.col(str(y)).cast("double"), F.lit(0.0)) / F.lit(100.0)).alias(
            f"y{y}"
        )
        for y in PIVOT_YEARS
    ]
    return piv.select("n_name", *cols).orderBy("n_name")


def assoc_rules(
    lineitem: DataFrame,
    part: DataFrame,
    top: int = 50,
) -> DataFrame:
    """Market-basket association rules over part BRANDS: for each ordered
    brand pair (a -> b) co-present in an order, support count, confidence
    P(b|a) and lift P(a,b)/(P(a)P(b)). Brands collapse the 10k-part
    catalog to 25 labels, so pair counts are statistically meaningful at
    any sf. All counts are integers; confidence and lift are single
    divisions of exact integer products.

    Plan shape: part is BROADCAST onto the fact scan; baskets are
    per-order DISTINCT brand sets (groupBy orderkey+brand, map-side
    combined); the pair fan-out is a self-join CO-HASHED on the order key
    with fan-out bounded by basket size squared (~25 max); brand-pair and
    per-brand counts are label-scale tables joined broadcast. No
    point-scale shuffle except the one orderkey hash. Columns: brand_a,
    brand_b, pair_cnt, confidence, lift."""
    p = part.select("p_partkey", "p_brand")
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    # basket count stays inside the lazy plan — a broadcast 1-row cross
    # join, never a driver-side count() (the pagerank_fixed pattern).
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    a = baskets.select(F.col("l_orderkey").alias("o"), F.col("brand").alias("brand_a"))
    b = baskets.select(F.col("l_orderkey").alias("o"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "o")
        .where(F.col("brand_a") != F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("pair_cnt"))
    )
    singles = baskets.groupBy("brand").agg(F.count("*").alias("cnt"))
    ca = singles.select(F.col("brand").alias("brand_a"), F.col("cnt").alias("c_a"))
    cb = singles.select(F.col("brand").alias("brand_b"), F.col("cnt").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            (
                F.col("pair_cnt").cast("double") / F.col("c_a").cast("double")
            ).alias("confidence"),
            (
                (F.col("n_orders") * F.col("pair_cnt")).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("pair_cnt").desc(), "brand_a", "brand_b")
        .limit(top)
    )


def bilateral_trade(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Trade-flow matrix (TPC-H Q7 flavor, unfiltered): discounted
    revenue between every (supplier nation, customer nation) pair per
    ship year. Revenue exact in 1e-4 integer units; the emitted double
    is one division.

    Plan shape: the ONE wide exchange is lineitem⋈orders co-hashing the
    order key. Both nation legs are dimension chains resolved map-side:
    supplier⋈nation broadcast onto the fact scan (supp_nation rides the
    lineitem rows into the join), customer⋈nation broadcast onto orders.
    The final groupBy is label-scale (25 x 25 x years). Columns:
    supp_nation, cust_nation, l_year, revenue, n_items."""
    n1 = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    s = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("snk")
    )
    c = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cnk")
    )
    o = (
        orders.select("o_orderkey", "o_custkey")
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .select("o_orderkey", "cust_nation")
    )
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = (
        lineitem.select(
            "l_orderkey",
            "l_suppkey",
            F.year(F.col("l_shipdate")).alias("l_year"),
            rev4.alias("rev4"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("l_orderkey", "supp_nation", "l_year", "rev4")
    )
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(dec("rev4")).alias("s_rev4"), F.count("*").alias("n_items"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.col("s_rev4").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_items",
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def returned_item_losses(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    order_from: str = "1996-01-01",
    order_before: str = "1996-04-01",
    top: int = 20,
) -> DataFrame:
    """Customers who returned the most revenue in an order quarter
    (TPC-H Q10 flavor): revenue of l_returnflag = 'R' items per customer,
    top `top` by exact 1e-4 integer revenue (custkey tiebreak — no float
    rank ties possible).

    Plan shape: the returnflag + date predicates prune both fact scans
    BEFORE the one wide lineitem⋈orders co-hash; customer resolves
    after the per-customer aggregate (aggregate first, then join the
    dim — the groupBy output is customer-scale, so the name/nation hop
    never touches item-scale rows); nation broadcast. Top-k is
    TakeOrderedAndProject. Columns: c_custkey, c_name, n_name, revenue,
    n_items."""
    od = F.to_date(F.col("o_orderdate"))
    o = orders.where(
        (od >= F.lit(order_from).cast("date"))
        & (od < F.lit(order_before).cast("date"))
    ).select("o_orderkey", "o_custkey")
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", rev4.alias("rev4")
    )
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(dec("rev4")).alias("s_rev4"), F.count("*").alias("n_items"))
    )
    c = customer.select("c_custkey", "c_name", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    return (
        per_cust.join(c, F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("s_rev4").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_items",
            F.col("s_rev4").alias("_rank"),
        )
        .orderBy(F.col("_rank").desc(), "c_custkey")
        .limit(top)
        .drop("_rank")
    )


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    r_name: str = "ASIA",
    order_from: str = "1996-01-01",
    order_before: str = "1997-01-01",
) -> DataFrame:
    """Full TPC-H-Q5 local-supplier volume: revenue per nation of a region
    where the SUPPLIER and the CUSTOMER sit in the same nation — the
    five-way star join with an intra-row equality (c_nationkey =
    s_nationkey) that a naive plan turns into a second wide shuffle.

    Plan shape: the one wide exchange is lineitem⋈orders co-hashing the
    order key; customer, supplier, nation and region are all dim-scale
    and join as broadcast hash hops, so the same-nation equality is a
    map-side filter, never a shuffle key. Revenue exact in 1e-4 integer
    units; ordering on the integer sum (no float rank ties). Columns:
    n_name, revenue, n_items."""
    od = F.to_date(F.col("o_orderdate"))
    o = orders.where(
        (od >= F.lit(order_from).cast("date"))
        & (od < F.lit(order_before).cast("date"))
    ).select("o_orderkey", "o_custkey")
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = lineitem.select("l_orderkey", "l_suppkey", rev4.alias("rev4"))
    n = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == r_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    c = customer.select("c_custkey", F.col("c_nationkey"))
    s = supplier.select("s_suppkey", F.col("s_nationkey"))
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s["s_suppkey"])
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(dec("rev4")).alias("s_rev4"), F.count("*").alias("n_items"))
        .select(
            "n_name",
            (F.col("s_rev4").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_items",
            F.col("s_rev4").alias("_rank"),
        )
        .orderBy(F.col("_rank").desc(), "n_name")
        .drop("_rank")
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    p_type: str = "ECONOMY",
    cost_pct: int = 60,
) -> DataFrame:
    """TPC-H-Q9-flavor product profit by supplier nation and order year.
    The testdata schema has no partsupp/supplycost, so unit cost is a
    fixed percentage of p_retailprice (default 60%) — the join/agg shape
    is Q9's: a selective PART filter drives the fact reduction, supplier
    routes profit to a nation, orders contributes the year.

    profit = sum(extendedprice*(1-discount) - cost_pct% * retailprice *
    quantity), exact in 1e-4 integer units (cents * hundredths on the
    revenue side; retail hundredths * integer qty * cost_pct on the cost
    side — cost_pct of 60 keeps 0.60*100 an exact integer).

    Plan shape: part is filtered THEN broadcast (the filter prunes the
    fact rows map-side before any wide exchange); supplier and nation are
    broadcast dim hops; the one wide shuffle is lineitem co-hashing
    o_orderkey against the date-projected orders. Reference: the engine
    has no OLAP plane (qtree serves time ranges only) — this is SURVEY
    2.12 warehouse-extension surface."""
    p = part.where(F.col("p_type") == p_type).select(
        "p_partkey", _h(F.col("p_retailprice")).alias("retail_h")
    )
    s = supplier.select("s_suppkey", "s_nationkey")
    n = nation.select("n_nationkey", "n_name")
    o = orders.select("o_orderkey", F.year(F.to_date("o_orderdate")).alias("o_year"))
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        rev4.alias("rev4"),
    )
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .withColumn(
            "profit4",
            F.col("rev4") - F.col("retail_h") * F.col("qty") * F.lit(cost_pct),
        )
    )
    return (
        joined.groupBy("n_name", "o_year")
        .agg(F.sum(dec("profit4")).alias("s_p4"), F.count("*").alias("n_items"))
        .select(
            "n_name",
            "o_year",
            (F.col("s_p4").cast("double") / F.lit(10000.0)).alias("profit"),
            "n_items",
        )
        .orderBy("n_name", F.desc("o_year"))
    )


def supplier_scorecard(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 30,
) -> DataFrame:
    """Supplier reliability scorecard: per supplier the line count, late
    count (shipped more than `late_days` after the order date), the raw
    late rate, and the Wilson 95% interval on it — the interval is what
    makes a 3-line supplier with one late shipment rank sanely against a
    3000-line supplier at the same rate, which a raw-rate leaderboard
    gets wrong.

    Exactness: counts are integers from one map-side-combined groupBy;
    rate and Wilson bounds are a FIXED double expression over (k, n)
    mirrored token-for-token in the oracle (sqrt is correctly rounded in
    IEEE, so JVM and libm agree; 1.96/3.8416 parse to identical doubles).
    Plan shape: the one wide exchange co-hashes lineitem x orders on the
    order key with both sides projected to 2-3 columns; supplier names
    join broadcast AFTER the aggregate (100 rows, not 600k)."""
    late = (
        F.to_date("l_shipdate")
        > F.date_add(F.to_date("o_orderdate"), late_days)
    ).cast("long")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    o = orders.select("o_orderkey", "o_orderdate")
    agg = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_suppkey", late.alias("late"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_lines"), F.sum("late").alias("n_late"))
    )
    nd = F.col("n_lines").cast("double")
    p = F.col("n_late").cast("double") / nd
    z2 = F.lit(3.8416)
    denom = F.lit(1.0) + z2 / nd
    center = (p + z2 / (F.lit(2.0) * nd)) / denom
    half = (
        F.lit(1.96)
        * F.sqrt(p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * nd * nd))
    ) / denom
    return (
        agg.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_lines",
            "n_late",
            p.alias("late_rate"),
            (center - half).alias("wilson_lo"),
            (center + half).alias("wilson_hi"),
        )
        .orderBy("s_suppkey")
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    mkt_region: str = "AMERICA",
    supp_nation: str = "NATION_7",
) -> DataFrame:
    """TPC-H-Q8-flavor market share: within one market region's orders,
    the yearly revenue share supplied by one nation. share =
    nation_rev4 / total_rev4, both exact int64 sums, so the emitted
    double is ONE division of exact integers (bit-identical anywhere).

    Plan shape: one lineitem⋈orders co-hash; customer→nation→region
    (market filter) and supplier→nation (numerator flag) broadcast; the
    share is a conditional sum, not a second pass. Columns: o_year,
    mkt_share, total_revenue, n_items."""
    mkt_nations = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == mkt_region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("mkt_nationkey"))
    )
    supp_keys = (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == supp_nation)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    o = orders.select(
        "o_orderkey", "o_custkey", F.year(F.col("o_orderdate")).alias("o_year")
    )
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = lineitem.select("l_orderkey", "l_suppkey", rev4.alias("rev4"))
    c = customer.select("c_custkey", "c_nationkey")
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(
            F.broadcast(mkt_nations),
            F.col("c_nationkey") == F.col("mkt_nationkey"),
            "left_semi",
        )
        .join(
            F.broadcast(supp_keys.withColumn("is_supp", F.lit(1))),
            F.col("l_suppkey") == supp_keys["s_suppkey"],
            "left",
        )
    )
    num = F.when(F.col("is_supp") == 1, F.col("rev4")).otherwise(F.lit(0))
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(dec(
                "rev4"
            )).alias("s_total"),
            F.sum(num.cast("decimal(38,0)")).alias("s_nation"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.col("o_year").cast("long").alias("o_year"),
            (
                F.col("s_nation").cast("double")
                / F.col("s_total").cast("double")
            ).alias("mkt_share"),
            (F.col("s_total").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
            "n_items",
        )
        .orderBy("o_year")
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    year_from: str = "1996-01-01",
    year_before: str = "1997-01-01",
) -> DataFrame:
    """TPC-H-Q14-flavor promotion effect: per ship month, the percentage
    of revenue from PROMO-type parts. promo_pct = 100 * promo4 / total4
    with the *100 applied in the integer domain, so the double is one
    exact-int division.

    Plan shape: part is a broadcast dim carrying only (p_partkey,
    is_promo); the month rollup map-side combines; the date predicate
    reaches the lineitem scan. Columns: ship_month, promo_pct,
    total_revenue, n_items."""
    sd = F.to_date(F.col("l_shipdate"))
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = lineitem.where(
        (sd >= F.lit(year_from).cast("date"))
        & (sd < F.lit(year_before).cast("date"))
    ).select(
        "l_partkey",
        F.date_format(sd, "yyyy-MM").alias("ship_month"),
        rev4.alias("rev4"),
    )
    p = part.select(
        "p_partkey", (F.col("p_type") == "PROMO").cast("int").alias("is_promo")
    )
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    promo4 = F.when(F.col("is_promo") == 1, F.col("rev4")).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .groupBy("ship_month")
        .agg(
            F.sum(promo4.cast("decimal(38,0)") * F.lit(100)).alias("s_promo"),
            F.sum(dec("rev4")).alias("s_total"),
            F.count("*").alias("n_items"),
        )
        .select(
            "ship_month",
            (
                F.col("s_promo").cast("double")
                / F.col("s_total").cast("double")
            ).alias("promo_pct"),
            (F.col("s_total").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
            "n_items",
        )
        .orderBy("ship_month")
    )


def small_qty_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#23",
    frac_num: int = 1,
    frac_den: int = 5,
) -> DataFrame:
    """TPC-H-Q17-flavor small-quantity revenue: total extended price of
    brand items ordered in a quantity below frac (default 1/5) of that
    part's average order quantity. The avg comparison is EXACT by
    cross-multiplication: qty < (num/den)*(s_qty/cnt) iff
    qty*den*cnt < num*s_qty — all int64, no float threshold.

    Plan shape: the brand filter broadcasts as a semi-join into the
    lineitem scan FIRST, the per-part (s_qty, cnt) aggregate over the
    surviving brand-only rows is part-scale and broadcasts back — two
    passes over the brand slice only, never over the full fact.
    Columns: brand, small_qty_revenue, n_items."""
    pk = part.where(F.col("p_brand") == brand).select("p_partkey")
    qty = F.round(F.col("l_quantity")).cast("long")
    li = lineitem.join(
        F.broadcast(pk), F.col("l_partkey") == pk["p_partkey"], "left_semi"
    ).select(
        "l_partkey", qty.alias("qty"), _h(F.col("l_extendedprice")).alias("cents")
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("s_qty"), F.count("*").alias("cnt")
    ).withColumnRenamed("l_partkey", "sp_partkey")
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    small = li.join(
        F.broadcast(stats), F.col("l_partkey") == F.col("sp_partkey")
    ).where(
        F.col("qty") * F.lit(frac_den) * F.col("cnt")
        < F.lit(frac_num) * F.col("s_qty")
    )
    return small.agg(
        F.lit(brand).alias("brand"),
        (F.sum(dec("cents")).cast("double") / F.lit(100.0)).alias(
            "small_qty_revenue"
        ),
        F.count("*").alias("n_items"),
    )


def large_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: int = 150,
    top: int = 20,
) -> DataFrame:
    """TPC-H-Q18-flavor large-volume orders: orders whose total line
    quantity exceeds `min_qty`, top `top` by total price (integer-cent
    rank, orderkey tiebreak — no float ordering).

    Plan shape: the per-order quantity rollup map-side combines on the
    fact alone; the qualifying key set (tiny) then joins orders
    co-hashed on the order key and the customer hop is a broadcast.
    Columns: c_name, o_orderkey, o_orderdate, total_price, sum_qty."""
    qty = F.round(F.col("l_quantity")).cast("long")
    per_order = (
        lineitem.select("l_orderkey", qty.alias("qty"))
        .groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty)
    )
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
        _h(F.col("o_totalprice")).alias("price_cents"),
    )
    c = customer.select("c_custkey", "c_name")
    return (
        per_order.join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            (F.col("price_cents").cast("double") / F.lit(100.0)).alias(
                "total_price"
            ),
            "sum_qty",
            F.col("price_cents").alias("_rank"),
        )
        .orderBy(F.col("_rank").desc(), "o_orderkey")
        .limit(top)
        .drop("_rank")
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q19-flavor disjunctive-predicate revenue: one scalar revenue
    over an OR of three (brand, size-range, quantity-range) blocks — the
    shape that tests whether a disjunction across a dim join still prunes
    (it does: the part predicate lands in the broadcast build side, the
    quantity bounds in the fact scan as `l_quantity BETWEEN lo AND hi`
    over the union of the blocks' ranges).

    Columns: revenue, n_items."""
    qty = F.round(F.col("l_quantity")).cast("long")
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = lineitem.where(F.col("l_quantity").between(1, 30)).select(
        "l_partkey", qty.alias("qty"), rev4.alias("rev4")
    )
    p = part.select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("qty").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("qty").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("qty").between(20, 30))
    )
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .where(cond)
        .agg(
            (F.sum(dec("rev4")).cast("double") / F.lit(10000.0)).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def idle_customers(
    orders: DataFrame, customer: DataFrame, idle_from: str = "1999-01-01"
) -> DataFrame:
    """TPC-H-Q22-flavor idle high-balance customers: customers with an
    account balance above the average POSITIVE balance who have placed no
    order since `idle_from`, counted per market segment. The
    above-average test is exact by cross-multiplication (cents * n_pos >
    s_pos_cents, all int64) — no float threshold.

    Plan shape: the positive-balance average is a two-value broadcast
    (one aggregate over the dim-scale customer table); the idleness test
    is a LeftAnti join against date-pruned order custkeys. At fact scale
    the anti join co-hashes customer keys — customer-scale, not
    item-scale, because only o_custkey is shuffled. Columns:
    c_mktsegment, n_custs, total_acctbal."""
    cents = _h(F.col("c_acctbal"))
    c = customer.select("c_custkey", "c_mktsegment", cents.alias("cents"))
    orders = orders.where(
        F.to_date(F.col("o_orderdate")) >= F.lit(idle_from).cast("date")
    )
    pos = c.where(F.col("cents") > 0).agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_pos"),
        F.count("*").alias("n_pos"),
    )
    rich = c.join(F.broadcast(pos)).where(
        F.col("cents").cast("decimal(38,0)") * F.col("n_pos") > F.col("s_pos")
    )
    idle = rich.join(
        orders.select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            (
                F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
                / F.lit(100.0)
            ).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def customer_distribution(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """TPC-H-Q13-flavor customer order-count distribution: how many
    customers placed exactly k orders, INCLUDING the zero-order
    customers a plain groupBy would drop. Pure integer counts.

    Plan shape: the per-customer count aggregates the FACT side alone
    first (order-key scale never leaves the map-combine), then customer
    left-joins the customer-scale counts — the aggregate-before-join
    shape; the distribution rollup is a second customer-scale combine.
    Columns: c_count, custdist, ordered custdist desc / c_count desc."""
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    joined = customer.select("c_custkey").join(
        per_cust, F.col("c_custkey") == F.col("o_custkey"), "left"
    )
    return (
        joined.select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def forecast_revenue(
    lineitem: DataFrame,
    year_from: str = "1996-01-01",
    year_before: str = "1997-01-01",
    disc_lo: int = 4,
    disc_hi: int = 6,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H-Q6 forecasting-revenue-change: the potential revenue of
    dropping small-quantity discounts — Σ extendedprice * discount over
    one ship year, discount within [disc_lo, disc_hi] hundredths,
    quantity < max_qty. THE pure predicate-pushdown query: no join, no
    groupBy key — one scan where every predicate reaches the parquet
    row groups and the aggregate is a single map-combined cell.

    Exact in 1e-4 integer units (cents * discount-hundredths).
    Columns: revenue, n_items."""
    sd = F.to_date(F.col("l_shipdate"))
    src = lineitem.where(
        (sd >= F.lit(year_from).cast("date"))
        & (sd < F.lit(year_before).cast("date"))
        & _h(F.col("l_discount")).between(disc_lo, disc_hi)
        & (F.col("l_quantity") < max_qty)
    )
    rev4 = _h(F.col("l_extendedprice")) * _h(F.col("l_discount"))
    return src.agg(
        (
            F.sum(rev4.cast("decimal(38,0)")).cast("double") / F.lit(10000.0)
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def discount_elasticity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand discount elasticity: the OLS slope of order quantity
    against the discount level (in hundredths) across a brand's line
    items — "does a deeper discount actually move volume for this
    brand?" — plus the fit r2 and mean quantity.

    Exactness: all five sufficient statistics are exact int64
    (quantities and discount-hundredths are small integers); slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) and r2 evaluate as fixed IEEE
    trees on the exact moments. Brands with zero discount variance emit
    null slope. Scale shape: part's brand column broadcasts into the
    fact scan, ONE map-side-combined groupBy(brand) carries eight
    integers per brand. Columns: p_brand, n_items, slope, r2,
    mean_qty."""
    qty = F.round(F.col("l_quantity")).cast("long")
    disc_h = _h(F.col("l_discount"))
    li = lineitem.select("l_partkey", qty.alias("y"), disc_h.alias("x"))
    p = part.select("p_partkey", "p_brand")
    src = li.join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = src.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("Sx"),
        F.sum("y").alias("Sy"),
        F.sum(dec("x") * F.col("x")).alias("Sxx"),
        F.sum(dec("y") * F.col("y")).alias("Syy"),
        F.sum(dec("x") * F.col("y")).alias("Sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    vx = d("n") * d("Sxx") - d("Sx") * d("Sx")
    vy = d("n") * d("Syy") - d("Sy") * d("Sy")
    cov = d("n") * d("Sxy") - d("Sx") * d("Sy")
    return mom.select(
        "p_brand",
        F.col("n").alias("n_items"),
        F.when(vx != 0, cov / vx).alias("slope"),
        F.when((vx != 0) & (vy != 0), (cov * cov) / (vx * vy)).alias("r2"),
        (d("Sy") / d("n")).alias("mean_qty"),
    ).orderBy("p_brand")


def skyline_parts(part: DataFrame) -> DataFrame:
    """2-D skyline (Pareto frontier) of the part catalog on (cheaper
    retail price, larger size): a (price, size) point is dominated when
    some other point is at-least-as-good on both axes and strictly
    better on one. The classical skyline operator the reference's
    single-table plane never needed — and the textbook sort-scan
    formulation Spark expresses in one window.

    Exactness: prices in integer cents, sizes integer; domination is
    pure integer comparison. Algorithm: distinct (price, size) pairs
    sorted by (price asc, size desc); a pair is on the frontier iff its
    size strictly exceeds every preceding pair's size (any predecessor
    in that order is at-least-as-cheap, so a >= size predecessor
    dominates). Scale shape: one distinct to the pair domain, one
    running-max window over it (pair-domain scale, not catalog scale),
    one broadcast join back for the per-pair part count. Columns:
    retail_price, p_size, n_parts, min_partkey."""
    from pyspark.sql import Window

    cents = _h(F.col("p_retailprice"))
    src = part.select(
        "p_partkey", cents.alias("pc"), F.col("p_size").cast("long").alias("sz")
    )
    pairs = src.select("pc", "sz").distinct()
    w = (
        Window.orderBy(F.col("pc").asc(), F.col("sz").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = pairs.withColumn("prev_max", F.max("sz").over(w)).where(
        F.col("prev_max").isNull() | (F.col("sz") > F.col("prev_max"))
    )
    per = src.join(frontier.select("pc", "sz"), ["pc", "sz"], "left_semi")
    agg = per.groupBy("pc", "sz").agg(
        F.count("*").alias("n_parts"), F.min("p_partkey").alias("min_partkey")
    )
    return agg.select(
        (F.col("pc").cast("double") / F.lit(100.0)).alias("retail_price"),
        F.col("sz").alias("p_size"),
        "n_parts",
        "min_partkey",
    ).orderBy("retail_price")


def market_concentration(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration per customer nation:
    HHI = sum over customers of (customer revenue / nation revenue)^2 —
    the antitrust-style "is this market one whale or many minnows"
    readout, the squared-share companion to gini_spend.

    Exactness: with integer 1e-4 revenues r_i, HHI = sum(r_i^2) / S^2
    — both decimal(38,0)-exact integers, ONE division of their double
    casts. Scale shape: one fact-fact co-hash, customer-scale revenue
    aggregate, nation broadcast, nation-scale final reduce. Columns:
    n_name, n_customers, hhi, top_share."""
    rev4 = _h(F.col("l_extendedprice")) * (F.lit(100) - _h(F.col("l_discount")))
    li = lineitem.select("l_orderkey", rev4.alias("rev4"))
    o = orders.select("o_orderkey", "o_custkey")
    per_cust = (
        li.join(o, F.col("l_orderkey") == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(F.col("rev4").cast("decimal(38,0)")).alias("r"))
    )
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    tagged = per_cust.join(
        F.broadcast(c), F.col("o_custkey") == c["c_custkey"]
    ).join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
    agg = tagged.groupBy("n_name").agg(
        F.count("*").alias("n_customers"),
        F.sum("r").alias("S"),
        F.sum(F.col("r") * F.col("r")).alias("S2"),
        F.max("r").alias("rmax"),
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return agg.select(
        "n_name",
        "n_customers",
        (d("S2") / (d("S") * d("S"))).alias("hhi"),
        (d("rmax") / d("S")).alias("top_share"),
    ).orderBy("n_name")


def repurchase_intervals(orders: DataFrame) -> DataFrame:
    """Customer repurchase-interval profile: the gaps in days between a
    customer's consecutive orders, summarized as exact p50/p90 order
    statistics plus the mean — the replenishment-cycle number a
    retention model calibrates against.

    Exactness: gaps are integer day differences; percentile ranks use
    the (p*n + 99) div 100 ceiling identity; the mean is ONE division.
    Scale shape: one customer-keyed lag window (partitions bounded by
    per-customer order counts), one map-side-combined groupBy to the
    day-domain histogram, one window over that label-scale table for
    the exact cumulative-count percentiles. Columns:
    n_gaps, p50_days, p90_days, mean_days."""
    from pyspark.sql import Window

    gaps = (
        orders.select("o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("od"))
        .withColumn("prev", F.lag("od").over(
            Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
        ))
        .where(F.col("prev").isNotNull())
        .select(F.datediff("od", "prev").cast("long").alias("gap"))
    )
    # Gaps are small-domain integers, so the exact percentiles come off a
    # VALUE-DOMAIN HISTOGRAM (the ship_delay_profile shape): one
    # map-side-combined groupBy collapses the gap rows to day cells, and
    # the type-1 order statistic at rank r is the first gap whose
    # cumulative count reaches r — bit-identical to ranking every row,
    # without a single-task global sort of every gap. A cell can cover
    # both percentile ranks, so each pick tests rank ∈ (cum - cnt, cum].
    hist = gaps.groupBy("gap").agg(F.count("*").alias("cnt"))
    wr = Window.orderBy("gap")
    wa = wr.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "gap",
        "cnt",
        F.sum("cnt").over(wr).alias("cum"),
        F.sum("cnt").over(wa).alias("n"),
        F.sum(F.col("gap") * F.col("cnt")).over(wa).alias("s"),
    )
    covers = lambda r: (  # noqa: E731
        (F.col("cum") >= F.expr(r)) & (F.col("cum") - F.col("cnt") < F.expr(r))
    )
    return (
        cum.where(
            covers("(50 * n + 99) div 100") | covers("(90 * n + 99) div 100")
        )
        .agg(
            F.min("n").alias("n"),
            F.min(F.when(covers("(50 * n + 99) div 100"), F.col("gap"))).alias(
                "p50_days"
            ),
            F.min(F.when(covers("(90 * n + 99) div 100"), F.col("gap"))).alias(
                "p90_days"
            ),
            F.min("s").alias("s"),
        )
        .select(
            # coalesce: on an EMPTY input the covers() filter leaves no
            # rows, so min(n) is NULL — the count contract (and the
            # oracle's count(*)) is 0. Non-empty inputs are unchanged.
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_gaps"),
            "p50_days",
            "p90_days",
            (F.col("s").cast("double") / F.col("n").cast("double")).alias(
                "mean_days"
            ),
        )
    )


def ship_delay_profile(
    lineitem: DataFrame, orders: DataFrame, slow_days: int = 60
) -> DataFrame:
    """Order-to-ship delay profile: exact p50/p90/p99 of the per-item
    shipping delay in days plus the share slower than `slow_days` — the
    logistics SLA readout.

    Exactness: delays are integer day differences; percentiles are
    exact order statistics at ceiling ranks; shares are single
    divisions. Scale shape: one fact-fact co-hash on the order key, one
    map-side-combined groupBy to the day-domain histogram, one window
    over that label-scale table for the exact cumulative-count
    percentiles. Columns: n_items, p50, p90, p99,
    n_slow, slow_share."""
    from pyspark.sql import Window

    o = orders.select("o_orderkey", F.to_date("o_orderdate").alias("od"))
    li = lineitem.select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    delays = li.join(o, F.col("l_orderkey") == o["o_orderkey"]).select(
        F.datediff("sd", "od").cast("long").alias("d")
    )
    # Delays are small-domain integers, so the exact percentiles come off
    # a VALUE-DOMAIN HISTOGRAM (the delay_by_priority shape): one
    # map-side-combined groupBy collapses the fact rows to day cells, and
    # the type-1 order statistic at rank r is the first day whose
    # cumulative count reaches r — bit-identical to ranking every row,
    # without the old shape's single-task global sort of the whole fact
    # output (a 100 TB scale-killer) or its checkpoint + join-backs. A
    # day cell can cover several percentile ranks, so each pick tests
    # rank ∈ (cum - cnt, cum].
    hist = delays.groupBy("d").agg(F.count("*").alias("cnt"))
    wr = Window.orderBy("d")
    wa = wr.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "d",
        "cnt",
        F.sum("cnt").over(wr).alias("cum"),
        F.sum("cnt").over(wa).alias("n"),
        F.sum(
            F.when(F.col("d") > slow_days, F.col("cnt")).otherwise(F.lit(0))
        )
        .over(wa)
        .alias("n_slow"),
    )
    covers = lambda r: (  # noqa: E731
        (F.col("cum") >= F.expr(r)) & (F.col("cum") - F.col("cnt") < F.expr(r))
    )
    return (
        cum.where(
            covers("(50 * n + 99) div 100")
            | covers("(90 * n + 99) div 100")
            | covers("(99 * n + 99) div 100")
        )
        .agg(
            F.min("n").alias("n"),
            F.min(F.when(covers("(50 * n + 99) div 100"), F.col("d"))).alias(
                "p50"
            ),
            F.min(F.when(covers("(90 * n + 99) div 100"), F.col("d"))).alias(
                "p90"
            ),
            F.min(F.when(covers("(99 * n + 99) div 100"), F.col("d"))).alias(
                "p99"
            ),
            F.min("n_slow").alias("n_slow"),
        )
        .select(
            # coalesce: empty input -> covers() leaves no rows -> min(n)
            # NULL; the count contract (and the oracle's count(*)) is 0.
            # n_slow stays NULL-on-empty — the oracle's sum(CASE..) over
            # zero rows is NULL too. Non-empty inputs unchanged (ADVICE
            # r13).
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_items"),
            "p50",
            "p90",
            "p99",
            "n_slow",
            (F.col("n_slow").cast("double") / F.col("n").cast("double")).alias(
                "slow_share"
            ),
        )
    )


def order_backlog(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Open-order backlog timeline: per calendar month, how many orders
    opened, how many fully shipped (their LAST line item's ship date),
    and the end-of-month backlog — the classical interval-stabbing
    count done as +1/-1 deltas and one cumulative, never a per-day
    explode.

    All-integer. Scale shape: one per-order max-shipdate aggregate
    (fact co-hash, map-side combined), month-domain delta groupBy, one
    month-scale cumulative window. Columns: month, n_opened, n_closed,
    backlog_eom."""
    from pyspark.sql import Window

    last_ship = (
        lineitem.select("l_orderkey", F.to_date("l_shipdate").alias("sd"))
        .groupBy("l_orderkey")
        .agg(F.max("sd").alias("close_d"))
    )
    o = orders.select(
        "o_orderkey", F.to_date("o_orderdate").alias("open_d")
    )
    spans = o.join(last_ship, F.col("o_orderkey") == F.col("l_orderkey"))
    month = lambda c: F.date_format(F.col(c), "yyyy-MM")  # noqa: E731
    opened = spans.groupBy(month("open_d").alias("month")).agg(
        F.count("*").alias("n_opened")
    )
    closed = spans.groupBy(month("close_d").alias("month")).agg(
        F.count("*").alias("n_closed")
    )
    merged = (
        opened.join(closed, "month", "full_outer")
        .select(
            "month",
            F.coalesce(F.col("n_opened"), F.lit(0)).alias("n_opened"),
            F.coalesce(F.col("n_closed"), F.lit(0)).alias("n_closed"),
        )
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        merged.withColumn(
            "backlog_eom",
            F.sum(F.col("n_opened") - F.col("n_closed")).over(w),
        )
        .orderBy("month")
    )


def lake_integrity(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Referential-integrity and coverage audit across the warehouse
    tables — one row per check: line items whose order key resolves
    nowhere, orders whose customer is missing, orders with no line
    items, and the unused tail of each dimension (parts/suppliers/
    customers with zero sales) — the pre-migration sanity report.

    All-integer counts via LeftAnti joins (each check shuffles only the
    KEY column of the probing side); shares are single divisions.
    Columns: check, n_total, n_failing, share."""
    def chk(name, total_df, anti):
        t = total_df.agg(F.count("*").alias("n_total"))
        f = anti.agg(F.count("*").alias("n_failing"))
        return t.join(F.broadcast(f)).select(
            F.lit(name).alias("check"),
            "n_total",
            "n_failing",
            (
                F.col("n_failing").cast("double")
                / F.col("n_total").cast("double")
            ).alias("share"),
        )

    li_k = lineitem.select("l_orderkey")
    o_k = orders.select("o_orderkey", "o_custkey")
    c_k = customer.select("c_custkey")
    checks = [
        chk(
            "lineitem_orphan_order",
            li_k,
            li_k.join(o_k, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"),
        ),
        chk(
            "order_orphan_customer",
            o_k,
            o_k.join(c_k, F.col("o_custkey") == F.col("c_custkey"), "left_anti"),
        ),
        chk(
            "order_without_lines",
            o_k,
            o_k.join(li_k, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti"),
        ),
        chk(
            "part_never_sold",
            part.select("p_partkey"),
            part.select("p_partkey").join(
                lineitem.select("l_partkey"),
                F.col("p_partkey") == F.col("l_partkey"),
                "left_anti",
            ),
        ),
        chk(
            "supplier_never_used",
            supplier.select("s_suppkey"),
            supplier.select("s_suppkey").join(
                lineitem.select("l_suppkey"),
                F.col("s_suppkey") == F.col("l_suppkey"),
                "left_anti",
            ),
        ),
        chk(
            "customer_without_orders",
            c_k,
            c_k.join(o_k, F.col("c_custkey") == F.col("o_custkey"), "left_anti"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("check")


def segment_spend_profile(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-market-segment order-value profile: order count, exact mean
    and exact MEDIAN total price — the pricing-power card by customer
    segment.

    Exactness: prices in integer cents; the median is the type-1 order
    statistic at rank ceil(n/2) per segment; the mean is ONE division.
    Scale shape: customer's segment broadcasts into the orders scan,
    one segment-keyed rank window, one segment-domain aggregate.
    Columns: c_mktsegment, n_orders, mean_price, median_price."""
    from pyspark.sql import Window

    cents = _h(F.col("o_totalprice"))
    c = customer.select("c_custkey", "c_mktsegment")
    src = (
        orders.select("o_custkey", cents.alias("pc"))
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .select("c_mktsegment", "pc")
    )
    # Same single-window fold as delay_by_priority: n_orders/sum ride the
    # median's segment-keyed window pass (one Exchange + one Sort, zero
    # joins, no checkpoint of the broadcast-join output).
    w = Window.partitionBy("c_mktsegment").orderBy("pc")
    wa = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return (
        src.select(
            "c_mktsegment",
            "pc",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wa).alias("n_orders"),
            F.sum("pc").over(wa).alias("s"),
        )
        .where(F.col("rn") == F.expr("(n_orders + 1) div 2"))
        .select(
            "c_mktsegment",
            F.col("pc").alias("medc"),
            "n_orders",
            "s",
        )
        .select(
            "c_mktsegment",
            "n_orders",
            (d("s") / (d("n_orders") * F.lit(100.0))).alias("mean_price"),
            (d("medc") / F.lit(100.0)).alias("median_price"),
        )
        .orderBy("c_mktsegment")
    )


def spend_trajectory(orders: DataFrame, min_orders: int = 3) -> DataFrame:
    """Within-customer spend trajectory: the fixed-effects OLS slope of
    order total price (cents) against the customer's own order index —
    "do customers spend more as they mature?" — pooling the demeaned
    within-customer variation so cross-customer level differences never
    contaminate the trend.

    Exactness: slope = sum_c(n_c*Sxy_c - Sx_c*Sy_c) /
    sum_c(n_c*Sxx_c - Sx_c^2) with every per-customer term an exact
    decimal(38,0) integer — ONE division at the end. Customers with
    fewer than `min_orders` orders are excluded (no within variation to
    speak of). Scale shape: one customer-keyed rank window (bounded
    partitions), one customer-scale moment aggregate, one global
    reduce. Columns: n_customers, n_orders, slope_cents_per_order,
    mean_first_price, mean_last_price."""
    from pyspark.sql import Window

    cents = _h(F.col("o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate", cents.alias("y")
    ).withColumn("x", F.row_number().over(w).cast("long"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = (
        seq.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("Sx"),
            F.sum("y").alias("Sy"),
            F.sum(dec("x") * F.col("x")).alias("Sxx"),
            F.sum(dec("x") * F.col("y")).alias("Sxy"),
            F.min(F.when(F.col("x") == 1, F.col("y"))).alias("first_y"),
            F.max(F.struct(F.col("x"), F.col("y"))).alias("last_s"),
        )
        .where(F.col("n") >= min_orders)
    )
    num = F.sum(
        F.col("n") * F.col("Sxy") - dec("Sx") * F.col("Sy")
    )
    den = F.sum(
        F.col("n") * F.col("Sxx") - dec("Sx") * F.col("Sx")
    )
    agg = per.agg(
        F.count("*").alias("n_customers"),
        F.sum("n").alias("n_orders"),
        num.alias("num"),
        den.alias("den"),
        F.sum("first_y").alias("s_first"),
        F.sum(F.col("last_s.y")).alias("s_last"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return agg.select(
        "n_customers",
        "n_orders",
        F.when(d("den") != 0, d("num") / d("den")).alias(
            "slope_cents_per_order"
        ),
        (d("s_first") / (d("n_customers") * F.lit(100.0))).alias(
            "mean_first_price"
        ),
        (d("s_last") / (d("n_customers") * F.lit(100.0))).alias(
            "mean_last_price"
        ),
    )


def basket_diversity(lineitem: DataFrame) -> DataFrame:
    """Basket-diversity histogram: how many orders contain exactly k
    DISTINCT parts — the cross-sell readout (all-singleton baskets mean
    the catalog never bundles).

    All-integer; share is ONE division. Scale shape: one distinct on
    (order, part) (map-side combined), one order-scale count, one
    k-domain rollup. Columns: n_parts, n_orders, share."""
    per = (
        lineitem.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_parts"))
    )
    tot = per.agg(F.count("*").alias("t"))
    return (
        per.groupBy("n_parts")
        .agg(F.count("*").alias("n_orders"))
        .join(F.broadcast(tot))
        .select(
            "n_parts",
            "n_orders",
            (
                F.col("n_orders").cast("double") / F.col("t").cast("double")
            ).alias("share"),
        )
        .orderBy("n_parts")
    )


def delay_by_priority(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Does the priority flag actually buy speed? Per order priority:
    item count, mean and exact MEDIAN order-to-ship delay in days — the
    SLA-by-class readout that catches a priority queue nobody wired up.

    Exactness: integer day delays; medians are type-1 order statistics
    per class; means are single divisions. Scale shape: one fact-fact
    co-hash, one map-side-combined groupBy to the (priority, day)
    histogram, one window over that label-scale table for the exact
    cumulative-count median (hist_quantiles is the sketch path for
    high-cardinality value domains). Columns: o_orderpriority, n_items,
    mean_days, median_days."""
    from pyspark.sql import Window

    o = orders.select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = lineitem.select("l_orderkey", F.to_date("l_shipdate").alias("sd"))
    src = li.join(o, F.col("l_orderkey") == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff("sd", "od").cast("long").alias("d"),
    )
    # Delays are small-domain integers, so the exact median comes off a
    # VALUE-DOMAIN HISTOGRAM: one map-side-combined groupBy collapses the
    # fact rows to (priority, day) cells, and the type-1 order statistic
    # at rank (n+1) div 2 is the first day whose cumulative count reaches
    # the rank — bit-identical to sorting every row, without the old
    # shape's full-fact sort on a 5-value partition key (5 straggler
    # tasks at 100 TB) or its localCheckpoint + join-back branches.
    hist = src.groupBy("o_orderpriority", "d").agg(F.count("*").alias("cnt"))
    wc = Window.partitionBy("o_orderpriority").orderBy("d")
    wa = wc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        hist.select(
            "o_orderpriority",
            "d",
            "cnt",
            F.sum("cnt").over(wc).alias("cum"),
            F.sum("cnt").over(wa).alias("n_items"),
            F.sum(F.col("d") * F.col("cnt")).over(wa).alias("s"),
        )
        .where(
            (F.col("cum") >= F.expr("(n_items + 1) div 2"))
            & (F.col("cum") - F.col("cnt") < F.expr("(n_items + 1) div 2"))
        )
        .select(
            "o_orderpriority",
            "n_items",
            (dd("s") / dd("n_items")).alias("mean_days"),
            F.col("d").alias("median_days"),
        )
        .orderBy("o_orderpriority")
    )


def cube_report(lineitem: DataFrame) -> DataFrame:
    """Grouping-sets CUBE over (returnflag, linestatus): the detail rows,
    both one-dimension rollups, and the grand total computed in ONE pass.
    `gid` = grouping(l_returnflag)*2 + grouping(l_linestatus) (0 = detail,
    3 = grand total) — spelled out instead of grouping_id() so the bit
    order is pinned identically in the Spark plan and the SQL oracle.

    Spark expands CUBE before the aggregate (Expand node: each input row
    fans out to the 4 grouping sets, then ONE map-side-combined hash
    aggregate) — no second pass over the fact table per rollup level,
    which is the whole point at a 100 TB fact. Money stays exact integer
    1e-4 units until the final division (same discipline as
    pricing_summary above).

    Reference: no OLAP plane in the engine (qtree serves time buckets
    only) — SURVEY 2.12 warehouse-extension surface."""
    cents = _h(F.col("l_extendedprice"))
    disc_h = _h(F.col("l_discount"))
    qty = F.round(F.col("l_quantity")).cast("long")
    src = lineitem.select(
        "l_returnflag",
        "l_linestatus",
        qty.alias("qty"),
        (cents * (F.lit(100) - disc_h)).alias("dp4"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = src.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("long")
        .alias("gid"),
        F.sum("qty").alias("sum_qty"),
        F.sum(dec("dp4")).alias("s_dp4"),
        F.count("*").alias("n_items"),
    )
    return agg.select(
        "gid",
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        (F.col("s_dp4").cast("double") / F.lit(10000.0)).alias("sum_disc_price"),
        "n_items",
    ).orderBy(
        "gid",
        F.col("l_returnflag").asc_nulls_first(),
        F.col("l_linestatus").asc_nulls_first(),
    )


def join_skew_audit(
    fact: DataFrame, key_col: str = "l_partkey", top: int = 10
) -> DataFrame:
    """Join-key skew report: the `top` heaviest values of a join key with
    their row count, share of the fact table, and ratio to the mean key
    weight — the numbers that decide whether a shuffle join on this key
    needs salting (skew_vs_mean >> 1 on a hot key) or AQE skew splitting.

    Shape: one map-side-combined groupBy(key) (the only shuffle, carrying
    one row per distinct key per task), a single-row global summary
    broadcast back, and a TakeOrderedAndProject top-k — no global sort,
    no second scan of the fact. At 100 TB the per-key table is the
    key-cardinality, not the row count."""
    per_key = fact.groupBy(key_col).agg(F.count("*").alias("cnt"))
    tot = per_key.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        per_key.join(F.broadcast(tot))
        .select(
            key_col,
            "cnt",
            (d("cnt") / d("total")).alias("share"),
            (d("cnt") * d("n_keys") / d("total")).alias("skew_vs_mean"),
        )
        .orderBy(F.col("cnt").desc(), key_col)
        .limit(top)
    )
