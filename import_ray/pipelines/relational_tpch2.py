"""TPC-H query shapes q2/q7-q22 (multi-join family).

Split from ``relational.py`` (see that module's docstring for the
float-determinism and join-strategy conventions); re-exported by
``import_ray.pipelines.relational``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.arrowutil import from_pandas_clean
from import_ray.pipelines.relational_base import _cents, _np, _np_for, _read, _read_pandas




# --- q22 shape: global-scalar broadcast + anti join --------------------------


def q22_rich_inactive_customers(sf_dir: str):
    """Customers with above-average (positive) balance and no order since
    2000, grouped by market segment. Pass 1 reduces the table to one
    (sum, count) scalar pair; pass 2 filters against the broadcast
    scalar, anti-joins the recent-order key set, and merges ≤ #segments
    partial rows driver-side. Balances compare as integer cents so the
    threshold comparison is bit-identical to the SQL oracle."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])

    def pos_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        pos = cents[cents > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())], pa.int64()),
                "c": pa.array([len(pos)], pa.int64()),
            }
        )

    sums = cust.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
    thr = float(sums["s"].sum()) / float(sums["c"].sum())

    recent = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent_keys(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(
                batch["o_orderdate"], pa.scalar(np.datetime64("2000-01-01", "us"))
            )
        ).select(["o_custkey"])

    recent = recent.map_batches(recent_keys, batch_format="pyarrow")

    def rich_kernel(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        mask = cents > thr
        return pa.table(
            {
                "c_custkey": pc.filter(batch["c_custkey"], pa.array(mask)),
                "c_mktsegment": pc.filter(batch["c_mktsegment"], pa.array(mask)),
                "bal_cents": pa.array(cents[mask], pa.int64()),
            }
        )

    rich = cust.map_batches(rich_kernel, batch_format="pyarrow")
    inactive = rich.join(
        recent,
        join_type="left_anti",
        num_partitions=_np_for(cust),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def seg_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c_mktsegment": batch["c_mktsegment"].to_pandas(),
                "bal_cents": batch["bal_cents"].to_numpy(zero_copy_only=False),
            }
        )
        g = (
            df.groupby("c_mktsegment", sort=False)["bal_cents"]
            .agg(["count", "sum"])
            .reset_index()
        )
        g.columns = ["c_mktsegment", "n_cust", "acctbal_cents"]
        return from_pandas_clean(g, preserve_index=False)

    partials = inactive.map_batches(seg_partial, batch_format="pyarrow").to_pandas()
    out = (
        partials.groupby("c_mktsegment", sort=True)[["n_cust", "acctbal_cents"]]
        .sum()
        .reset_index()
    )
    return out.astype({"n_cust": "int64", "acctbal_cents": "int64"})




Q22_SQL = """
WITH cents AS (
  SELECT c_custkey, c_mktsegment,
         CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal
  FROM customer
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(bal) AS BIGINT) AS acctbal_cents
FROM cents
WHERE bal > (SELECT AVG(bal) FROM cents WHERE bal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""




# --- q14 shape: conditional aggregate over a fact-dim join -------------------


def q14_promo_revenue(sf_dir: str):
    """Promo vs total revenue for 1996 shipments: date filter at the
    read, distributed hash join lineitem ⋈ part (part scales with SF so
    it is NOT broadcast), then a CASE-style conditional sum folded to
    one partial row per batch before a scalar aggregate."""
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def in_window(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        mask = (ship >= lo) & (ship < hi)
        t = batch.filter(pa.array(mask))
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "cents": pa.array(_cents(ep * (1.0 - disc)), pa.int64()),
            }
        )

    li = li.map_batches(in_window, batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    n = _np_for(li)
    j = li.join(
        part,
        join_type="inner",
        num_partitions=n,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def cond_partial(batch: pa.Table) -> pa.Table:
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        promo = pc.equal(batch["p_type"], pa.scalar("PROMO")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "promo_cents": pa.array([int(cents[promo].sum())], pa.int64()),
                "total_cents": pa.array([int(cents.sum())], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    totals = j.map_batches(cond_partial, batch_format="pyarrow").aggregate(
        Sum("promo_cents", alias_name="promo_cents"),
        Sum("total_cents", alias_name="total_cents"),
    )
    return pd.DataFrame(
        {
            "promo_cents": [int(totals["promo_cents"])],
            "total_cents": [int(totals["total_cents"])],
        }
    )




Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
"""




# --- q16 shape: grouped distinct count AFTER a join --------------------------


def q16_part_supplier_counts(sf_dir: str):
    """COUNT(DISTINCT supplier) per (brand, type, size) over the
    lineitem part-supplier association, excluding one brand. Local
    distinct inside the join output (the combiner), ONE keyed exchange
    on the group columns, then a block-local exact distinct count."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def local_pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False),
                "l_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return from_pandas_clean(df, preserve_index=False)

    li = li.map_batches(local_pairs, batch_format="pyarrow")

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])

    def keep_parts(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["p_brand"], pa.scalar("Brand#1")))

    part = part.map_batches(keep_parts, batch_format="pyarrow")

    n = _np_for(li)
    j = li.join(
        part,
        join_type="inner",
        num_partitions=n,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def local_distinct(batch: pa.Table) -> pa.Table:
        df = batch.select(["p_brand", "p_type", "p_size", "l_suppkey"]).to_pandas()
        return from_pandas_clean(df.drop_duplicates(), preserve_index=False)

    def block_count(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        g = (
            df.groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size()
            .reset_index(name="supplier_cnt")
        )
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(j)
    return (
        j.map_batches(local_distinct, batch_format="pyarrow")
        .repartition(n, keys=["p_brand", "p_type", "p_size"])
        .map_batches(block_count, batch_format="pyarrow", batch_size=None)
    )




Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY p_brand, p_type, p_size
"""




# --- q7 shape: two fact-side distributed joins + nation-pair grouping --------


def q7_volume_shipping(sf_dir: str):
    """Shipping volume between distinct nation pairs by ship year
    (TPC-H Q7 shape, all pairs): supplier and customer scale with SF so
    both attach via distributed hash joins (only 8-byte keys + a small
    nation-name string shuffle); nation itself is tiny and broadcast as
    a dense numpy lookup. The final grouped sum has ≤ 25·24·years
    groups — one keyed aggregate exchange."""
    nation = _read_pandas(sf_dir, "nation", ["n_nationkey", "n_name"])
    size = int(nation["n_nationkey"].max()) + 1
    nk_name = np.full(size, "", dtype=object)
    nk_name[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def sup_nation(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": batch["s_suppkey"],
                "supp_nation": pa.array(nk_name[nk], pa.string()),
            }
        )

    sup = sup.map_batches(sup_nation, batch_format="pyarrow")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cust_nation(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "cust_nation": pa.array(nk_name[nk], pa.string()),
            }
        )

    cust = cust.map_batches(cust_nation, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n_orders = _np_for(orders)
    orders = orders.join(
        cust,
        join_type="inner",
        num_partitions=n_orders,
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "cust_nation"])

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    import datetime as _dt

    lo = _dt.datetime(1995, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    def li_prep(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"]
        keep = pc.and_(
            pc.greater_equal(ship, pa.scalar(lo)), pc.less(ship, pa.scalar(hi))
        )
        batch = batch.filter(keep)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "l_year": pc.cast(pc.year(batch["l_shipdate"]), pa.int64()),
                "volume_cents": pa.array(_cents(ep * (1.0 - disc))),
            }
        )

    n_li = _np_for(li)
    li = li.map_batches(li_prep, batch_format="pyarrow")
    li = li.join(
        sup,
        join_type="inner",
        num_partitions=n_li,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=n_li,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def drop_same_nation(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(batch["supp_nation"], batch["cust_nation"])
        ).select(["supp_nation", "cust_nation", "l_year", "volume_cents"])

    j = j.map_batches(drop_same_nation, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return j.groupby(
        ["supp_nation", "cust_nation", "l_year"], num_partitions=n_li
    ).aggregate(Sum("volume_cents", alias_name="revenue_cents"))




Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume_cents) AS BIGINT) AS revenue_cents
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS volume_cents
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
"""




# --- q8 shape: market share (conditional sums after a 4-way join) ------------


def q8_market_share(sf_dir: str, target_nation: str = "NATION_1"):
    """National market share by order year (TPC-H Q8 shape): revenue
    from `target_nation` suppliers vs total, restricted to ECONOMY
    parts and AMERICA-region customers. part/supplier/customer all
    scale with SF → semi-join on part keys, distributed inner joins for
    supplier/customer sides; the final conditional sums collapse to ≤
    #years rows via per-block partials (no global exchange). The
    numerator/denominator are returned as integer cents (a ratio column
    would be engine-dependent fp)."""
    nation = _read_pandas(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read_pandas(sf_dir, "region", ["r_regionkey", "r_name"])
    r_names = dict(zip(region["r_regionkey"], region["r_name"]))
    size = int(nation["n_nationkey"].max()) + 1
    nk_name = np.full(size, "", dtype=object)
    nk_region = np.full(size, "", dtype=object)
    nk_name[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()
    nk_region[nation["n_nationkey"].to_numpy()] = (
        nation["n_regionkey"].map(r_names).to_numpy()
    )

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def econ_keys(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["p_type"], pa.scalar("ECONOMY"))).select(
            ["p_partkey"]
        )

    part = part.map_batches(econ_keys, batch_format="pyarrow")

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def sup_nation(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": batch["s_suppkey"],
                "supp_nation": pa.array(nk_name[nk], pa.string()),
            }
        )

    sup = sup.map_batches(sup_nation, batch_format="pyarrow")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def america_keys(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nk_region[nk] == "AMERICA"
        return pa.table(
            {"c_custkey": pa.array(batch["c_custkey"].to_numpy(zero_copy_only=False)[keep])}
        )

    cust = cust.map_batches(america_keys, batch_format="pyarrow")

    import datetime as _dt

    lo = _dt.datetime(1995, 1, 1)
    hi = _dt.datetime(1997, 1, 1)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def orders_prep(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"]
        keep = pc.and_(
            pc.greater_equal(od, pa.scalar(lo)), pc.less(od, pa.scalar(hi))
        )
        batch = batch.filter(keep)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
            }
        )

    n_orders = _np_for(orders)
    orders = orders.map_batches(orders_prep, batch_format="pyarrow")
    orders = orders.join(
        cust,
        join_type="left_semi",
        num_partitions=n_orders,
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_year"])

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    n_li = _np_for(li)
    li = li.join(
        part,
        join_type="left_semi",
        num_partitions=n_li,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def volume(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "volume_cents": pa.array(_cents(ep * (1.0 - disc))),
            }
        )

    li = li.map_batches(volume, batch_format="pyarrow")
    li = li.join(
        sup,
        join_type="inner",
        num_partitions=n_li,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=n_li,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def year_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_year": batch["o_year"].to_numpy(zero_copy_only=False),
                "vol": batch["volume_cents"].to_numpy(zero_copy_only=False),
                "nat": np.where(
                    batch["supp_nation"].to_numpy(zero_copy_only=False)
                    == target_nation,
                    batch["volume_cents"].to_numpy(zero_copy_only=False),
                    0,
                ),
            }
        )
        g = df.groupby("o_year", sort=False).sum().reset_index()
        return from_pandas_clean(
            g.rename(columns={"nat": "nation_cents", "vol": "total_cents"}),
            preserve_index=False,
        )

    partials = j.map_batches(year_partials, batch_format="pyarrow").to_pandas()
    out = (
        partials.groupby("o_year", sort=True)[["nation_cents", "total_cents"]]
        .sum()
        .reset_index()
    )
    return out[["o_year", "nation_cents", "total_cents"]]




Q8_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume_cents ELSE 0 END) AS BIGINT) AS nation_cents,
       CAST(SUM(volume_cents) AS BIGINT) AS total_cents
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS volume_cents,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
)
GROUP BY o_year
ORDER BY o_year
"""




# --- q10 shape: returned-item revenue per customer, top 20 -------------------


def q10_returned_items(sf_dir: str):
    """Revenue lost to returns per customer in one quarter (TPC-H Q10
    shape): per-block revenue partials keyed on l_orderkey, a
    distributed inner join onto the date-filtered orders, ONE keyed
    exchange on o_custkey to finalize per-customer sums, a distributed
    join back to customer attributes (broadcast nation names), then
    block-local top-20 partials merged driver-side (20 × #blocks rows)."""
    import datetime as _dt

    lo = _dt.datetime(1996, 10, 1)
    hi = _dt.datetime(1997, 1, 1)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def orders_window(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"]
        keep = pc.and_(
            pc.greater_equal(od, pa.scalar(lo)), pc.less(od, pa.scalar(hi))
        )
        return batch.filter(keep).select(["o_orderkey", "o_custkey"])

    n_orders = _np_for(orders)
    orders = orders.map_batches(orders_window, batch_format="pyarrow")

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def returned_revenue(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["l_returnflag"], pa.scalar("R")))
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "revenue_cents": _cents(ep * (1.0 - disc)),
            }
        )
        g = df.groupby("l_orderkey", sort=False).sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    n_li = _np_for(li)
    li = li.map_batches(returned_revenue, batch_format="pyarrow")
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=n_li,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def cust_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "revenue_cents": batch["revenue_cents"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("o_custkey", sort=False).sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    def block_sum(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", sort=False)["revenue_cents"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(j)
    per_cust = (
        j.map_batches(cust_partials, batch_format="pyarrow")
        .repartition(n_orders, keys=["o_custkey"])
        .map_batches(block_sum, batch_format="pyarrow", batch_size=None)
    )

    nation = _read_pandas(sf_dir, "nation", ["n_nationkey", "n_name"])
    size = int(nation["n_nationkey"].max()) + 1
    nk_name = np.full(size, "", dtype=object)
    nk_name[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    j2 = per_cust.join(
        cust,
        join_type="inner",
        num_partitions=n_orders,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def block_top20(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        nk = df["c_nationkey"].to_numpy().astype(np.int64)
        df["n_name"] = nk_name[nk]
        df["acctbal_cents"] = _cents(df["c_acctbal"].to_numpy())
        df = df.sort_values(
            ["revenue_cents", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(20)
        return from_pandas_clean(
            df[["o_custkey", "c_name", "revenue_cents", "acctbal_cents", "n_name"]],
            preserve_index=False,
        )

    partials = j2.map_batches(block_top20, batch_format="pyarrow").to_pandas()
    return (
        partials.sort_values(
            ["revenue_cents", "o_custkey"], ascending=[False, True], kind="mergesort"
        )
        .head(20)
        .reset_index(drop=True)
    )




Q10_SQL = """
SELECT o_custkey, c_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY o_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_cents DESC, o_custkey
LIMIT 20
"""




# --- q15 shape: argmax-with-ties via global-scalar broadcast ------------------


def q15_top_supplier(sf_dir: str):
    """The supplier(s) with the maximum revenue in a quarter (TPC-H Q15
    shape, ties preserved): per-block revenue partials keyed on
    l_suppkey, ONE keyed exchange to finalize per-supplier totals, a
    tiny Max aggregate reduced to a driver scalar, an equality filter
    against the broadcast scalar, and a distributed join for the
    supplier name. Only the (few) winners reach the driver."""
    import datetime as _dt

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 4, 1)
    li = _read(
        sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    def rev_partials(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"]
        keep = pc.and_(
            pc.greater_equal(ship, pa.scalar(lo)), pc.less(ship, pa.scalar(hi))
        )
        batch = batch.filter(keep)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "total_cents": _cents(ep * (1.0 - disc)),
            }
        )
        g = df.groupby("l_suppkey", sort=False).sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    def block_sum(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_suppkey", sort=False)["total_cents"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(li)
    n = _np_for(li)
    totals = (
        li.map_batches(rev_partials, batch_format="pyarrow")
        .repartition(n, keys=["l_suppkey"])
        .map_batches(block_sum, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    from ray.data.aggregate import Max

    mx = totals.aggregate(Max("total_cents", alias_name="mx"))["mx"]

    def winners(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["total_cents"], pa.scalar(mx)))

    win = totals.map_batches(winners, batch_format="pyarrow")
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = win.join(
        sup,
        join_type="inner",
        num_partitions=4,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    ).to_pandas()
    out = out.rename(columns={"l_suppkey": "s_suppkey"})
    return (
        out[["s_suppkey", "s_name", "total_cents"]]
        .sort_values("s_suppkey", kind="mergesort")
        .reset_index(drop=True)
    )




Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_cents
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
ORDER BY s_suppkey
"""




# --- q19 shape: disjunctive multi-predicate join reduced to a scalar ---------


def q19_disjunctive_revenue(sf_dir: str):
    """Revenue under three disjunctive (brand, size-range, qty-range)
    predicates (TPC-H Q19 shape): part is pre-filtered to the three
    brands before the distributed hash join (key + two small columns
    shuffle), the disjunction evaluates vectorized in numpy over the
    joined batches, and per-batch partial sums collapse to one scalar —
    no global exchange at all."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    brands = ("Brand#12", "Brand#23", "Brand#34")

    def keep_brands(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["p_brand"], pa.array(brands)))

    part = part.map_batches(keep_brands, batch_format="pyarrow")

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )
    n = _np_for(li)
    j = li.join(
        part,
        join_type="inner",
        num_partitions=n,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial_sum(batch: pa.Table) -> pa.Table:
        brand = batch["p_brand"].to_numpy(zero_copy_only=False)
        size = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        keep = (
            ((brand == "Brand#12") & (size >= 1) & (size <= 15) & (qty >= 1) & (qty <= 25))
            | ((brand == "Brand#23") & (size >= 1) & (size <= 20) & (qty >= 10) & (qty <= 35))
            | ((brand == "Brand#34") & (size >= 1) & (size <= 25) & (qty >= 20) & (qty <= 45))
        )
        s = int(_cents(ep[keep] * (1.0 - disc[keep])).sum())
        return pa.table({"revenue_cents": pa.array([s], pa.int64())})

    partials = j.map_batches(partial_sum, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue_cents": [int(partials["revenue_cents"].sum())]})




Q19_SQL = """
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)), 0) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 25)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 45)
"""




# --- q21 shape: sole-fault supplier via exists / not-exists on one fact ------


def q21_sole_return_suppliers(sf_dir: str, broadcast_limit: int = 2_000_000):
    """Suppliers who were the ONLY supplier with returned ('R') items in
    a multi-supplier order (TPC-H Q21's exists/not-exists shape on a
    single fact table): per-block distinct (orderkey, suppkey, has_r)
    partials, ONE keyed exchange on l_orderkey so each block holds whole
    orders, block-local exists/not-exists evaluation, a per-supplier
    count aggregate, a distributed name join, and block-local top-100
    partials merged driver-side."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "has_r": (
                    batch["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
                ).astype(np.int64),
            }
        )
        g = df.groupby(["l_orderkey", "l_suppkey"], sort=False)["has_r"].max().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    def block_eval(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        per = df.groupby(["l_orderkey", "l_suppkey"], sort=False)["has_r"].max().reset_index()
        ord_stats = per.groupby("l_orderkey", sort=False).agg(
            nsupp=("l_suppkey", "size"), nr=("has_r", "sum")
        )
        per = per.join(ord_stats, on="l_orderkey")
        hit = per[(per["has_r"] == 1) & (per["nsupp"] >= 2) & (per["nr"] == 1)]
        g = hit.groupby("l_suppkey", sort=False).size().reset_index(name="numwait")
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(li)
    n = _np_for(li)
    per_supp_partials = (
        li.map_batches(pair_partials, batch_format="pyarrow")
        .repartition(n, keys=["l_orderkey"])
        .map_batches(block_eval, batch_format="pyarrow", batch_size=None)
    )

    def supp_sum(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_suppkey", sort=False)["numwait"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    per_supp = (
        per_supp_partials.repartition(max(4, n // 4), keys=["l_suppkey"])
        .map_batches(supp_sum, batch_format="pyarrow", batch_size=None)
    )

    import ray

    from import_ray.core.context import join_safe

    sup = join_safe(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    sup_ref = None
    if sup.count() <= broadcast_limit:
        sdf = sup.to_pandas().sort_values("s_suppkey")
        sup_ref = ray.put(
            (sdf["s_suppkey"].to_numpy(), sdf["s_name"].to_numpy(dtype=object))
        )
    if sup_ref is not None:

        def attach_names(batch: pa.Table) -> pa.Table:
            keys, names = ray.get(sup_ref)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(keys, sk), 0, len(keys) - 1)
            keep = keys[pos] == sk
            t = batch.filter(pa.array(keep))
            return t.append_column(
                "s_name", pa.array(names[pos[keep]], pa.string())
            )

        # supplier names broadcast (dim-scale budget): the name attach is
        # a per-batch searchsorted lookup — no join exchange
        j = per_supp.map_batches(attach_names, batch_format="pyarrow")
    else:
        j = per_supp.join(
            sup,
            join_type="inner",
            num_partitions=max(4, n // 4),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        )

    def block_top100(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["numwait", "l_suppkey"], ascending=[False, True], kind="mergesort"
        ).head(100)
        df = df.rename(columns={"l_suppkey": "s_suppkey"})
        return from_pandas_clean(
            df[["s_suppkey", "s_name", "numwait"]], preserve_index=False
        )

    partials = j.map_batches(block_top100, batch_format="pyarrow").to_pandas()
    return (
        partials.sort_values(
            ["numwait", "s_suppkey"], ascending=[False, True], kind="mergesort"
        )
        .head(100)
        .reset_index(drop=True)
    )




Q21_SQL = """
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem
  GROUP BY l_orderkey, l_suppkey
), ord AS (
  SELECT l_orderkey, COUNT(*) AS nsupp, SUM(has_r) AS nr
  FROM per GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per
JOIN ord USING (l_orderkey)
JOIN supplier ON s_suppkey = per.l_suppkey
WHERE per.has_r = 1 AND ord.nsupp >= 2 AND ord.nr = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 100
"""



# --- q2 shape: per-group argmin with fused join-back (TPC-H Q2) --------------


def _nation_region_arrays(sf_dir: str):
    """Dense nationkey→(n_name, r_name) lookup arrays. nation/region are
    fixed 25/5-row dimensions — broadcast into kernels, never shuffled."""
    nation = _read_pandas(sf_dir, "nation")
    region = _read_pandas(sf_dir, "region")
    r_names = dict(zip(region["r_regionkey"], region["r_name"]))
    size = int(nation["n_nationkey"].max()) + 1
    nk_name = np.full(size, "", dtype=object)
    nk_region = np.full(size, "", dtype=object)
    nk_name[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()
    nk_region[nation["n_nationkey"].to_numpy()] = (
        nation["n_regionkey"].map(r_names).to_numpy()
    )
    return nk_name, nk_region




def q2_min_cost_supplier(
    sf_dir: str,
    size: int = 15,
    region: str = "EUROPE",
    broadcast_limit: int = 2_000_000,
):
    """TPC-H Q2 shape (the schema has no partsupp; the lineitem
    (partkey, suppkey) association with unit cost
    round(extendedprice/quantity*100) stands in for supplycost): for
    each size-`size` part, the `region` supplier(s) achieving the
    per-part minimum unit cost.

    Both dim sides are FILTER-TINY (size-`size` parts ~2% of part,
    `region` suppliers ~20% of supplier), so the default plan
    broadcasts them (``ray.put`` once, node-local fetch per task) and
    the whole correlated-subquery query costs ONE exchange:

    1. map: np.isin prefilter on the broadcast partkey set (prunes
       ~98% of lineitem BEFORE anything shuffles) + EU-suppkey filter
       + in-batch (part, supplier) min combiner;
    2. keyed repartition on partkey co-locates each part's pairs;
    3. block scan: per-pair global min -> per-part argmin (ties kept,
       as in the SQL) -> supplier attrs attached from the broadcast
       frame.

    Past ``broadcast_limit`` rows on either dim side, that side falls
    back to the distributed hash join (the SF-scaled path; dims grow
    with SF but the filtered sets broadcast comfortably until the
    multi-billion-part regime)."""
    import ray

    from import_ray.core.context import ensure_hash_shuffle, join_safe

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    )
    n = _np_for(li)
    nk_name, nk_region = _nation_region_arrays(sf_dir)

    def size_parts(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["p_size"], pa.scalar(size))).select(
            ["p_partkey"]
        )

    part_f = join_safe(
        _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
            size_parts, batch_format="pyarrow"
        )
    )

    def supp_region(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nk_region[nk] == region
        mask = pa.array(keep)
        return pa.table(
            {
                "s_suppkey": pc.filter(batch["s_suppkey"], mask),
                "s_name": pc.filter(batch["s_name"], mask),
                "n_name": pa.array(nk_name[nk][keep], pa.string()),
                "acctbal_cents": pa.array(
                    _cents(batch["s_acctbal"].to_numpy(zero_copy_only=False))[keep],
                    pa.int64(),
                ),
            }
        )

    supp = join_safe(
        _read(
            sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
        ).map_batches(supp_region, batch_format="pyarrow")
    )

    if part_f.count() > broadcast_limit or supp.count() > broadcast_limit:
        return _q2_join_plan(li, part_f, supp, n)

    part_ref = ray.put(np.sort(part_f.to_pandas()["p_partkey"].to_numpy()))
    supp_pdf = supp.to_pandas()
    supp_keys_ref = ray.put(np.sort(supp_pdf["s_suppkey"].to_numpy()))
    supp_ref = ray.put(supp_pdf)

    def unit_cost(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(pk, ray.get(part_ref)) & np.isin(sk, ray.get(supp_keys_ref))
        t = batch.filter(pa.array(keep))
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
                "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "cost_cents": _cents(ep / qty),
            }
        )
        g = (
            df.groupby(["l_partkey", "l_suppkey"], sort=False)["cost_cents"]
            .min()
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    def part_argmin_bcast(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = (
            df.groupby(["l_partkey", "l_suppkey"], sort=False)["cost_cents"]
            .min()
            .reset_index()
        )
        df = df[
            df["cost_cents"] == df.groupby("l_partkey")["cost_cents"].transform("min")
        ]
        df = df.merge(ray.get(supp_ref), left_on="l_suppkey", right_on="s_suppkey")
        df = df.rename(columns={"l_partkey": "p_partkey"})
        return from_pandas_clean(
            df[["p_partkey", "s_name", "n_name", "acctbal_cents", "cost_cents"]],
            preserve_index=False,
        )

    pairs = li.map_batches(unit_cost, batch_format="pyarrow")
    ensure_hash_shuffle(pairs)
    return pairs.repartition(max(2, n // 4), keys=["l_partkey"]).map_batches(
        part_argmin_bcast, batch_format="pyarrow", batch_size=None
    )




def _q2_join_plan(li, part_f, supp, n):
    """SF-scaled fallback: distributed hash joins on both dim sides
    (see q2_min_cost_supplier — selected when a filtered dim side
    exceeds the broadcast budget)."""

    def unit_cost(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False),
                "l_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "cost_cents": _cents(ep / qty),
            }
        )
        g = (
            df.groupby(["l_partkey", "l_suppkey"], sort=False)["cost_cents"]
            .min()
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    from ray.data.aggregate import Min

    from import_ray.core.context import ensure_hash_shuffle, join_safe

    cost = join_safe(
        li.map_batches(unit_cost, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"], num_partitions=n)
        .aggregate(Min("cost_cents", alias_name="cost_cents"))
    )
    cost = cost.join(
        supp,
        join_type="inner",
        num_partitions=n,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )
    j = cost.join(
        part_f,
        join_type="inner",
        num_partitions=n,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def part_argmin(batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["l_partkey", "s_name", "n_name", "acctbal_cents", "cost_cents"]
        ).to_pandas()
        df = df[
            df["cost_cents"] == df.groupby("l_partkey")["cost_cents"].transform("min")
        ]
        df = df.rename(columns={"l_partkey": "p_partkey"})
        return from_pandas_clean(df, preserve_index=False)

    ensure_hash_shuffle(j)
    return j.repartition(n, keys=["l_partkey"]).map_batches(
        part_argmin, batch_format="pyarrow", batch_size=None
    )




Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT)) AS cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT l_partkey, s_name, n_name,
         CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_cents, cost_cents
  FROM cost
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT eu.l_partkey AS p_partkey, s_name, n_name, acctbal_cents, cost_cents
FROM eu JOIN part ON eu.l_partkey = p_partkey
WHERE p_size = 15
  AND cost_cents = (SELECT MIN(e2.cost_cents) FROM eu e2
                    WHERE e2.l_partkey = eu.l_partkey)
"""



# --- q9 shape: multi-join profit by nation/year (TPC-H Q9) -------------------


def q9_profit_by_nation_year(
    sf_dir: str, token: str = "gear", broadcast_limit: int = 2_000_000
):
    """TPC-H Q9 shape: profit per (supplier nation, order year) for
    parts whose name contains `token`. supplycost has no table here, so
    profit = extendedprice*(1-discount) - 0.1*retailprice*quantity,
    rounded to integer cents per row (identically in the SQL oracle).

    Plan: the token-filtered part map (partkey → retailprice) and the
    supplier map (suppkey → nationkey) broadcast when they fit the
    budget (ray.put + sorted-key searchsorted lookup per batch), so the
    ONLY distributed join is the genuine fact-fact lineitem ⋈ orders
    year lookup; in-batch partial sums feed one final (nation, year)
    exchange of ≤ 25×#years rows. Past the budget each dim side falls
    back to its distributed hash join."""
    import ray

    from import_ray.core.context import join_safe

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    def keep_parts(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(batch["p_name"], token)
        return pa.table(
            {
                "p_partkey": pc.filter(batch["p_partkey"], mask),
                "p_retailprice": pc.filter(batch["p_retailprice"], mask),
            }
        )

    part = join_safe(part.map_batches(keep_parts, batch_format="pyarrow"))
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
    )
    n = _np_for(li)
    supp = join_safe(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))

    part_small = part.count() <= broadcast_limit
    supp_small = supp.count() <= broadcast_limit
    part_ref = supp_ref = None
    if part_small:
        pdf = part.to_pandas().sort_values("p_partkey")
        part_ref = ray.put(
            (pdf["p_partkey"].to_numpy(), pdf["p_retailprice"].to_numpy())
        )
    if supp_small:
        sdf = supp.to_pandas().sort_values("s_suppkey")
        supp_ref = ray.put(
            (sdf["s_suppkey"].to_numpy(), sdf["s_nationkey"].to_numpy().astype(np.int64))
        )

    def amount_bcast(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        keys, rp_vals = ray.get(part_ref)
        pos = np.searchsorted(keys, pk)
        pos[pos >= len(keys)] = 0
        keep = keys[pos] == pk
        t = batch.filter(pa.array(keep))
        rp = rp_vals[pos[keep]]
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        out = {
            "l_orderkey": t["l_orderkey"],
            "amount_cents": pa.array(
                _cents(ep * (1.0 - disc) - 0.1 * rp * qty), pa.int64()
            ),
        }
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        if supp_ref is not None:
            skeys, nks = ray.get(supp_ref)
            spos = np.clip(np.searchsorted(skeys, sk), 0, len(skeys) - 1)
            out["s_nationkey"] = pa.array(nks[spos], pa.int64())
        else:
            out["l_suppkey"] = t["l_suppkey"]
        return pa.table(out)

    def amount_join(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        rp = batch["p_retailprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "amount_cents": pa.array(
                    _cents(ep * (1.0 - disc) - 0.1 * rp * qty), pa.int64()
                ),
            }
        )

    if part_small:
        j = li.map_batches(amount_bcast, batch_format="pyarrow")
    else:
        j = li.join(
            part,
            join_type="inner",
            num_partitions=n,
            on=("l_partkey",),
            right_on=("p_partkey",),
        ).map_batches(amount_join, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def order_year(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
            }
        )

    orders = orders.map_batches(order_year, batch_format="pyarrow")
    j = j.join(
        orders,
        join_type="inner",
        num_partitions=n,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    if not supp_small or not part_small:
        if supp_ref is not None:

            def attach_nk(batch: pa.Table) -> pa.Table:
                skeys, nks = ray.get(supp_ref)
                sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
                spos = np.clip(np.searchsorted(skeys, sk), 0, len(skeys) - 1)
                return batch.drop_columns(["l_suppkey"]).append_column(
                    "s_nationkey", pa.array(nks[spos], pa.int64())
                )

            j = j.map_batches(attach_nk, batch_format="pyarrow")
        else:
            j = j.join(
                supp,
                join_type="inner",
                num_partitions=n,
                on=("l_suppkey",),
                right_on=("s_suppkey",),
            )

    nk_name, _ = _nation_region_arrays(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "n_name": nk_name[nk],
                "o_year": batch["o_year"].to_numpy(zero_copy_only=False),
                "profit_cents": batch["amount_cents"].to_numpy(zero_copy_only=False),
            }
        )
        g = (
            df.groupby(["n_name", "o_year"], sort=False)["profit_cents"]
            .sum()
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby(["n_name", "o_year"], num_partitions=max(2, n // 4))
        .aggregate(Sum("profit_cents", alias_name="profit_cents"))
    )




Q9_SQL = """
SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND((l_extendedprice*(1-l_discount)
                            - 0.1*p_retailprice*l_quantity)*100) AS BIGINT))
            AS BIGINT) AS profit_cents
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
"""



# --- q11 shape: global-share threshold over grouped value (TPC-H Q11) --------


def q11_important_parts(
    sf_dir: str,
    region: str = "ASIA",
    mult: float = 2.0,
    broadcast_limit: int = 2_000_000,
):
    """TPC-H Q11 shape: per-part shipped value for suppliers in `region`,
    keeping parts whose value exceeds `mult`× the mean per-part value
    (the global-share threshold; TPC-H's FRACTION is SF-dependent, the
    mean-multiple is scale-free).

    Plan: region filter via broadcast nation/region arrays, then —
    while the filtered suppkey set fits the broadcast budget — an
    in-batch ``np.isin`` semi-filter fused with the per-part partial
    sums, so the ONLY exchange in the whole query is the final partkey
    fold; past the budget the semi-filter falls back to a distributed
    hash semi-join on 8-byte keys. Grand total + part count reduce to
    two driver scalars (the Q11 HAVING subquery) → broadcast threshold
    filter. Wide rows never move; only (partkey, cents) pairs shuffle."""
    import ray

    _, nk_region = _nation_region_arrays(sf_dir)

    def region_supp(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"s_suppkey": pc.filter(batch["s_suppkey"], pa.array(nk_region[nk] == region))}
        )

    from import_ray.core.context import join_safe

    supp = join_safe(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            region_supp, batch_format="pyarrow"
        )
    )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
    n = _np_for(li)

    supp_ref = None
    if supp.count() <= broadcast_limit:
        skeys = np.sort(supp.to_pandas()["s_suppkey"].to_numpy())
        supp_ref = ray.put(skeys)

    def partial_bcast(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        keys = ray.get(supp_ref)
        pos = np.clip(np.searchsorted(keys, sk), 0, len(keys) - 1)
        keep = keys[pos] == sk
        df = pd.DataFrame(
            {
                "p_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False)[keep],
                "value_cents": _cents(
                    batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
                ),
            }
        )
        g = df.groupby("p_partkey", sort=False)["value_cents"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    def partial_join(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "p_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False),
                "value_cents": batch["value_cents"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("p_partkey", sort=False)["value_cents"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    if supp_ref is not None:
        partials = li.map_batches(partial_bcast, batch_format="pyarrow")
    else:

        def to_cents(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_partkey": batch["l_partkey"],
                    "l_suppkey": batch["l_suppkey"],
                    "value_cents": pa.array(
                        _cents(
                            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                        ),
                        pa.int64(),
                    ),
                }
            )

        partials = li.map_batches(to_cents, batch_format="pyarrow").join(
            supp,
            join_type="inner",
            num_partitions=n,
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        ).map_batches(partial_join, batch_format="pyarrow")

    # final fold as repartition + block-local sum (no groupby aggregator
    # pool spin-up; partials are ≤ #parts × #blocks rows of 16 B)
    def fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("p_partkey", sort=False)["value_cents"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(partials)
    value = partials.repartition(n, keys=["p_partkey"]).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )

    def totals(batch: pa.Table) -> pa.Table:
        v = batch["value_cents"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array([int(v.sum())], pa.int64()),
                "c": pa.array([len(v)], pa.int64()),
            }
        )

    # the per-part sums materialize once (they are ≤ #parts rows) and
    # feed both the scalar reduce and the threshold filter
    value = value.materialize()
    t = value.map_batches(totals, batch_format="pyarrow").to_pandas()
    thr = mult * float(t["s"].sum()) / float(t["c"].sum())

    def keep(batch: pa.Table) -> pa.Table:
        v = batch["value_cents"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v > thr))

    return value.map_batches(keep, batch_format="pyarrow")




Q11_SQL = """
WITH v AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY l_partkey
)
SELECT p_partkey, value_cents FROM v
WHERE value_cents > (SELECT 2.0 * AVG(value_cents) FROM v)
"""




# --- q20 shape: majority-share semi-join chain (TPC-H Q20) -------------------


def q20_dominant_part_suppliers(
    sf_dir: str, region: str = "EUROPE", broadcast_limit: int = 2_000_000
):
    """TPC-H Q20 shape: `region` suppliers who shipped a strict majority
    (2×qty > part total) of some 'red%' part's 1997 volume (availqty
    has no table here; the majority-share test stands in).

    Plan (TWO exchanges when the filter-tiny dims fit the broadcast
    budget): red-part keys broadcast → np.isin prefilter + in-batch
    (part, supplier) qty combiner → ONE partkey exchange fuses the
    global pair sum with the per-part majority scan → winner suppkeys
    (result-scale) → ONE suppkey exchange for the cross-block distinct,
    with region/name attrs attached from the broadcast supplier frame
    in the same block pass. Past the budget either dim side falls back
    to its distributed hash join."""
    import ray

    from import_ray.core.context import ensure_hash_shuffle, join_safe

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def red_parts(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.starts_with(batch["p_name"], "red")
        ).select(["p_partkey"])

    part = join_safe(part.map_batches(red_parts, batch_format="pyarrow"))

    nk_name, nk_region = _nation_region_arrays(sf_dir)

    def region_supp(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nk_region[nk] == region
        mask = pa.array(keep)
        return pa.table(
            {
                "s_suppkey": pc.filter(batch["s_suppkey"], mask),
                "s_name": pc.filter(batch["s_name"], mask),
                "n_name": pa.array(nk_name[nk][keep], pa.string()),
            }
        )

    supp = join_safe(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
            region_supp, batch_format="pyarrow"
        )
    )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    n = _np_for(li)

    part_ref = (
        ray.put(np.sort(part.to_pandas()["p_partkey"].to_numpy()))
        if part.count() <= broadcast_limit
        else None
    )
    supp_ref = None
    if supp.count() <= broadcast_limit:
        supp_ref = ray.put(supp.to_pandas().sort_values("s_suppkey"))

    def y1997(batch: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1997-01-01", "us"))
        hi = pa.scalar(np.datetime64("1998-01-01", "us"))
        mask = pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo),
            pc.less(batch["l_shipdate"], hi),
        ).to_numpy(zero_copy_only=False)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        if part_ref is not None:
            mask = mask & np.isin(pk, ray.get(part_ref))
        df = pd.DataFrame(
            {
                "l_partkey": pk[mask],
                "l_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False)[mask],
                "qty": batch["l_quantity"]
                .to_numpy(zero_copy_only=False)[mask]
                .astype(np.int64),
            }
        )
        g = df.groupby(["l_partkey", "l_suppkey"], sort=False)["qty"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    shipped = li.map_batches(y1997, batch_format="pyarrow")
    if part_ref is None:
        shipped = shipped.join(
            part,
            join_type="inner",
            num_partitions=n,
            on=("l_partkey",),
            right_on=("p_partkey",),
        )

    def majority(batch: pa.Table) -> pa.Table:
        # fused: global per-pair sum (all partials of a partkey are in
        # this block) + the per-part majority scan
        df = batch.select(["l_partkey", "l_suppkey", "qty"]).to_pandas()
        df = (
            df.groupby(["l_partkey", "l_suppkey"], sort=False)["qty"]
            .sum()
            .reset_index()
        )
        total = df.groupby("l_partkey")["qty"].transform("sum")
        df = df[2 * df["qty"] > total]
        return from_pandas_clean(df[["l_suppkey"]].drop_duplicates(), preserve_index=False)

    ensure_hash_shuffle(shipped)
    winners = (
        shipped.repartition(n, keys=["l_partkey"])
        .map_batches(majority, batch_format="pyarrow", batch_size=None)
        # the same supplier can dominate parts in different partkey
        # blocks: one keyed exchange of 8-byte keys makes them distinct
        .repartition(max(2, n // 4), keys=["l_suppkey"])
    )

    if supp_ref is not None:

        def attach(batch: pa.Table) -> pa.Table:
            sdf = ray.get(supp_ref)
            sk = np.unique(batch["l_suppkey"].to_numpy(zero_copy_only=False))
            out = pd.DataFrame({"s_suppkey": sk}).merge(sdf, on="s_suppkey")
            return from_pandas_clean(out[["s_name", "n_name"]], preserve_index=False)

        return winners.map_batches(attach, batch_format="pyarrow", batch_size=None)

    distinct = winners.map_batches(
        lambda b: b.group_by("l_suppkey").aggregate([]),
        batch_format="pyarrow",
        batch_size=None,
    )
    out = supp.join(
        join_safe(distinct),
        join_type="inner",
        num_partitions=n,
        on=("s_suppkey",),
        right_on=("l_suppkey",),
    )
    return out.select_columns(["s_name", "n_name"])




Q20_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped s1
    WHERE 2*qty > (SELECT SUM(qty) FROM shipped s2
                   WHERE s2.l_partkey = s1.l_partkey))
ORDER BY s_name, n_name
"""
