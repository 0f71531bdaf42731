"""TPC-H query shapes q1-q18 + scans/set ops/diffs.

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




# --- q1: grouped aggregation (TPC-H Q1 shape; SURVEY §2.7) -------------------


def q1_pricing_summary(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        from datetime import datetime

        t = batch.filter(pc.less(batch["l_shipdate"], pa.scalar(datetime(1999, 1, 1))))
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        tbl = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pa.array(qty.astype(np.int64)),
                "base_cents": pa.array(_cents(ep)),
                "disc_cents": pa.array(_cents(ep * (1.0 - disc))),
                "one": pa.array(np.ones(len(t), np.int64)),
            }
        )
        # pre-aggregate inside the batch → the groupby shuffles ≤8 rows/batch
        return tbl.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"), ("disc_cents", "sum"), ("one", "sum")]
        ).rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents", "sum_disc_cents", "count_order"]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=_np_for(ds))
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    return out




Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l_returnflag, l_linestatus
"""




# --- q3: broadcast join + shuffle join + top-k (SURVEY §2.6/2.8) -------------


def q3_top_orders(sf_dir: str):
    # customer scales with SF — keep it distributed: filter to the BUILDING
    # segment inside map_batches, then a hash semi-join onto orders (only
    # the 8-byte key column ever shuffles from the customer side).
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def building_keys(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch["c_mktsegment"], pa.scalar("BUILDING"))
        ).select(["c_custkey"])

    cust = cust.map_batches(building_keys, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    n_orders = _np_for(orders)
    orders = orders.join(
        cust,
        join_type="left_semi",
        num_partitions=n_orders,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "revenue_cents": pa.array(_cents(ep * (1.0 - disc))),
            }
        )

    n_li = _np_for(li)
    li = li.map_batches(revenue, batch_format="pyarrow")
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=n_li,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    # the join hash-partitioned on l_orderkey; re-key explicitly so each
    # block holds ALL rows of its keys, then a block-local sum + local
    # top-10 per block (a per-group HashAggregate over #orders groups +
    # a global sort measured 2× this shape) — only 10 × #blocks partial
    # rows reach the driver merge
    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["l_orderkey", "o_orderdate"], sort=False)["revenue_cents"]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(10)
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(joined)
    partials = (
        joined.repartition(n_li, keys=["l_orderkey"])
        .map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        partials.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True], kind="mergesort"
        )
        .head(10)
        .reset_index(drop=True)
    )




Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""




# --- q5: multi-way broadcast join + grouped sum ------------------------------


def q5_region_revenue(sf_dir: str):
    # nation/region are genuinely tiny (25/5 rows) → broadcast as dense
    # numpy lookup arrays indexed by nationkey (vectorized fancy-index,
    # no per-row Python). customer scales with SF → distributed hash join.
    nation = _read_pandas(sf_dir, "nation")
    region = _read_pandas(sf_dir, "region")
    r_names = dict(zip(region["r_regionkey"], region["r_name"]))
    size = int(nation["n_nationkey"].max()) + 1
    nk_name = np.full(size, "", dtype=object)
    nk_region = np.full(size, "", dtype=object)
    nk_name[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()
    nk_region[nation["n_nationkey"].to_numpy()] = nation["n_regionkey"].map(r_names).to_numpy()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n_orders = _np_for(orders)
    orders = orders.join(
        cust,
        join_type="inner",
        num_partitions=n_orders,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def order_nation(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "n_name": pa.array(nk_name[nk], pa.string()),
                "r_name": pa.array(nk_region[nk], pa.string()),
            }
        )

    orders = orders.map_batches(order_nation, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        # in-batch per-order combine: ~4 lineitems/order collapse before
        # the join, so the exchange carries order-grain partials
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "revenue_cents": _cents(ep * (1.0 - disc)),
            }
        )
        g = df.groupby("l_orderkey", sort=False)["revenue_cents"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    n_li = _np_for(li)
    li = li.map_batches(revenue, batch_format="pyarrow")
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=n_li,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def nation_partial(batch: pa.Table) -> pa.Table:
        # ≤25 rows leave each batch: the final exchange is schema-scale
        df = batch.select(["r_name", "n_name", "revenue_cents"]).to_pandas()
        g = (
            df.groupby(["r_name", "n_name"], sort=False)["revenue_cents"]
            .sum()
            .reset_index()
        )
        return from_pandas_clean(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .groupby(["r_name", "n_name"], num_partitions=max(2, n_li // 4))
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )




Q5_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""




# --- distinct / filter+project (SURVEY §2.9 / §2.3) --------------------------


def distinct_mktsegment(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    return pd.DataFrame({"c_mktsegment": sorted(ds.unique("c_mktsegment"))})




DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer"




def filter_project_lineitem(sf_dir: str):
    import pyarrow.dataset as pads

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def kernel(batch: pa.Table) -> pa.Table:
        from datetime import datetime

        m = pc.and_(
            pc.greater_equal(batch["l_discount"], pa.scalar(0.05)),
            pc.less(batch["l_shipdate"], pa.scalar(datetime(1996, 1, 1))),
        )
        t = batch.filter(m)
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "qty": pa.array(t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)),
                "revenue_cents": pa.array(_cents(ep * (1.0 - disc))),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")




FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS BIGINT) AS qty,
       CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_discount >= 0.05 AND l_shipdate < TIMESTAMP '1996-01-01'
"""




# --- version diff (DifferPipeline semantics,
#     pipeline/differ/.../DifferUtils.java:97-139) ----------------------------


def version_diff_orders(sf_dir: str):
    """Synthesize 'previous' vs 'current' versions of orders
    deterministically, diff them: ADDED / DELETED / MODIFIED.

    previous = orders except keys ≡ 0 (mod 97), with totalprice*1.10 for
    keys ≡ 0 (mod 13); current = orders as stored. Key = o_orderkey.
    """
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def diff(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        cur = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        in_prev = key % 97 != 0
        prev = np.where(key % 13 == 0, _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 1.10), cur)
        diff_type = np.where(~in_prev, "ADDED", np.where(prev != cur, "MODIFIED", "SAME"))
        keep = diff_type != "SAME"
        return pa.table(
            {
                "o_orderkey": pa.array(key[keep]),
                "value_current_cents": pa.array(cur[keep]),
                "value_previous_cents": pa.array(
                    np.where(in_prev, prev, np.int64(-1))[keep]
                ),
                "diff_type": pa.array(diff_type[keep].astype(object), pa.string()),
            }
        )

    return ds.map_batches(diff, batch_format="pyarrow")




VERSION_DIFF_SQL = """
WITH cur AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS v FROM orders
), prev AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0
              THEN CAST(ROUND(o_totalprice*1.10*100) AS BIGINT)
              ELSE CAST(ROUND(o_totalprice*100) AS BIGINT) END AS v
  FROM orders WHERE o_orderkey % 97 <> 0
)
SELECT cur.o_orderkey,
       cur.v AS value_current_cents,
       COALESCE(prev.v, -1) AS value_previous_cents,
       CASE WHEN prev.o_orderkey IS NULL THEN 'ADDED'
            WHEN prev.v <> cur.v THEN 'MODIFIED' END AS diff_type
FROM cur LEFT JOIN prev USING (o_orderkey)
WHERE prev.o_orderkey IS NULL OR prev.v <> cur.v
"""




# --- wide→long melt (observations_importer semantics,
#     simple/stats/observations_importer.py:130-146) --------------------------


def melt_part(sf_dir: str):
    """part(p_partkey, p_size, p_retailprice) → long rows
    (p_partkey, variable, value_cents)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def melt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        keys = batch["p_partkey"].to_numpy(zero_copy_only=False)
        size_cents = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64) * 100
        price_cents = _cents(batch["p_retailprice"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "p_partkey": pa.array(np.concatenate([keys, keys])),
                "variable": pa.array(
                    ["p_size"] * n + ["p_retailprice"] * n, pa.string()
                ),
                "value_cents": pa.array(np.concatenate([size_cents, price_cents])),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")




MELT_PART_SQL = """
SELECT p_partkey, 'p_size' AS variable, CAST(p_size AS BIGINT)*100 AS value_cents FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS variable,
       CAST(ROUND(p_retailprice*100) AS BIGINT) AS value_cents FROM part
"""




# --- anti join: customers with no orders (broadcast key-set filter,
#     SURVEY §2.6 "semi/anti join") ------------------------------------------


def customers_without_orders(sf_dir: str):
    """Customers with no orders after 2001-01-01: a distributed hash
    anti-join — orders (fact-scaled) never touches the driver, only its
    filtered 8-byte key column shuffles."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent_keys(batch: pa.Table) -> pa.Table:
        from datetime import datetime

        return batch.filter(
            pc.greater_equal(batch["o_orderdate"], pa.scalar(datetime(2001, 1, 1)))
        ).select(["o_custkey"])

    n_orders = _np_for(orders)
    orders = orders.map_batches(recent_keys, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return cust.join(
        orders,
        join_type="left_anti",
        num_partitions=n_orders,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )




ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
)
"""




# --- q6: filtered global aggregate (TPC-H Q6 shape; SURVEY §2.4+§2.7) --------


def q6_discount_revenue(sf_dir: str, ds=None):
    """Filter-heavy scan + single global sum: the filter and the partial
    sum both run inside map_batches (combiner pattern), so only one tiny
    partial row per batch reaches the final aggregate.

    ``ds`` overrides the parquet read with a caller-supplied lineitem
    Dataset (any source format — the ORC/JSONL readers reuse this same
    operator for their oracle checks)."""
    import pandas as pd

    if ds is None:
        ds = _read(
            sf_dir,
            "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        mask = (
            (ship >= lo)
            & (ship < hi)
            & (disc >= 0.05)
            & (disc <= 0.07)
            & (qty < 24)
        )
        cents = _cents(ep[mask] * disc[mask])
        return pa.table({"revenue_cents": pa.array([int(cents.sum())], pa.int64())})

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    total = partials.aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    return pd.DataFrame({"revenue_cents": [int(total["revenue_cents"])]})




Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""




# --- q4: EXISTS semi-join + grouped count (TPC-H Q4 shape; SURVEY §2.6) ------


def q4_order_priority(sf_dir: str):
    """orders ⋉ (lineitem with returned flag) on orderkey, then a count
    per priority. Only the 8-byte key column leaves the lineitem side."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def returned_keys(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch["l_returnflag"], pa.scalar("R"))
        ).select(["l_orderkey"])

    keys = li.map_batches(returned_keys, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    n = _np_for(orders)
    matched = orders.join(
        keys,
        join_type="left_semi",
        num_partitions=n,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    from ray.data.aggregate import Count

    return (
        matched.groupby("o_orderpriority", num_partitions=n)
        .aggregate(Count(alias_name="order_count"))
        .select_columns(["o_orderpriority", "order_count"])
    )




Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
)
GROUP BY o_orderpriority
"""




# --- q12: fact-fact join + conditional aggregation (TPC-H Q12 shape) ---------


def q12_priority_by_returnflag(sf_dir: str):
    """lineitem(1996 shipments) ⋈ orders, grouped by return flag with a
    CASE-style split of high- vs low-priority orders — the conditional
    is a vectorized numpy mask inside map_batches, pre-aggregated per
    batch before the (3-group) final groupby."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"])
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def in_window(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ship >= lo) & (ship < hi))).select(
            ["l_orderkey", "l_returnflag"]
        )

    li = li.map_batches(in_window, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    n = _np_for(li)
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=n,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def split_counts(batch: pa.Table) -> pa.Table:
        prio = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = np.isin(prio, ("1-URGENT", "2-HIGH")).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "high_count": pa.array(high),
                "low_count": pa.array(1 - high),
            }
        )

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(split_counts, batch_format="pyarrow")
        .groupby("l_returnflag", num_partitions=n)
        .aggregate(
            Sum("high_count", alias_name="high_count"),
            Sum("low_count", alias_name="low_count"),
        )
    )




Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""




# --- q13: LEFT OUTER join + double aggregate (TPC-H Q13 shape; SURVEY §2.6) --


def q13_customer_distribution(sf_dir: str):
    """Distribution of per-customer order counts, keeping customers with
    zero orders via a distributed LEFT OUTER hash join (the one join type
    the engine had not yet exercised). Order counts are pre-aggregated
    per block, combined with ONE keyed exchange, then the outer join
    attaches them to customers; the final distribution has ~#distinct
    counts rows so its partials merge driver-side."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def non_urgent_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.not_equal(batch["o_orderpriority"], pa.scalar("1-URGENT"))
        )
        df = pd.DataFrame(
            {"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("o_custkey", sort=False).size().reset_index(name="n")
        return from_pandas_clean(g, preserve_index=False)

    def block_sum(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", sort=False)["n"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(orders)
    n = _np_for(orders)
    counts = (
        orders.map_batches(non_urgent_partial, batch_format="pyarrow")
        .repartition(n, keys=["o_custkey"])
        .map_batches(block_sum, batch_format="pyarrow", batch_size=None)
    )

    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = cust.join(
        counts,
        join_type="left_outer",
        num_partitions=_np_for(cust),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def dist_partial(batch: pa.Table) -> pa.Table:
        c = batch["n"].to_pandas().fillna(0).astype("int64")
        vc = c.value_counts()
        return pa.table(
            {
                "c_count": pa.array(vc.index.to_numpy(), pa.int64()),
                "custdist": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    partials = joined.map_batches(dist_partial, batch_format="pyarrow").to_pandas()
    out = (
        partials.groupby("c_count", sort=False)["custdist"]
        .sum()
        .reset_index()
        .sort_values(["custdist", "c_count"], ascending=[False, False], kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype({"c_count": "int64", "custdist": "int64"})




Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""




# --- q18: group-HAVING + join back (TPC-H Q18 shape) -------------------------


def q18_large_orders(sf_dir: str, threshold: int = 200):
    """Orders whose total lineitem quantity exceeds `threshold`: partial
    per-block quantity sums, one keyed exchange to finalize + HAVING
    filter (the surviving key set is small), then inner joins back to
    orders and customer, top-100 by total price via block-local partial
    top-k (only 100 × #blocks rows reach the driver merge)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "qty": batch["l_quantity"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("l_orderkey", sort=False)["qty"].sum().reset_index()
        return from_pandas_clean(g, preserve_index=False)

    def block_sum_filter(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_orderkey", sort=False)["qty"].sum().reset_index()
        g = g[g["qty"] > threshold]
        # l_quantity is integral-valued; the sum is exact in fp
        g["sum_qty"] = g["qty"].astype("int64")
        return from_pandas_clean(g[["l_orderkey", "sum_qty"]], preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(li)
    n = _np_for(li)
    big = (
        li.map_batches(qty_partial, batch_format="pyarrow")
        .repartition(n, keys=["l_orderkey"])
        .map_batches(block_sum_filter, batch_format="pyarrow", batch_size=None)
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    j = orders.join(
        big,
        join_type="inner",
        num_partitions=_np_for(orders),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j2 = j.join(
        cust,
        join_type="inner",
        num_partitions=_np_for(orders),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["totalprice_cents"] = _cents(df["o_totalprice"].to_numpy())
        df = df.sort_values(
            ["totalprice_cents", "o_orderkey"],
            ascending=[False, True],
            kind="mergesort",
        ).head(100)
        return from_pandas_clean(
            df[
                [
                    "c_name",
                    "o_custkey",
                    "o_orderkey",
                    "o_orderdate",
                    "totalprice_cents",
                    "sum_qty",
                ]
            ],
            preserve_index=False,
        )

    partials = j2.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    return (
        partials.sort_values(
            ["totalprice_cents", "o_orderkey"], ascending=[False, True], kind="mergesort"
        )
        .head(100)
        .reset_index(drop=True)
    )




Q18_SQL = """
SELECT c_name, o_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_cents,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > 200
ORDER BY totalprice_cents DESC, o_orderkey
LIMIT 100
"""




# --- q17: aggregate-join-back (TPC-H Q17 shape) ------------------------------


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#23"):
    """Revenue from lineitems whose quantity is below 20% of the average
    quantity for their (brand-filtered) part. The per-part average is
    computed distributed (partial sums + one keyed exchange), restricted
    to the brand via a semi-join, then joined BACK onto lineitem — the
    correlated-subquery shape — and reduced to a single scalar."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False),
                "qty": batch["l_quantity"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("l_partkey", sort=False)["qty"].agg(["sum", "count"]).reset_index()
        g.columns = ["l_partkey", "qty_sum", "qty_cnt"]
        return from_pandas_clean(g, preserve_index=False)

    def block_avg(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_partkey", sort=False)[["qty_sum", "qty_cnt"]].sum().reset_index()
        # l_quantity is integral-valued → partial sums are exact, so this
        # division is bit-identical to DuckDB's AVG over the same rows
        g["avg_qty"] = g["qty_sum"] / g["qty_cnt"]
        return from_pandas_clean(g[["l_partkey", "avg_qty"]], preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(li)
    n = _np_for(li)
    avgs = (
        li.map_batches(qty_partials, batch_format="pyarrow")
        .repartition(n, keys=["l_partkey"])
        .map_batches(block_avg, batch_format="pyarrow", batch_size=None)
    )

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def brand_keys(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["p_brand"], pa.scalar(brand))).select(
            ["p_partkey"]
        )

    brand_parts = part.map_batches(brand_keys, batch_format="pyarrow")
    avgs = avgs.join(
        brand_parts,
        join_type="left_semi",
        num_partitions=n,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    j = li.join(
        avgs,
        join_type="inner",
        num_partitions=n,
        on=("l_partkey",),
        right_on=("l_partkey",),
        left_suffix="",
        right_suffix="_avg",
    )

    def final_partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        avg = batch["avg_qty"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        mask = qty < 0.2 * avg
        cents = _cents(ep[mask])
        return pa.table({"cents": pa.array([int(cents.sum())], pa.int64())})

    from ray.data.aggregate import Sum

    total = j.map_batches(final_partial, batch_format="pyarrow").aggregate(
        Sum("cents", alias_name="cents")
    )
    return pd.DataFrame({"avg_yearly_cents": [int(total["cents"]) // 7]})




Q17_SQL = """
SELECT CAST(SUM(CAST(ROUND(l1.l_extendedprice*100) AS BIGINT)) // 7 AS BIGINT)
         AS avg_yearly_cents
FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
  AND l1.l_quantity < 0.2 * (
    SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
  )
"""




# --- q2 shape: argmax-per-group + dimension join -----------------------------


def top_supplier_per_nation(sf_dir: str):
    """The highest-acctbal supplier in each nation (argmax per group,
    min-suppkey tie-break): block-local argmax partials (≤ #nations rows
    per block — the combiner), a driver-side final reduce over
    #nations × #blocks rows, and a broadcast nation-name lookup."""
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])

    def block_argmax(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["s_nationkey", "s_acctbal", "s_suppkey"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("s_nationkey", keep="first")
        return from_pandas_clean(df, preserve_index=False)

    partials = sup.map_batches(block_argmax, batch_format="pyarrow").to_pandas()
    best = (
        partials.sort_values(
            ["s_nationkey", "s_acctbal", "s_suppkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        .drop_duplicates("s_nationkey", keep="first")
        .reset_index(drop=True)
    )
    nation = _read_pandas(sf_dir, "nation", ["n_nationkey", "n_name"])
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    best["n_name"] = best["s_nationkey"].map(names)
    best["acctbal_cents"] = _cents(best["s_acctbal"].to_numpy())
    return (
        best[["n_name", "s_suppkey", "s_name", "acctbal_cents"]]
        .sort_values("n_name", kind="mergesort")
        .reset_index(drop=True)
    )




TOP_SUPPLIER_SQL = """
SELECT n_name, s_suppkey, s_name,
       CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_cents
FROM (
  SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM supplier
) s JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
ORDER BY n_name
"""
