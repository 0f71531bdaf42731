"""Relational operator pipelines over the testdata tables.

Each query demonstrates one operator family from SURVEY.md §2 as an
idiomatic Ray Data pipeline, and has a DuckDB oracle in
``__ray_entry__.oracle_sql`` computing the same result.

Float determinism convention: monetary aggregates are computed as
**integer cents** — ``sum(cast(round(x*100) as bigint))`` — identically
in Ray (numpy) and DuckDB, so cross-engine value hashes match exactly
(double summation order is engine-dependent; integer sums are not).

Join strategy (SURVEY.md §2.6):
- dimension tables (region/nation/customer/supplier/part) are
  **broadcast**: read once, shipped to tasks as a pandas map inside the
  kernel closure — no shuffle;
- fact-fact joins (lineitem ⋈ orders) use ``Dataset.join`` (hash
  shuffle join) with an explicit partition count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.arrowutil import from_pandas_clean


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    # strip the files' embedded pandas metadata (dicts in it defeat Ray's
    # schema-dedup hash on every shuffle bundle); metadata-only, zero-copy
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def _read_pandas(sf_dir: str, table: str, columns=None) -> pd.DataFrame:
    """Driver-side read of a SMALL dimension table (broadcast side)."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns).to_pandas()


def _np() -> int:
    from import_ray.core.context import npartitions

    return npartitions()


def _np_for(ds) -> int:
    """Partitions sized to the (read-stage) dataset's metadata size —
    keeps shuffle aggregator pools proportional to data, capped at
    2×CPUs (core.context.data_nparts)."""
    from import_ray.core.context import data_nparts

    return data_nparts(ds)


def _cents(x: np.ndarray) -> np.ndarray:
    # round-half-away-from-zero, matching DuckDB's ROUND() (numpy's
    # np.round is banker's rounding and diverges on exact .5)
    y = x * 100.0
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(np.int64)


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


# --- events: date truncation + grouped counts (events_importer,
#     simple/stats/events_importer.py:152-196,336-343) ------------------------


def events_daily_counts(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch["ts"], format="%Y-%m-%d")
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "day": day,
                "value_cents": pa.array(_cents(v)),
                "one": pa.array(np.ones(len(batch), np.int64)),
            }
        ).group_by(["event_type", "day"]).aggregate(
            [("value_cents", "sum"), ("one", "sum")]
        ).rename_columns(["event_type", "day", "sum_value_cents", "n_events"])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"], num_partitions=_np_for(ds))
        .aggregate(
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("n_events", alias_name="n_events"),
        )
    )


EVENTS_DAILY_SQL = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type, day
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


# --- windowed aggregate: running total per customer (custom operator —
#     Ray Data has no window functions; hash-partition by key + per-block
#     sorted cumsum, SURVEY "Custom operators" note) --------------------------


def orders_running_total(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["price_cents"] = _cents(df["o_totalprice"].to_numpy())
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        df["running_cents"] = df.groupby("o_custkey", sort=False)["price_cents"].cumsum()
        return from_pandas_clean(
            df[["o_orderkey", "o_custkey", "running_cents"]], preserve_index=False
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["o_custkey"]).map_batches(
        per_block, batch_format="pyarrow"
    )


RUNNING_TOTAL_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS running_cents
FROM orders
"""


# --- as-of join: for each purchase event, the most recent signup by the
#     same user at-or-before it (merge_asof per user-hash bucket) -------------


def purchase_last_signup(sf_dir: str):
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        purchases = df[df["event_type"] == "purchase"].sort_values("ts", kind="mergesort")
        signups = df[df["event_type"] == "signup"].sort_values("ts", kind="mergesort")
        if purchases.empty:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "signup_event_id": pa.array([], pa.int64()),
                }
            )
        joined = pd.merge_asof(
            purchases,
            signups[["user_id", "ts", "event_id"]].rename(
                columns={"event_id": "signup_event_id"}
            ),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        out = joined[["event_id", "user_id", "signup_event_id"]].copy()
        out["signup_event_id"] = out["signup_event_id"].astype("Int64").fillna(-1).astype("int64")
        return from_pandas_clean(out, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow"
    )


ASOF_JOIN_SQL = """
SELECT p.event_id, p.user_id,
       COALESCE(s.event_id, -1) AS signup_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND s.ts <= p.ts
"""


# --- q6: filtered global aggregate (TPC-H Q6 shape; SURVEY §2.4+§2.7) --------


def q6_discount_revenue(sf_dir: str):
    """Filter-heavy scan + single global sum: the filter and the partial
    sum both run inside map_batches (combiner pattern), so only one tiny
    partial row per batch reaches the final aggregate."""
    import pandas as pd

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


# --- per-group top-k (window-rank shape; SURVEY §2.8) ------------------------


def top_orders_per_priority(sf_dir: str, k: int = 3):
    """Top-k orders by price within each priority class, combiner-style:
    each batch emits its LOCAL top-k per group (vectorized pandas
    sort + head), so the final per-group merge sees ≤ k × #batches
    tiny rows — no global sort, no full-table shuffle."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["price_cents"] = _cents(df["o_totalprice"].to_numpy())
        df = df.sort_values(
            ["o_orderpriority", "price_cents", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = df.groupby("o_orderpriority", sort=False).head(k)
        return from_pandas_clean(
            out[["o_orderpriority", "o_orderkey", "price_cents"]],
            preserve_index=False,
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["price_cents", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return df[["o_orderpriority", "o_orderkey", "price_cents"]]

    from import_ray.core.context import join_safe

    return join_safe(
        partials.groupby("o_orderpriority", num_partitions=_np())
    .map_groups(final_topk, batch_format="pandas")
    )


TOPK_PER_GROUP_SQL = """
SELECT o_orderpriority, o_orderkey, price_cents FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 3
"""


# --- range join: clicks within a 1-day window before each purchase -----------


def purchase_click_window(sf_dir: str):
    """Interval join: for each purchase event, the number of click
    events by the same user in [ts - 1 day, ts]. Keyed repartition on
    user_id co-locates each user's events; within a block the window
    match is a vectorized pandas merge on user_id + mask (per-user
    event counts are bounded — for hot keys, salt by time bucket and
    merge the two boundary buckets)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        p = df[df["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        c = df[df["event_type"] == "click"][["user_id", "ts"]].rename(
            columns={"ts": "click_ts"}
        )
        if p.empty:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "n_clicks": pa.array([], pa.int64()),
                }
            )
        pairs = p.merge(c, on="user_id", how="left")
        delta = pairs["ts"] - pairs["click_ts"]
        in_win = (delta >= pd.Timedelta(0)) & (delta <= pd.Timedelta(days=1))
        counts = (
            in_win.groupby(pairs["event_id"]).sum().astype(np.int64)
        )
        out = p[["event_id", "user_id"]].copy()
        out["n_clicks"] = out["event_id"].map(counts).fillna(0).astype(np.int64)
        return from_pandas_clean(out, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow"
    )


RANGE_JOIN_SQL = """
SELECT p.event_id, p.user_id,
       CAST(COUNT(c.user_id) AS BIGINT) AS n_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 DAY AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id
"""


# --- sliding-window aggregate: trailing 7-day event counts -------------------


def events_sliding_counts(sf_dir: str):
    """Tumbling-daily partial counts (combiner inside map_batches) →
    tiny (type, day) groupby → per-type trailing 7-ROW window sum.
    The window stage runs on the AGGREGATED series (schema-scale:
    #types × #days rows), never on raw events; integer window sums
    keep the cross-engine hash exact (no float accumulation)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def daily_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "day": batch["ts"].to_pandas().dt.strftime("%Y-%m-%d"),
            }
        )
        g = df.groupby(["event_type", "day"], sort=False).size().reset_index(name="cnt")
        return from_pandas_clean(g, preserve_index=False)

    from ray.data.aggregate import Sum

    n = _np_for(ds)
    daily = (
        ds.map_batches(daily_partials, batch_format="pyarrow")
        .groupby(["event_type", "day"], num_partitions=n)
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", kind="mergesort").reset_index(drop=True)
        df["cnt7"] = (
            df["cnt"].rolling(7, min_periods=1).sum().astype(np.int64)
        )
        return df[["event_type", "day", "cnt", "cnt7"]]

    from import_ray.core.context import join_safe

    return join_safe(
        daily.groupby("event_type", num_partitions=n).map_groups(
            window, batch_format="pandas"
        )
    )


SLIDING_SQL = """
SELECT event_type, day, cnt,
       CAST(SUM(cnt) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cnt7
FROM (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
)
"""


# --- exact grouped percentiles via integer-domain histogram ------------------


_PCTL_BUCKET_BITS = 12  # 4096-cent coarse buckets


def price_percentiles_by_flag(sf_dir: str, quantiles=(0.5, 0.9)):
    """Exact grouped percentiles WITHOUT a global sort, in two streaming
    passes (the classic distributed exact-quantile shape):

    1. coarse pass — per-batch counts per (flag, cents >> 12) bucket;
       the merged coarse histogram is DOMAIN-bounded (≤ domain/4096
       rows, ~2.7k for 7-digit cent prices), so it collects driver-side
       at schema scale regardless of row count;
    2. locate each quantile's target bucket + within-bucket rank from
       the coarse cumsums, then a fine pass that keeps ONLY rows in the
       ≤ #flags × #quantiles target buckets (broadcast set) and counts
       exact cents there — ~n/4096 rows per target ever leave the scan.

    PERCENTILE_DISC semantics: the value at 0-based ordinal ceil(q·n)−1
    (matches DuckDB quantile_disc). An earlier one-pass
    (flag, cents)-groupby version degenerated when cents were
    near-unique (600k groups at sf0.1 → 21 s); this shape is exact and
    independent of value cardinality. For wider domains, widen the
    bucket bits or recurse the locate step."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def coarse_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "bucket": _cents(
                    batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                )
                >> _PCTL_BUCKET_BITS,
            }
        )
        g = df.groupby(["l_returnflag", "bucket"], sort=False).size().reset_index(
            name="cnt"
        )
        return from_pandas_clean(g, preserve_index=False)

    # partials are #blocks × (#flags × domain/4096) rows — schema-scale,
    # so merge driver-side (a shuffle groupby here measured 10× the cost
    # of the whole scan: Ray HashAggregate finalization is per-group)
    coarse = (
        ds.map_batches(coarse_partials, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby(["l_returnflag", "bucket"], sort=True)["cnt"]
        .sum()
        .reset_index()
    )

    # locate, per (flag, q): the bucket holding ordinal ceil(q·n) and
    # the residual rank within that bucket
    targets: dict[tuple[str, int], list[tuple[float, int]]] = {}
    for flag, grp in coarse.groupby("l_returnflag"):
        grp = grp.sort_values("bucket")
        cum = grp["cnt"].to_numpy().cumsum()
        total = int(cum[-1])
        for q in quantiles:
            t = int(np.ceil(q * total))
            j = int(np.searchsorted(cum, t, side="left"))
            below = int(cum[j - 1]) if j > 0 else 0
            bucket = int(grp["bucket"].iloc[j])
            targets.setdefault((flag, bucket), []).append((q, t - below))

    target_set = set(targets)

    def fine_partials(batch: pa.Table) -> pa.Table:
        flags = batch["l_returnflag"].to_pandas().to_numpy(dtype=object)
        cents = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        buckets = cents >> _PCTL_BUCKET_BITS
        # ≤ #flags × #quantiles target buckets → a few vectorized masks
        keep = np.zeros(len(flags), dtype=bool)
        for f, b in target_set:
            keep |= (flags == f) & (buckets == b)
        df = pd.DataFrame(
            {"l_returnflag": flags[keep], "price_cents": cents[keep]}
        )
        g = (
            df.groupby(["l_returnflag", "price_cents"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return from_pandas_clean(g, preserve_index=False)

    fine = (
        ds.map_batches(fine_partials, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # bucket-bounded: ~n/4096 rows per target bucket
        .groupby(["l_returnflag", "price_cents"], sort=True)["cnt"]
        .sum()
        .reset_index()
    )

    rows = {}
    for (flag, bucket), wants in targets.items():
        sub = fine[
            (fine["l_returnflag"] == flag)
            & ((fine["price_cents"].to_numpy() >> _PCTL_BUCKET_BITS) == bucket)
        ].sort_values("price_cents")
        v = sub["price_cents"].to_numpy()
        cum = sub["cnt"].to_numpy().cumsum()
        for q, rank in wants:
            val = int(v[np.searchsorted(cum, rank, side="left")])
            rows.setdefault(flag, {})[q] = val

    out = pd.DataFrame(
        {
            "l_returnflag": sorted(rows),
            **{
                f"p{int(q*100)}_cents": [rows[f][q] for f in sorted(rows)]
                for q in quantiles
            },
        }
    )
    return out


PERCENTILE_SQL = """
SELECT l_returnflag,
       CAST(quantile_disc(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.5) AS BIGINT)
         AS p50_cents,
       CAST(quantile_disc(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.9) AS BIGINT)
         AS p90_cents
FROM lineitem
GROUP BY l_returnflag
"""


# --- grouped distinct count (two-level dedup-then-count) ---------------------


def distinct_users_by_type(sf_dir: str):
    """COUNT(DISTINCT user_id) per event_type: per-batch local distinct
    (the combiner — repeated pairs never leave the map stage), ONE keyed
    shuffle on the (type, user) pair, then a block-local distinct+count
    whose per-type partials (#types × #blocks rows) merge driver-side.
    The single exchange moves only key columns. The HLL sketch variant
    (stages/sketch.py) replaces the pair shuffle with fixed 4 KB
    register partials when approximate counts suffice."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def local_distinct(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        )
        return from_pandas_clean(
            df.drop_duplicates(), preserve_index=False
        )

    def block_count(batch: pa.Table) -> pa.Table:
        # keyed repartition co-located every (type, user) pair in one
        # block, so a block-local distinct-then-count is globally exact;
        # one tiny row per type per block reaches the driver merge
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        g = df.groupby("event_type", sort=False).size().reset_index(name="n_users")
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    n = _np_for(ds)
    partials = (
        ds.map_batches(local_distinct, batch_format="pyarrow", batch_size=None)
        .repartition(n, keys=["event_type", "user_id"])
        .map_batches(block_count, batch_format="pyarrow")
        .to_pandas()  # #types × #blocks rows
    )
    return (
        partials.groupby("event_type", sort=True)["n_users"]
        .sum()
        .reset_index()
        .astype({"n_users": "int64"})
    )


DISTINCT_USERS_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# --- rollup aggregate (GROUP BY ROLLUP shape; SURVEY §2.7) -------------------


def lineitem_rollup(sf_dir: str):
    """Hierarchical totals in ONE scan: per-batch partials at the finest
    (returnflag, linestatus) grain — 6 groups, schema-scale — then the
    coarser levels (per-flag subtotal, grand total) derive from the
    merged finest level without touching the data again. 'ALL' marks
    the rolled-up dimensions (COALESCE'd identically in the oracle)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "l_quantity": batch["l_quantity"].to_numpy(zero_copy_only=False),
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(n_items=("l_quantity", "size"), sum_qty=("l_quantity", "sum"))
            .reset_index()
        )
        g["sum_qty"] = g["sum_qty"].astype(np.int64)
        return from_pandas_clean(g, preserve_index=False)

    fine = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # ≤ 6 × #blocks rows
        .groupby(["l_returnflag", "l_linestatus"], sort=True)
        .agg(n_items=("n_items", "sum"), sum_qty=("sum_qty", "sum"))
        .reset_index()
    )

    by_flag = (
        fine.groupby("l_returnflag", sort=True)
        .agg(n_items=("n_items", "sum"), sum_qty=("sum_qty", "sum"))
        .reset_index()
        .assign(l_linestatus="ALL")
    )
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "n_items": [fine["n_items"].sum()],
            "sum_qty": [fine["sum_qty"].sum()],
        }
    )
    out = pd.concat([fine, by_flag, total], ignore_index=True)
    return out[["l_returnflag", "l_linestatus", "n_items", "sum_qty"]].astype(
        {"n_items": "int64", "sum_qty": "int64"}
    )


ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# --- intersect set-op: customers ordering in BOTH years ----------------------


def repeat_customers_1995_1996(sf_dir: str):
    """INTERSECT via two filtered key projections + a distinct semi-join:
    each side sheds everything but the 8-byte key inside map_batches,
    the semi-join co-locates by key hash, and a keyed block distinct
    dedups — no full-width row ever shuffles."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def keys_in_year(year: int):
        lo = np.datetime64(f"{year}-01-01")
        hi = np.datetime64(f"{year + 1}-01-01")

        def kernel(batch: pa.Table) -> pa.Table:
            d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
            t = batch.filter(pa.array((d >= lo) & (d < hi))).select(["o_custkey"])
            # local distinct — the combiner
            return pa.table(
                {"o_custkey": pa.array(np.unique(t["o_custkey"].to_numpy(zero_copy_only=False)))}
            )

        return kernel

    k95 = orders.map_batches(keys_in_year(1995), batch_format="pyarrow")
    k96 = orders.map_batches(keys_in_year(1996), batch_format="pyarrow")

    # no distinct needed on the probe side: a semi-join never multiplies
    # left rows, and the left side gets its distinct after the join
    n = _np_for(orders)
    both = k95.join(
        k96,
        join_type="left_semi",
        num_partitions=n,
        on=("o_custkey",),
    )

    def block_distinct(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": pa.array(np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False)))}
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(both)
    return both.repartition(n, keys=["o_custkey"]).map_batches(
        block_distinct, batch_format="pyarrow", batch_size=None
    )


INTERSECT_SQL = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


# --- sessionization: 30-min inactivity-gap session ids per user --------------


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """Streaming-window sessionization: a keyed repartition co-locates
    each user's events, then one vectorized pandas pass per block sorts
    by (user, ts, event_id), flags gaps > ``gap_minutes``, and cumsums
    the flags into per-user 1-based session ordinals. The shuffle moves
    4 narrow columns; no global sort (order only matters within a
    user's partition)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    gap = pd.Timedelta(minutes=gap_minutes)

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        prev_ts = df.groupby("user_id", sort=False)["ts"].shift()
        new_session = prev_ts.isna() | ((df["ts"] - prev_ts) > gap)
        df["session_idx"] = (
            new_session.astype(np.int64).groupby(df["user_id"], sort=False).cumsum()
        )
        return from_pandas_clean(
            df[["event_id", "user_id", "session_idx"]], preserve_index=False
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow"
    )


SESSIONIZE_SQL = """
SELECT event_id, user_id,
       CAST(SUM(new_session) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS session_idx
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
"""


# --- pivot (long→wide): per-user event-type counts ---------------------------

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_user_event_counts(sf_dir: str):
    """Long→wide pivot (the inverse of the melt operator): per-batch
    (user, type) count partials — the combiner — then a keyed
    repartition on user and a block-local pivot_table over the FIXED
    type vocabulary (wide schemas need a known column set; discover it
    with a distinct pass first when it isn't fixed)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_type": batch["event_type"].to_pandas(),
            }
        )
        g = df.groupby(["user_id", "event_type"], sort=False).size().reset_index(
            name="cnt"
        )
        return from_pandas_clean(g, preserve_index=False)

    def block_pivot(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        wide = df.pivot_table(
            index="user_id",
            columns="event_type",
            values="cnt",
            aggfunc="sum",
            fill_value=0,
        ).reindex(columns=_PIVOT_TYPES, fill_value=0)
        wide = wide.reset_index()
        wide.columns = ["user_id"] + [f"n_{t}" for t in _PIVOT_TYPES]
        for c in wide.columns[1:]:
            wide[c] = wide[c].astype(np.int64)
        return from_pandas_clean(wide, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    n = _np_for(ds)
    return (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
        .repartition(n, keys=["user_id"])
        .map_batches(block_pivot, batch_format="pyarrow", batch_size=None)
    )


PIVOT_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
"""


# --- lead/lag window: per-customer order gaps --------------------------------
#     LAG() OVER (PARTITION BY ... ORDER BY ...) re-expressed Ray-native:
#     hash-repartition on the partition key co-locates each customer's
#     orders in one block, then a vectorized pandas sort + groupby-diff
#     computes consecutive-order day gaps with no per-row Python.


def customer_order_gaps(sf_dir: str):
    """(o_custkey, n_orders, min_gap_days, max_gap_days) for customers
    with ≥2 orders; gap = days between consecutive orders (ties broken
    by o_orderkey, matching the oracle's window ORDER BY)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = (
            pd.to_datetime(df["o_orderdate"]).values.astype("datetime64[D]").astype(np.int64)
        )
        df = df.sort_values(["o_custkey", "day", "o_orderkey"], kind="mergesort")
        g = df.groupby("o_custkey", sort=False)
        gaps = g["day"].diff()  # NaN on each customer's first order
        out = pd.DataFrame(
            {
                "o_custkey": df["o_custkey"],
                "gap": gaps,
            }
        )
        agg = out.groupby("o_custkey", sort=False).agg(
            n_orders=("gap", "size"),
            min_gap_days=("gap", "min"),
            max_gap_days=("gap", "max"),
            n_gaps=("gap", "count"),
        )
        agg = agg[agg["n_gaps"] >= 1].reset_index()
        for c in ("n_orders", "min_gap_days", "max_gap_days"):
            agg[c] = agg[c].astype(np.int64)
        return from_pandas_clean(
            agg[["o_custkey", "n_orders", "min_gap_days", "max_gap_days"]],
            preserve_index=False,
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["o_custkey"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


ORDER_GAPS_SQL = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
  FROM orders
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(gap) AS BIGINT) AS min_gap_days,
       CAST(MAX(gap) AS BIGINT) AS max_gap_days
FROM g
GROUP BY o_custkey
HAVING COUNT(gap) >= 1
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


# --- semi-structured extraction: JSON props → typed column -------------------


def events_props_stats(sf_dir: str):
    """Per-event-type stats over a field EXTRACTED from the JSON
    ``props`` column (semi-structured payload parsing — the pattern for
    tool-call/metadata blobs in transcript pipelines). Extraction is a
    vectorized RE2 kernel (``pc.extract_regex``) over the whole Arrow
    batch — no per-row json.loads; DuckDB's ``json_extract_string`` is
    the oracle. One small keyed aggregate (#event_types groups)."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        props = batch["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "k": k.to_pandas(),
            }
        )
        g = (
            df.groupby("event_type", sort=False)["k"]
            .agg(sum_k="sum", n="size")
            .reset_index()
        )
        g["sum_k"] = g["sum_k"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return from_pandas_clean(g, preserve_index=False)

    partials = ds.map_batches(extract, batch_format="pyarrow").to_pandas()
    out = (
        partials.groupby("event_type", sort=True)[["sum_k", "n"]]
        .sum()
        .reset_index()
    )
    return out[["event_type", "sum_k", "n"]]


EVENTS_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- exact distributed NTILE (global-rank bucketing, no global sort) ---------


_NTILE_BUCKET_BITS = 8


def ntile_customers_by_balance(sf_dir: str, tiles: int = 4):
    """Exact NTILE(tiles) OVER (ORDER BY c_acctbal, c_custkey),
    aggregated per tile — WITHOUT a global sort.

    The distributed exact-ranking shape (same family as
    ``price_percentiles_by_flag``):

    1. coarse pass — per-block histogram over balance-cent buckets
       (domain-bounded: ≤ cent-domain/256 rows reach the driver);
       prefix sums give every bucket's global rank offset and locate
       the ≤ tiles−1 "boundary buckets" a tile boundary splits;
    2. clean rows (bucket wholly inside one tile — the overwhelming
       majority) are aggregated per block with the tile known from the
       bucket alone: per-block (tile, n, sum) partials, driver merge of
       tiles × blocks tiny rows — NO data shuffle at all;
    3. boundary rows (≤ (tiles−1) × bucket-width ≈ n/4096 of the data)
       are the only rows ever collected: exact-sorted by
       (cents, custkey) with their global rank = bucket offset + local
       position, then tiled by searchsorted into the cumulative tile
       sizes.

    Ties: cents is a bijection of the 2-decimal balance, so all equal
    balances land in one bucket and the within-bucket custkey sort
    reproduces SQL's deterministic ORDER BY tie-break exactly.
    """
    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def coarse(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        ub, cnt = np.unique(cents >> _NTILE_BUCKET_BITS, return_counts=True)
        return pa.table(
            {"bucket": pa.array(ub, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    hist = (
        ds.map_batches(coarse, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby("bucket", sort=True)["cnt"]
        .sum()
    )
    buckets = hist.index.to_numpy()
    counts = hist.to_numpy()
    offsets = np.concatenate([[0], counts.cumsum()])
    total = int(offsets[-1])

    base, extra = divmod(total, tiles)
    sizes = np.full(tiles, base, dtype=np.int64)
    sizes[:extra] += 1
    cum_sizes = sizes.cumsum()  # global rank r (0-based) → tile = searchsorted(cum, r, 'right')+1

    start_tile = np.searchsorted(cum_sizes, offsets[:-1], side="right")
    end_tile = np.searchsorted(cum_sizes, offsets[1:] - 1, side="right")
    clean = start_tile == end_tile
    clean_tile = (start_tile + 1).astype(np.int64)  # valid where clean
    boundary_buckets = buckets[~clean]
    bucket_offset = {int(b): int(o) for b, o in zip(buckets[~clean], offsets[:-1][~clean])}

    def clean_partials(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        b = cents >> _NTILE_BUCKET_BITS
        pos = np.searchsorted(buckets, b)
        is_clean = clean[pos]
        t = clean_tile[pos[is_clean]]
        df = pd.DataFrame({"tile": t, "bal": cents[is_clean]})
        g = df.groupby("tile", sort=False)["bal"].agg(
            sum_cents="sum", n_customers="size"
        ).reset_index()
        return from_pandas_clean(g, preserve_index=False)

    def boundary_rows(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        b = cents >> _NTILE_BUCKET_BITS
        keep = np.isin(b, boundary_buckets)
        return pa.table(
            {
                "bucket": pa.array(b[keep], pa.int64()),
                "cents": pa.array(cents[keep], pa.int64()),
                "c_custkey": pa.array(
                    batch["c_custkey"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
            }
        )

    agg = np.zeros((tiles, 2), dtype=np.int64)  # [n, sum_cents]
    partials = ds.map_batches(
        clean_partials, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    for t, grp in partials.groupby("tile"):
        agg[int(t) - 1, 0] += int(grp["n_customers"].sum())
        agg[int(t) - 1, 1] += int(grp["sum_cents"].sum())

    bd = ds.map_batches(boundary_rows, batch_format="pyarrow").to_pandas()
    if len(bd):
        bd = bd.sort_values(["bucket", "cents", "c_custkey"], kind="mergesort")
        for b, grp in bd.groupby("bucket", sort=True):
            ranks = bucket_offset[int(b)] + np.arange(len(grp))
            t = np.searchsorted(cum_sizes, ranks, side="right")
            cents = grp["cents"].to_numpy()
            for ti in np.unique(t):
                m = t == ti
                agg[ti, 0] += int(m.sum())
                agg[ti, 1] += int(cents[m].sum())

    return pd.DataFrame(
        {
            "tile": np.arange(1, tiles + 1, dtype=np.int64),
            "n_customers": agg[:, 0],
            "sum_cents": agg[:, 1],
        }
    )


NTILE_SQL = """
SELECT tile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(bal_cents) AS BIGINT) AS sum_cents
FROM (
  SELECT NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS tile,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
)
GROUP BY tile
ORDER BY tile
"""


# --- first/last-touch attribution (grouped argmin/argmax) ---------------------


def first_last_touch(sf_dir: str):
    """Per-user first- and last-touch event types (marketing-attribution
    shape): argmin/argmax over (ts, event_id) per user with the SQL
    ROW_NUMBER tie-break reproduced exactly.

    Per-block partial: one sort + drop_duplicates keeps only each
    user's block-local extremes (2 rows/user/block max), so the keyed
    exchange moves bounded partials, not events; the finalize pass after
    the user_id repartition re-runs the same pick per group."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    ensure_hash_shuffle(ds)
    n = npartitions()

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        f = df.drop_duplicates("user_id", keep="first")
        last = df.drop_duplicates("user_id", keep="last")
        m = f.merge(last, on="user_id", suffixes=("_f", "_l"))
        return from_pandas_clean(m, preserve_index=False)

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        fa = df.sort_values(["user_id", "ts_f", "event_id_f"], kind="mergesort")
        f = fa.drop_duplicates("user_id", keep="first")[["user_id", "event_type_f"]]
        la = df.sort_values(["user_id", "ts_l", "event_id_l"], kind="mergesort")
        last = la.drop_duplicates("user_id", keep="last")[["user_id", "event_type_l"]]
        out = f.merge(last, on="user_id").rename(
            columns={"event_type_f": "first_event", "event_type_l": "last_event"}
        )
        return from_pandas_clean(out, preserve_index=False)

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .repartition(n, keys=["user_id"])
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )
    return out


FIRST_LAST_TOUCH_SQL = """
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl
  FROM events)
SELECT user_id,
       MAX(CASE WHEN rf = 1 THEN event_type END) AS first_event,
       MAX(CASE WHEN rl = 1 THEN event_type END) AS last_event
FROM ranked
GROUP BY user_id
"""


# --- per-group mode (argmax over counted frequencies) -------------------------


def top_event_per_user(sf_dir: str):
    """Each user's most frequent event type (per-group MODE with the
    deterministic (count DESC, value ASC) tie-break). Block-local
    (user, type) count partials → one keyed exchange on user_id →
    in-block merge + argmax; partial rows are bounded by
    #users × #event-types per block, never raw events."""
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    ensure_hash_shuffle(ds)
    n = npartitions()

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_pandas(),
                "event_type": batch["event_type"].to_pandas(),
            }
        )
        g = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return from_pandas_clean(g, preserve_index=False)

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["user_id", "event_type"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            ["user_id", "cnt", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id", keep="first")
        g = g.rename(columns={"event_type": "top_event"})
        g["cnt"] = g["cnt"].astype("int64")
        return from_pandas_clean(
            g[["user_id", "top_event", "cnt"]], preserve_index=False
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .repartition(n, keys=["user_id"])
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


TOP_EVENT_PER_USER_SQL = """
SELECT user_id, event_type AS top_event, CAST(cnt AS BIGINT) AS cnt
FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type
         ) AS rn
  FROM events
  GROUP BY user_id, event_type
) t
WHERE rn = 1
"""


def topn_orders_per_customer(sf_dir: str, topn: int = 3):
    """Top-N rows per group (each customer's N most expensive orders,
    ranked). The generalized grouped top-N: block-local per-group
    top-N PARTIALS (a valid partial — the global per-group top-N is
    contained in the union of block top-Ns) → one keyed exchange on
    o_custkey → per-group merge + rank. Shuffled rows are bounded by
    N × groups-per-block, never the raw fact table.

    Ties broken (price_cents DESC, o_orderkey ASC) = ROW_NUMBER parity.
    """
    from import_ray.core.context import ensure_hash_shuffle, npartitions

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    ensure_hash_shuffle(ds)
    n = npartitions()

    def block_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "price_cents": _cents(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False)
                ),
            }
        )
        df = df.sort_values(
            ["o_custkey", "price_cents", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("o_custkey", sort=False).head(topn)
        return from_pandas_clean(df, preserve_index=False)

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["o_custkey", "price_cents", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("o_custkey", sort=False).head(topn)
        df["rnk"] = df.groupby("o_custkey", sort=False).cumcount() + 1
        df["rnk"] = df["rnk"].astype("int64")
        return from_pandas_clean(df, preserve_index=False)

    return (
        ds.map_batches(block_partials, batch_format="pyarrow")
        .repartition(n, keys=["o_custkey"])
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


TOPN_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, price_cents, rnk
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
         ) AS rnk
  FROM orders
) t
WHERE rnk <= 3
"""


_PROFILE_COLS = (
    ("o_orderkey", False),
    ("o_custkey", False),
    ("o_totalprice_cents", True),
)


def profile_orders(sf_dir: str, approx: bool = False) -> pd.DataFrame:
    """Single-pass column profiler over the orders fact table: per
    column row count, null count, distinct count, min and max —
    the data-engine "describe" primitive.

    Two branches, both scale-honest:
    - scalar stats: per-block partial (n_rows, n_nulls, min, max) per
      column — ncols rows per block, merged with one tiny keyed
      aggregate; raw rows never shuffle.
    - distincts, exact (default): per-block DISTINCT (col_id, value)
      melt → (col_id, value) keyed dedup → per-col_id count. Shuffle
      volume is per-block-distinct values (the exact-count lower
      bound).
    - distincts, ``approx=True`` (the 100 TB path): the same melt feeds
      the mergeable HLL sketch (stages/sketch.py) — the exchange moves
      fixed 4 KiB register blocks per column per block, INDEPENDENT of
      cardinality (±~1.6% at p=12; bound asserted in tests/test_sketch.py).

    o_totalprice profiles as integer cents (module float convention).
    Returns a 3-row pandas DataFrame keyed by col_name.
    """
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    ensure_hash_shuffle(ds)
    # all three exchanges carry key-scale rows (ncols/block partials or
    # per-block-distinct values) — size the aggregator pools to the
    # INPUT's metadata size, not the cluster, or pool spin-up dominates
    n = data_nparts(ds)

    def col_values(batch: pa.Table, name: str) -> np.ndarray:
        """Null-dropped int64 values of a profiled column."""
        if name == "o_totalprice_cents":
            raw = batch["o_totalprice"].to_numpy(zero_copy_only=False)
            return _cents(raw[~np.isnan(raw)])
        arr = batch[name]
        if arr.null_count:
            arr = arr.drop_null() if hasattr(arr, "drop_null") else arr.combine_chunks().drop_null()
        return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)

    def scalar_partials(batch: pa.Table) -> pa.Table:
        rows = []
        for cid, (name, _) in enumerate(_PROFILE_COLS):
            src = batch["o_totalprice" if name == "o_totalprice_cents" else name]
            nan_nulls = 0
            if name == "o_totalprice_cents":
                raw = src.to_numpy(zero_copy_only=False)
                nan_nulls = int(np.isnan(raw).sum())
            v = col_values(batch, name)
            rows.append(
                (
                    cid,
                    len(src),
                    max(src.null_count, nan_nulls),
                    int(v.min()) if len(v) else np.iinfo(np.int64).max,
                    int(v.max()) if len(v) else np.iinfo(np.int64).min,
                )
            )
        cid, nr, nn, mn, mx = zip(*rows)
        return pa.table(
            {
                "cid": pa.array(cid, pa.int64()),
                "n_rows": pa.array(nr, pa.int64()),
                "n_nulls": pa.array(nn, pa.int64()),
                "min_v": pa.array(mn, pa.int64()),
                "max_v": pa.array(mx, pa.int64()),
            }
        )

    # block partials are ncols × nblocks rows — merge on the driver
    # (the established partial-top-k pattern), no exchange needed
    scalars = (
        ds.map_batches(scalar_partials, batch_format="pyarrow")
        .to_pandas()
        .groupby("cid")
        .agg(
            n_rows=("n_rows", "sum"),
            n_nulls=("n_nulls", "sum"),
            min_v=("min_v", "min"),
            max_v=("max_v", "max"),
        )
        .reset_index()
    )

    def distinct_melt(batch: pa.Table) -> pa.Table:
        cids, vals = [], []
        for cid, (name, _) in enumerate(_PROFILE_COLS):
            u = np.unique(col_values(batch, name))
            cids.append(np.full(len(u), cid, np.int64))
            vals.append(u)
        return pa.table(
            {
                "cid": pa.array(np.concatenate(cids), pa.int64()),
                "v": pa.array(np.concatenate(vals), pa.int64()),
            }
        )

    # one keyed exchange on v co-locates every copy of a (cid, value)
    # pair; a lexsort first-occurrence scan then counts each distinct
    # pair exactly once per partition (measured 2-4× faster than two
    # chained HashAggregates on this shape)
    def block_distinct(batch: pa.Table) -> pa.Table:
        cid = batch["cid"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, cid))
        cid, v = cid[order], v[order]
        first = np.ones(len(cid), np.bool_)
        if len(cid) > 1:
            first[1:] = (cid[1:] != cid[:-1]) | (v[1:] != v[:-1])
        cnt = np.bincount(cid[first], minlength=len(_PROFILE_COLS))
        return pa.table(
            {
                "cid": pa.array(np.arange(len(_PROFILE_COLS)), pa.int64()),
                "nd": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    if approx:
        from import_ray.stages.sketch import hll_distinct

        melted = ds.map_batches(distinct_melt, batch_format="pyarrow")
        distincts = hll_distinct(melted, "cid", "v").to_pandas()
        distincts["cid"] = distincts["cid"].astype("int64")
        distincts["n_distinct"] = distincts["n_distinct"].astype("int64")
    else:
        distincts = (
            ds.map_batches(distinct_melt, batch_format="pyarrow")
            .repartition(n, keys=["v"])
            .map_batches(block_distinct, batch_format="pyarrow", batch_size=None)
            .to_pandas()
            .groupby("cid")["nd"]
            .sum()
            .rename("n_distinct")
            .reset_index()
        )

    out = scalars.merge(distincts, on="cid").sort_values("cid")
    out["col_name"] = [name for name, _ in _PROFILE_COLS]
    out = out[["col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v"]]
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("col_name").reset_index(drop=True)


PROFILE_ORDERS_SQL = """
SELECT * FROM (
  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
         COUNT(*) - COUNT(o_orderkey) AS n_nulls,
         COUNT(DISTINCT o_orderkey) AS n_distinct,
         MIN(o_orderkey) AS min_v, MAX(o_orderkey) AS max_v
  FROM orders
  UNION ALL
  SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
         COUNT(DISTINCT o_custkey), MIN(o_custkey), MAX(o_custkey)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice_cents', COUNT(*), COUNT(*) - COUNT(o_totalprice),
         COUNT(DISTINCT CAST(ROUND(o_totalprice * 100) AS BIGINT)),
         MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)),
         MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT))
  FROM orders
) p
ORDER BY col_name
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


# --- grouping sets: ROLLUP / CUBE (SURVEY §2.7 grouped aggregation family) ---


def _grouping_sets_lineitem(sf_dir: str, sets):
    """ONE distributed groupby at the finest grain; every coarser
    grouping set folds from the finest result on the driver —
    distributive aggregates make the fold exact, and the finest result
    is schema-scale (|flags| × |status| rows) at ANY data scale, so
    ROLLUP/CUBE cost exactly one exchange."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        tbl = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(qty.astype(np.int64)),
                "one": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        return (
            tbl.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ("one", "sum")])
            .rename_columns(["l_returnflag", "l_linestatus", "sum_qty", "n_rows"])
        )

    from ray.data.aggregate import Sum

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=_np_for(ds))
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_rows", alias_name="n_rows"))
        .to_pandas()
    )
    frames = []
    for keys in sets:
        if keys:
            g = finest.groupby(list(keys), as_index=False)[["sum_qty", "n_rows"]].sum()
        else:
            g = pd.DataFrame(
                {"sum_qty": [finest["sum_qty"].sum()], "n_rows": [finest["n_rows"].sum()]}
            )
        for col in ("l_returnflag", "l_linestatus"):
            if col not in g.columns:
                g[col] = "ALL"
        frames.append(g[["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]])
    out = pd.concat(frames, ignore_index=True)
    out["sum_qty"] = out["sum_qty"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out


def cube_lineitem(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus)."""
    return _grouping_sets_lineitem(
        sf_dir,
        [("l_returnflag", "l_linestatus"), ("l_returnflag",), ("l_linestatus",), ()],
    )


CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# --- skyline (pareto frontier) -----------------------------------------------


def _skyline2d_mask(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Keep mask for the 2-D max-max skyline with strict dominance
    (r2 dominates r1 iff ≥ on both dims and > on at least one; exact
    (price, date) duplicates survive together). One lexsort + two
    segment scans — no pairwise loops."""
    n = len(price)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-date, -price))
    p, d = price[order], date[order]
    new_grp = np.r_[True, p[1:] != p[:-1]]
    grp_idx = np.cumsum(new_grp) - 1
    grp_max = d[new_grp]  # date desc within a price group → first is max
    prev_max = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(grp_max)[:-1]]
    dominated = (d <= prev_max[grp_idx]) | (d < grp_max[grp_idx])
    keep = np.empty(n, bool)
    keep[order] = ~dominated
    return keep


def skyline_orders(sf_dir: str):
    """Distributed 2-D skyline: pareto-optimal orders maximizing
    (total price, order date). Per-batch vectorized frontier scan
    shrinks every batch to its local skyline (sort + running-max — the
    skyline of a union IS the skyline of the union of partial
    skylines), partial frontiers merge in ONE single-partition rescan:
    frontier size, not data size, bounds everything after the map."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def local_skyline(batch: pa.Table) -> pa.Table:
        price = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        date = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        keep = _skyline2d_mask(price, date)
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": pa.array(price[keep], pa.int64()),
                "o_date": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
                "_d": pa.array(date[keep], pa.int64()),
            }
        )

    def merge_skyline(batch: pa.Table) -> pa.Table:
        keep = _skyline2d_mask(
            batch["price_cents"].to_numpy(zero_copy_only=False),
            batch["_d"].to_numpy(zero_copy_only=False),
        )
        return batch.filter(pa.array(keep)).drop_columns(["_d"])

    return (
        ds.map_batches(local_skyline, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge_skyline, batch_format="pyarrow", batch_size=None)
    )


SKYLINE_SQL = """
WITH o AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
         o_orderdate
  FROM orders)
SELECT o_orderkey, price_cents, strftime(o_orderdate, '%Y-%m-%d') AS o_date
FROM o o1
WHERE NOT EXISTS (
  SELECT 1 FROM o o2
  WHERE o2.price_cents >= o1.price_cents AND o2.o_orderdate >= o1.o_orderdate
    AND (o2.price_cents > o1.price_cents OR o2.o_orderdate > o1.o_orderdate))
"""


# --- ordered funnel analysis -------------------------------------------------

FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def funnel_counts(sf_dir: str):
    """Ordered funnel: how many users reached each stage of
    signup → view → click → purchase IN ORDER (stage k counts users
    with an event of type k at/after their stage-(k-1) completion
    time). One user-keyed exchange co-locates each user's events; a
    per-block vectorized pass computes the stage chain with 4 masked
    groupby-mins + merges (no per-user Python loop); the output is
    #stages × #blocks partial rows summed on the driver (16 B each).
    Returns a pandas DataFrame (stage, n_users)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        reached = None  # Series: user_id -> completion ts of prev stage
        out_stage, out_n = [], []
        for i, stage in enumerate(FUNNEL_STAGES):
            ev = df[df["event_type"] == stage]
            if reached is not None:
                ev = ev.merge(
                    reached.rename("prev_ts"), left_on="user_id", right_index=True
                )
                ev = ev[ev["ts"] >= ev["prev_ts"]]
            reached = ev.groupby("user_id", sort=False)["ts"].min()
            out_stage.append(f"{i + 1}_{stage}")
            out_n.append(np.int64(len(reached)))
        return pa.table(
            {"stage": pa.array(out_stage), "n_users": pa.array(out_n, pa.int64())}
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    parts = (
        ds.repartition(_np_for(ds), keys=["user_id"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = parts.groupby("stage", sort=True)["n_users"].sum().reset_index()
    out["n_users"] = out["n_users"].astype("int64")
    return out[["stage", "n_users"]]


FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS ts FROM events e
  JOIN t1 ON e.user_id = t1.user_id AND e.ts >= t1.ts
  WHERE e.event_type = 'view' GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS ts FROM events e
  JOIN t2 ON e.user_id = t2.user_id AND e.ts >= t2.ts
  WHERE e.event_type = 'click' GROUP BY e.user_id),
t4 AS (
  SELECT e.user_id, MIN(e.ts) AS ts FROM events e
  JOIN t3 ON e.user_id = t3.user_id AND e.ts >= t3.ts
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM t1
UNION ALL SELECT '2_view', COUNT(*) FROM t2
UNION ALL SELECT '3_click', COUNT(*) FROM t3
UNION ALL SELECT '4_purchase', COUNT(*) FROM t4
"""


# --- cohort retention --------------------------------------------------------


def cohort_retention(sf_dir: str):
    """Cohort retention matrix: users bucketed by the ISO week (Monday
    start) of their FIRST event, counted as retained in every distinct
    week-offset they were active. One user-keyed exchange; per block,
    first-event week + distinct activity weeks per user are computed
    vectorized (dedup on (user, offset)), yielding (cohort_week,
    week_offset, n) partials — calendar-scale rows summed on the
    driver. Returns a pandas DataFrame."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _monday(ts: pd.Series) -> pd.Series:
        return ts.dt.normalize() - pd.to_timedelta(ts.dt.weekday, unit="D")

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["week"] = _monday(df["ts"])
        first = df.groupby("user_id", sort=False)["week"].min()
        m = df.merge(
            first.rename("first_week"), left_on="user_id", right_index=True
        )
        pairs = pd.DataFrame(
            {
                "user_id": m["user_id"],
                "cohort_week": m["first_week"].dt.strftime("%Y-%m-%d"),
                "week_offset": (
                    (m["week"] - m["first_week"]).dt.days // 7
                ).astype("int64"),
            }
        ).drop_duplicates(["user_id", "week_offset"])
        g = (
            pairs.groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        g["n_users"] = g["n_users"].astype("int64")
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    parts = (
        ds.repartition(_np_for(ds), keys=["user_id"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = (
        parts.groupby(["cohort_week", "week_offset"], sort=True)["n_users"]
        .sum()
        .reset_index()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


COHORT_SQL = """
WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
a AS (
  SELECT DISTINCT e.user_id,
         strftime(DATE_TRUNC('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
         CAST((EXTRACT(EPOCH FROM DATE_TRUNC('week', e.ts))
             - EXTRACT(EPOCH FROM DATE_TRUNC('week', f.first_ts)))
              / 604800 AS BIGINT) AS week_offset
  FROM events e JOIN f ON e.user_id = f.user_id)
SELECT cohort_week, week_offset, COUNT(*) AS n_users
FROM a GROUP BY cohort_week, week_offset
"""


# --- per-user event-transition (Markov) counts -------------------------------


def event_transitions(sf_dir: str):
    """First-order event-transition counts: for every user, consecutive
    event pairs in (ts, event_id) order, counted over the whole corpus
    — the Markov-chain fit over user journeys. One user-keyed exchange;
    per-block lexsort + shift (vectorized), per-block (prev, next)
    partial counts, driver sum of the tiny #types² matrix."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        if not len(df):
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    "next_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        et = df["event_type"].to_numpy(dtype=object)
        uid = df["user_id"].to_numpy()
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        g = (
            pd.DataFrame(
                {
                    "prev_type": np.concatenate(([None], et[:-1]))[same],
                    "next_type": et[same],
                }
            )
            .groupby(["prev_type", "next_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype("int64")
        return from_pandas_clean(g, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    parts = (
        ds.repartition(_np_for(ds), keys=["user_id"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = (
        parts.groupby(["prev_type", "next_type"], sort=True)["n"].sum().reset_index()
    )
    out["n"] = out["n"].astype("int64")
    return out


TRANSITIONS_SQL = """
SELECT prev_type, event_type AS next_type, COUNT(*) AS n
FROM (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


# --- fixed-width numeric histogram -------------------------------------------


def orders_price_histogram(sf_dir: str, bucket_width: float = 20000.0):
    """Fixed-width histogram of order totals: pure map + tiny reduce —
    per-batch ``np.bincount`` partials over floor(price/width), summed
    on the driver. NO shuffle at any scale (the histogram itself is
    bounded by the value range, not the row count)."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        x = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.floor(x / bucket_width).astype(np.int64)
        n = np.bincount(b)
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(n[nz].astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    out = parts.groupby("bucket", sort=True)["n"].sum().reset_index()
    out["n"] = out["n"].astype("int64")
    return out


HISTOGRAM_SQL = """
SELECT CAST(FLOOR(o_totalprice / 20000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM orders GROUP BY bucket
"""


# --- distributed bivariate moments / Pearson correlation ---------------------


def corr_price_quantity(sf_dir: str):
    """Distributed Pearson correlation between l_extendedprice (cents)
    and l_quantity over all of lineitem, computed from EXACT integer
    moment partials: each batch emits int64 (n, Σx, Σy, Σxy, Σx², Σy²)
    — a pure map + one tiny reduce, no shuffle at any scale — and the
    driver merges in arbitrary-precision Python ints (per-batch int64
    sums are overflow-safe at batch_size ≤ 8k; the cross-batch sum is
    not, hence bigint merge). The correlation itself is derived from
    the exact sums with the same double-arithmetic expression the SQL
    oracle uses, so the scaled value matches bit-for-bit."""
    import math

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def partials(batch: pa.Table) -> pa.Table:
        x = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        y = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = [
            len(x),
            int(x.sum()),
            int(y.sum()),
            int((x * y).sum()),
            int((x * x).sum()),
            int((y * y).sum()),
        ]
        return pa.table(
            {
                "k": pa.array(["n", "sx", "sy", "sxy", "sxx", "syy"]),
                "v": pa.array([str(v) for v in vals]),  # decimal strings: the
                # cross-batch sums exceed int64 (Σx² ~ 1e14/row)
            }
        )

    # batch_size bounds the per-batch int64 moment sums: Σx² per batch
    # ≤ (1.1e7 cents)² × 8192 ≈ 8e17 < 2^63 (the cross-batch merge is
    # arbitrary-precision, so only the per-batch bound matters)
    parts = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=8192
    ).to_pandas()
    sums = {k: 0 for k in ("n", "sx", "sy", "sxy", "sxx", "syy")}
    for k, v in zip(parts["k"], parts["v"]):
        sums[k] += int(v)
    n, sx, sy, sxy, sxx, syy = (
        sums["n"], sums["sx"], sums["sy"], sums["sxy"], sums["sxx"], sums["syy"]
    )
    # identical double expression to the SQL oracle: exact bigints cast
    # to double once, then IEEE sqrt/divide — bit-reproducible
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    corr_1e9 = int(math.floor(num / den * 1e9)) if den > 0 else 0
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype="int64"),
            "corr_x1e9": pd.array([corr_1e9], dtype="int64"),
            "sum_x": [str(sx)],
            "sum_y": [str(sy)],
            "sum_xy": [str(sxy)],
            "sum_xx": [str(sxx)],
            "sum_yy": [str(syy)],
        }
    )


CORR_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)) AS sx,
         SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sy,
         SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)
           * CAST(l_quantity AS BIGINT)) AS sxy,
         SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)
           * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS sxx,
         SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
           * CAST(l_quantity AS BIGINT)) AS syy
  FROM lineitem)
SELECT n,
       CAST(FLOOR(CAST(n*sxy - sx*sy AS DOUBLE)
            / (SQRT(CAST(n*sxx - sx*sx AS DOUBLE))
             * SQRT(CAST(n*syy - sy*sy AS DOUBLE))) * 1e9) AS BIGINT)
         AS corr_x1e9,
       CAST(sx AS VARCHAR) AS sum_x,
       CAST(sy AS VARCHAR) AS sum_y,
       CAST(sxy AS VARCHAR) AS sum_xy,
       CAST(sxx AS VARCHAR) AS sum_xx,
       CAST(syy AS VARCHAR) AS sum_yy
FROM m
"""


# --- time-series gap filling -------------------------------------------------


def _dense_daily_series(batch: pa.Table):
    """Block kernel shared by the gap-fill family: (user_id, ts) rows →
    dense per-user daily calendar df (user_id, day_num, n) with zero
    rows for missing days, sorted by (user_id, day_num). Returns None
    on an empty block. Day numbers are integer days-since-epoch
    (resolution-proof vs pandas' datetime64[us]/[ns] unit variance)."""
    df = batch.to_pandas()
    if not len(df):
        return None
    df["day_num"] = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    obs = (
        df.groupby(["user_id", "day_num"], sort=False).size().reset_index(name="n")
    )
    b = obs.groupby("user_id", sort=True)["day_num"].agg(["min", "max"])
    lo_d = b["min"].to_numpy()
    hi_d = b["max"].to_numpy()
    spans = (hi_d - lo_d + 1).astype(np.int64)
    total = int(spans.sum())
    # dense per-user day numbers: global arange minus per-user offset
    starts = np.concatenate(([0], np.cumsum(spans)[:-1]))
    idx = np.arange(total, dtype=np.int64) - np.repeat(starts, spans)
    days = np.repeat(lo_d, spans) + idx
    cal = pd.DataFrame(
        {"user_id": np.repeat(b.index.to_numpy(), spans), "day_num": days}
    )
    out = cal.merge(obs, on=["user_id", "day_num"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return out


def events_gapfill_daily(sf_dir: str):
    """Calendar gap-filling (resample): per-user DAILY event counts
    with explicit zero rows for every missing day between the user's
    first and last event — the dense-series input a forecasting /
    feature pipeline needs. One user-keyed exchange; per block the
    dense calendar is built vectorized (per-user spans via repeat +
    offset arange, then a left merge of observed counts). Output size
    is Σ user-spans (calendar-bounded), never touched by a second
    shuffle."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def per_block(batch: pa.Table) -> pa.Table:
        out = _dense_daily_series(batch)
        if out is None:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        out["day"] = np.datetime_as_string(
            out["day_num"].to_numpy().astype("datetime64[D]"), unit="D"
        )
        return from_pandas_clean(
            out[["user_id", "day", "n"]], preserve_index=False
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


GAPFILL_SQL = """
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY user_id, CAST(ts AS DATE)),
b AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY user_id),
cal AS (
  SELECT b.user_id, CAST(u.g AS DATE) AS day
  FROM b, UNNEST(generate_series(CAST(b.lo AS TIMESTAMP),
                                 CAST(b.hi AS TIMESTAMP),
                                 INTERVAL 1 DAY)) AS u(g))
SELECT cal.user_id, strftime(cal.day, '%Y-%m-%d') AS day,
       COALESCE(d.n, 0) AS n
FROM cal LEFT JOIN d ON cal.user_id = d.user_id AND cal.day = d.day
"""


def events_moving_7d_sum(sf_dir: str):
    """Windowed aggregate over a REGULAR series: per-user trailing
    7-day event-count sum at every day of the user's dense (gap-filled)
    calendar. Same single user-keyed exchange as the gap-fill; the
    window itself is a cumsum-difference over each user's contiguous
    span (vectorized, O(rows))."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def per_block(batch: pa.Table) -> pa.Table:
        out = _dense_daily_series(batch)
        if out is None:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.string()),
                    "sum_7d": pa.array([], pa.int64()),
                }
            )
        n = out["n"].to_numpy()
        uid = out["user_id"].to_numpy()
        csum = np.cumsum(n)
        # subtract the cumsum 7 positions back, clamped to each user's
        # span start (rows are (user, day)-sorted and contiguous)
        first_idx = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1]))
        )
        user_start = np.repeat(first_idx, np.diff(np.append(first_idx, len(uid))))
        back = np.arange(len(n)) - 7
        start_base = csum[user_start] - n[user_start]
        win = csum - np.where(back >= user_start, csum[np.maximum(back, 0)], start_base)
        out["sum_7d"] = win.astype(np.int64)
        out["day"] = np.datetime_as_string(
            out["day_num"].to_numpy().astype("datetime64[D]"), unit="D"
        )
        return from_pandas_clean(
            out[["user_id", "day", "sum_7d"]], preserve_index=False
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


MOVING_7D_SQL = """
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY user_id, CAST(ts AS DATE)),
b AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY user_id),
cal AS (
  SELECT b.user_id, CAST(u.g AS DATE) AS day
  FROM b, UNNEST(generate_series(CAST(b.lo AS TIMESTAMP),
                                 CAST(b.hi AS TIMESTAMP),
                                 INTERVAL 1 DAY)) AS u(g)),
dense AS (
  SELECT cal.user_id, cal.day, COALESCE(d.n, 0) AS n
  FROM cal LEFT JOIN d ON cal.user_id = d.user_id AND cal.day = d.day)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY day
                         ROWS 6 PRECEDING) AS BIGINT) AS sum_7d
FROM dense
"""


def user_activity_trend(sf_dir: str):
    """Per-user linear activity trend: least-squares slope of daily
    event count vs day over each user's dense calendar, from EXACT
    integer moments per user (slope floor-scaled ×1e9 with the same
    double expression as the SQL oracle — bit-reproducible). One
    user-keyed exchange; per-block segmented reduceat moments, no
    per-user Python loop."""
    import math

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def per_block(batch: pa.Table) -> pa.Table:
        out = _dense_daily_series(batch)
        if out is None:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_days": pa.array([], pa.int64()),
                    "slope_x1e9": pa.array([], pa.int64()),
                }
            )
        uid = out["user_id"].to_numpy()
        # center t per user at the span start so Σt² stays small/exact
        t = out["day_num"].to_numpy()
        y = out["n"].to_numpy()
        first_idx = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        seg_len = np.diff(np.append(first_idx, len(uid)))
        t0 = np.repeat(t[first_idx], seg_len)
        tt = t - t0
        n = seg_len.astype(np.int64)
        st = np.add.reduceat(tt, first_idx)
        sy = np.add.reduceat(y, first_idx)
        sty = np.add.reduceat(tt * y, first_idx)
        stt = np.add.reduceat(tt * tt, first_idx)
        num = (n * sty - st * sy).astype(np.float64)
        den = (n * stt - st * st).astype(np.float64)
        slope = np.zeros(len(n))
        nz = den > 0
        slope[nz] = num[nz] / den[nz]
        return pa.table(
            {
                "user_id": pa.array(uid[first_idx].astype(np.int64), pa.int64()),
                "n_days": pa.array(n, pa.int64()),
                "slope_x1e9": pa.array(
                    np.floor(slope * 1e9).astype(np.int64), pa.int64()
                ),
            }
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


TREND_SQL = """
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY user_id, CAST(ts AS DATE)),
b AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY user_id),
cal AS (
  SELECT b.user_id, CAST(u.g AS DATE) AS day
  FROM b, UNNEST(generate_series(CAST(b.lo AS TIMESTAMP),
                                 CAST(b.hi AS TIMESTAMP),
                                 INTERVAL 1 DAY)) AS u(g)),
dense AS (
  SELECT cal.user_id, cal.day, COALESCE(d.n, 0) AS n,
         CAST(cal.day - MIN(cal.day) OVER (PARTITION BY cal.user_id)
              AS BIGINT) AS t
  FROM cal LEFT JOIN d ON cal.user_id = d.user_id AND cal.day = d.day),
m AS (
  SELECT user_id, COUNT(*) AS n_days,
         SUM(t) AS st, SUM(n) AS sy, SUM(t*n) AS sty, SUM(t*t) AS stt
  FROM dense GROUP BY user_id)
SELECT user_id, n_days,
       CASE WHEN n_days*stt - st*st > 0
            THEN CAST(FLOOR(CAST(n_days*sty - st*sy AS DOUBLE)
                          / CAST(n_days*stt - st*st AS DOUBLE) * 1e9) AS BIGINT)
            ELSE 0 END AS slope_x1e9
FROM m
"""


# --- ordered string aggregation (sequence reconstruction) ---------------------


def user_event_paths(sf_dir: str):
    """Ordered string aggregation (SQL ``STRING_AGG(... ORDER BY ...)``):
    each user's full event-type journey as one delimited string in
    exact (ts, event_id) order — the sequence-reconstruction primitive
    behind session mining and behavioral modeling.

    Shape: ONE user-keyed exchange co-locates each user's rows, then a
    per-block mergesort + run-length segmentation + a single
    ``pyarrow.compute.binary_join`` over a zero-copy ListArray view —
    the concatenation is one Arrow kernel call per block, no per-user
    Python join. Output rows are user-grain (#users ≪ #events), so
    nothing ever materializes on the driver.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        uid = df["user_id"].to_numpy()
        if not len(df):
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "path": pa.array([], pa.string()),
                }
            )
        starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        counts = np.diff(np.append(starts, len(uid)))
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        vals = pa.array(df["event_type"].to_numpy(dtype=object), pa.string())
        runs = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        return pa.table(
            {
                "user_id": pa.array(uid[starts].astype(np.int64), pa.int64()),
                "n_events": pa.array(counts.astype(np.int64), pa.int64()),
                "path": pc.binary_join(runs, ">"),
            }
        )

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


USER_EVENT_PATHS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
FROM events
GROUP BY user_id
"""


# --- grouped higher moments: skewness / kurtosis from exact integer sums ------


def quantity_moments_by_flag(sf_dir: str):
    """Grouped skewness + excess kurtosis of ``l_quantity`` per
    ``l_returnflag`` from EXACT integer raw-moment sums.

    Distributed shape (same technique as :func:`corr_price_quantity`,
    extended to grouped 3rd/4th moments): every batch pre-aggregates
    (n, Σq, Σq², Σq³, Σq⁴) per group with one Arrow ``group_by`` — the
    keyed exchange then moves ≤ #groups rows per batch, never data rows.
    The standardized moments are derived per group from the exact
    bigint sums with the SAME double expression the SQL oracle uses
    (single division + IEEE sqrt — bit-reproducible), floor-scaled
    ×1e9 into int64.

    Int64 bounds: q ≤ 50 so Σq⁴ ≤ 6.25e6/row — the global per-group
    sums stay < 2⁶³ up to ~10¹² rows; the final per-group combination
    (n²·s3, s1⁴, …) runs in arbitrary-precision Python ints over
    #groups rows, never at data scale. The DuckDB oracle carries the
    same combination in HUGEINT (fine at oracle scale; 128-bit
    overflow would begin around sf 10⁴, far past sf0.01).
    """
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        q2 = q * q
        tbl = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "one": pa.array(np.ones(len(q), np.int64)),
                "s1": pa.array(q),
                "s2": pa.array(q2),
                "s3": pa.array(q2 * q),
                "s4": pa.array(q2 * q2),
            }
        )
        return (
            tbl.group_by(["l_returnflag"])
            .aggregate(
                [("one", "sum"), ("s1", "sum"), ("s2", "sum"), ("s3", "sum"), ("s4", "sum")]
            )
            .rename_columns(["l_returnflag", "n_rows", "s1", "s2", "s3", "s4"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag", num_partitions=_np_for(ds))
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
            Sum("s3", alias_name="s3"),
            Sum("s4", alias_name="s4"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # #groups rows total — exact bigint combination per row
        skews, kurts = [], []
        for i in range(len(batch)):
            n = int(batch["n_rows"][i].as_py())
            s1 = int(batch["s1"][i].as_py())
            s2 = int(batch["s2"][i].as_py())
            s3 = int(batch["s3"][i].as_py())
            s4 = int(batch["s4"][i].as_py())
            b = n * s2 - s1 * s1
            if b <= 0 or n == 0:
                skews.append(0)
                kurts.append(0)
                continue
            a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
            c = n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1**4
            # identical double expressions to the SQL oracle
            skew = float(a) / (float(b) * math.sqrt(float(b)))
            kurt = float(c) / float(b * b) - 3.0
            skews.append(math.floor(skew * 1e9))
            kurts.append(math.floor(kurt * 1e9))
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "n_rows": batch["n_rows"],
                "s1": batch["s1"],
                "s2": batch["s2"],
                "s3": batch["s3"],
                "s4": batch["s4"],
                "skew_x1e9": pa.array(skews, pa.int64()),
                "kurt_x1e9": pa.array(kurts, pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


MOMENTS_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s1,
         SUM(CAST(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s2,
         SUM(CAST(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)
                  *CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s3,
         SUM(CAST(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)
                  *CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s4
  FROM lineitem GROUP BY l_returnflag),
d AS (
  SELECT l_returnflag, n, s1, s2, s3, s4,
         n*s2 - s1*s1 AS b,
         n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS a,
         n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1 AS c
  FROM m)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
       CAST(s3 AS BIGINT) AS s3, CAST(s4 AS BIGINT) AS s4,
       CASE WHEN b > 0 THEN CAST(FLOOR(CAST(a AS DOUBLE)
              / (CAST(b AS DOUBLE) * SQRT(CAST(b AS DOUBLE))) * 1e9) AS BIGINT)
            ELSE 0 END AS skew_x1e9,
       CASE WHEN b > 0 THEN CAST(FLOOR((CAST(c AS DOUBLE) / CAST(b*b AS DOUBLE) - 3.0)
              * 1e9) AS BIGINT)
            ELSE 0 END AS kurt_x1e9
FROM d
"""


# --- set-similarity self-join: Jaccard over order part-sets -------------------


def order_part_jaccard(sf_dir: str, threshold_pct: int = 50):
    """Set-similarity self-join: all order pairs whose part-sets have
    Jaccard similarity >= threshold_pct/100, with exact intersection /
    union counts (integer arithmetic end-to-end, so the value hash
    matches the SQL oracle bit-for-bit).

    Distributed shape (inverted-index join, the exact-counting half of
    PPJoin):
      1. one exchange keyed on l_orderkey co-locates each order's
         rows; per-block (order,part) distinct + set-size tagging —
         sizes ride along with the rows, so no size join later;
      2. one exchange keyed on l_partkey builds the inverted index;
         per-block vectorized pair expansion (triu per token group)
         emits (o1, o2, n1, n2) candidate rows;
      3. one keyed aggregate over (o1, o2) counts shared tokens
         exactly (Count) and carries the set sizes (Max of a
         per-pair-constant) — no verification pass is needed because
         the count IS the intersection;
      4. a stateless filter applies 100*|A∩B| >= t*|A∪B| in integers.

    Skew: a token appearing in f sets emits C(f,2) candidates — the
    classic hot-token blowup of exact all-pairs Jaccard. Token fan-in
    here is bounded (parts per order ~4, orders per part ~30 at any
    SF by TPC-H construction). For open-vocabulary corpora switch to
    prefix filtering (index only the (s - ceil(t*s) + 1) globally
    rarest tokens per set) + a blob-join verify — the machinery in
    stages/neardup.py; the max observed token frequency is logged so
    the blowup is visible, never silent.
    """
    import logging

    from ray.data.aggregate import Count, Max

    from import_ray.core.context import ensure_hash_shuffle

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    ensure_hash_shuffle(ds)
    n = _np_for(ds)

    def distinct_with_size(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-block distinct (all rows of an order are co-located here)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        keep = np.concatenate(
            ([True], (o[1:] != o[:-1]) | (p[1:] != p[:-1]))
        )
        o, p = o[keep], p[keep]
        starts = np.flatnonzero(np.concatenate(([True], o[1:] != o[:-1])))
        sizes = np.diff(np.append(starts, len(o))).astype(np.int64)
        return pa.table(
            {
                "o": pa.array(o),
                "p": pa.array(p),
                "n_set": pa.array(np.repeat(sizes, sizes)),
            }
        )

    opn = ds.repartition(n, keys=["l_orderkey"]).map_batches(
        distinct_with_size, batch_format="pyarrow", batch_size=None
    )

    def pairs(batch: pa.Table) -> pa.Table:
        o = batch["o"].to_numpy(zero_copy_only=False)
        p = batch["p"].to_numpy(zero_copy_only=False)
        ns = batch["n_set"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, p))
        o, p, ns = o[order], p[order], ns[order]
        starts = np.flatnonzero(np.concatenate(([True], p[1:] != p[:-1])))
        lens = np.diff(np.append(starts, len(p)))
        max_f = int(lens.max()) if len(lens) else 0
        if max_f > 100_000:
            logging.getLogger(__name__).warning(
                "order_part_jaccard: hot token with %d sets -> %d candidate "
                "pairs from one token; consider prefix filtering",
                max_f, max_f * (max_f - 1) // 2,
            )
        lo_i, hi_i = [], []
        for s, g in zip(starts, lens):
            if g < 2:
                continue
            iu, ju = np.triu_indices(int(g), 1)
            lo_i.append(iu + s)
            hi_i.append(ju + s)
        if not lo_i:
            return pa.table(
                {
                    "o1": pa.array([], pa.int64()),
                    "o2": pa.array([], pa.int64()),
                    "n1": pa.array([], pa.int64()),
                    "n2": pa.array([], pa.int64()),
                }
            )
        i = np.concatenate(lo_i)
        j = np.concatenate(hi_i)
        # orient each pair (o1 < o2) so the keyed count groups correctly
        swap = o[i] > o[j]
        i2 = np.where(swap, j, i)
        j2 = np.where(swap, i, j)
        return pa.table(
            {
                "o1": pa.array(o[i2].astype(np.int64)),
                "o2": pa.array(o[j2].astype(np.int64)),
                "n1": pa.array(ns[i2].astype(np.int64)),
                "n2": pa.array(ns[j2].astype(np.int64)),
            }
        )

    agg = (
        opn.repartition(n, keys=["p"])
        .map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["o1", "o2"], num_partitions=n)
        .aggregate(
            Count(alias_name="n_common"),
            Max("n1", alias_name="n1"),
            Max("n2", alias_name="n2"),
        )
    )

    t = int(threshold_pct)

    def finalize(batch: pa.Table) -> pa.Table:
        inter = batch["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        n1 = batch["n1"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = batch["n2"].to_numpy(zero_copy_only=False).astype(np.int64)
        uni = n1 + n2 - inter
        keep = 100 * inter >= t * uni
        return pa.table(
            {
                "o1": pa.array(batch["o1"].to_numpy(zero_copy_only=False)[keep]),
                "o2": pa.array(batch["o2"].to_numpy(zero_copy_only=False)[keep]),
                "n_common": pa.array(inter[keep]),
                "n_union": pa.array(uni[keep]),
                "jacc_x1e6": pa.array(inter[keep] * 1_000_000 // uni[keep]),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


ORDER_JACCARD_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
sz AS (SELECT o, COUNT(*) AS n FROM op GROUP BY o),
inter AS (
  SELECT a.o AS o1, b.o AS o2, COUNT(*) AS n_common
  FROM op a JOIN op b ON a.p = b.p AND a.o < b.o
  GROUP BY a.o, b.o),
j AS (
  SELECT i.o1, i.o2, i.n_common, sa.n + sb.n - i.n_common AS n_union
  FROM inter i JOIN sz sa ON sa.o = i.o1 JOIN sz sb ON sb.o = i.o2)
SELECT o1, o2, n_common, n_union,
       n_common * 1000000 // n_union AS jacc_x1e6
FROM j WHERE 100 * n_common >= 50 * n_union
"""


# --- per-row rank windows: PERCENT_RANK / CUME_DIST without a global sort -----


def percent_rank_orders(sf_dir: str):
    """Exact grouped PERCENT_RANK + CUME_DIST of ``o_totalprice`` within
    each ``o_orderpriority`` — a PER-ROW window output computed WITHOUT
    a global sort (ranking over a 5-group partition would otherwise be
    a 5-partition skewed sort-shuffle).

    Distributed shape (the bucket-histogram family of
    :func:`price_percentiles_by_flag` / NTILE, extended to per-row
    ranks):

    1. coarse pass — per-block (group, cents-bucket) histograms merge
       driver-side; the table is DOMAIN-bounded (#groups × domain/1024
       rows), independent of row count. Prefix sums give every bucket's
       strict-rank offset within its group plus each group's n.
    2. ONE keyed exchange on (group, bucket) co-locates each bucket's
       rows; per block: mergesort + vectorized run segmentation gives
       each row's within-bucket strict-less / ≤ counts (first/last
       position of its tie run — no per-run Python loops), so
       rank = bucket offset + local strict count.

    Ties: cents is a bijection of the 2-decimal price, so tie runs are
    exact and PERCENT_RANK's shared-rank semantics reproduce. The final
    doubles use the SAME expression as the SQL window definition
    ((rank−1)/(n−1) and leq/n, single IEEE division), floor-scaled
    ×1e9 into int64 for bit-stable comparison.
    """
    from import_ray.core.context import ensure_hash_shuffle

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    ensure_hash_shuffle(ds)
    n_parts = _np_for(ds)
    BITS = 10

    def coarse(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "grp": batch["o_orderpriority"].to_pandas(),
                "bucket": _cents(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False)
                )
                >> BITS,
            }
        )
        g = df.groupby(["grp", "bucket"], sort=False).size().reset_index(name="cnt")
        return from_pandas_clean(g, preserve_index=False)

    hist = (
        ds.map_batches(coarse, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby(["grp", "bucket"], sort=True)["cnt"]
        .sum()
        .reset_index()
    )
    parts = []
    for grp, sub in hist.groupby("grp", sort=True):
        sub = sub.sort_values("bucket")
        cnt = sub["cnt"].to_numpy()
        off = np.concatenate(([0], cnt.cumsum()[:-1]))
        parts.append(
            pd.DataFrame(
                {
                    "grp": grp,
                    "bucket": sub["bucket"].to_numpy(),
                    "offset": off.astype(np.int64),
                    "n_grp": np.int64(cnt.sum()),
                }
            )
        )
    # domain-bounded broadcast table: (group, bucket) → rank offset, n
    lookup = pd.concat(parts, ignore_index=True)

    def tag(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "grp": batch["o_orderpriority"],
                "bucket": pa.array(cents >> BITS, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "pr_x1e9": pa.array([], pa.int64()),
                    "cd_x1e9": pa.array([], pa.int64()),
                }
            )
        df = df.sort_values(["grp", "bucket", "cents"], kind="mergesort")
        m = len(df)
        grp = df["grp"].to_numpy(dtype=object)
        bkt = df["bucket"].to_numpy()
        cents = df["cents"].to_numpy()
        new_run = np.empty(m, dtype=bool)
        new_run[0] = True
        new_run[1:] = (grp[1:] != grp[:-1]) | (bkt[1:] != bkt[:-1])
        new_val = new_run.copy()
        new_val[1:] |= cents[1:] != cents[:-1]
        idx = np.arange(m)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        val_start = np.maximum.accumulate(np.where(new_val, idx, 0))
        vid = np.cumsum(new_val) - 1
        val_len = np.bincount(vid)
        strict = val_start - run_start  # in-bucket rows strictly less
        leq = strict + val_len[vid]  # in-bucket rows <=
        j = df.merge(lookup, on=["grp", "bucket"], how="left", sort=False)
        off = j["offset"].to_numpy().astype(np.int64)
        n_g = j["n_grp"].to_numpy().astype(np.int64)
        rank = off + strict  # 0-based RANK-1 (ties share first position)
        pr = np.where(n_g > 1, rank / np.maximum(n_g - 1, 1), 0.0)
        cd = (off + leq) / n_g
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
                "pr_x1e9": pa.array(np.floor(pr * 1e9).astype(np.int64)),
                "cd_x1e9": pa.array(np.floor(cd * 1e9).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .repartition(n_parts, keys=["grp", "bucket"])
        .map_batches(per_block, batch_format="pyarrow", batch_size=None)
    )


PERCENT_RANK_SQL = """
SELECT o_orderkey,
       CAST(FLOOR(PERCENT_RANK() OVER (
           PARTITION BY o_orderpriority ORDER BY o_totalprice) * 1e9) AS BIGINT)
         AS pr_x1e9,
       CAST(FLOOR(CUME_DIST() OVER (
           PARTITION BY o_orderpriority ORDER BY o_totalprice) * 1e9) AS BIGINT)
         AS cd_x1e9
FROM orders
"""


# --- grouped OLS regression ---------------------------------------------------


def regr_orders_by_priority(sf_dir: str):
    """Per-priority OLS regression of order value (cents) on order date
    (epoch days): slope and intercept per ``o_orderpriority`` — the
    grouped trend-line primitive (drift of spend over time per
    segment).

    Same exact-integer-moments shape as :func:`corr_price_quantity`,
    but keyed: each batch emits per-group int64 partial moments
    (n, Σx, Σy, Σxy, Σx²) as decimal strings — a pure map with NO
    shuffle (#groups × #blocks tiny rows) — and the driver folds them
    in arbitrary-precision Python ints. slope/intercept are derived
    from the exact sums with the identical double expression the SQL
    oracle uses (one int→double rounding per operand, IEEE divide), so
    the ×1e9/×1e6 floor-scaled values match bit-for-bit."""
    import math

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        grp = batch["o_orderpriority"].to_pandas().to_numpy(dtype=object)
        x = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        y = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "grp": grp,
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,  # ≤ 1e4 days × 6e7 cents = 6e11/row; batch
                "sxx": x * x,  # sums safe in int64 at batch_size ≤ 8k
            }
        )
        agg = df.groupby("grp", sort=False).sum().reset_index()
        out = {"grp": pa.array(agg["grp"].to_numpy(dtype=object), pa.string())}
        for c in ("n", "sx", "sy", "sxy", "sxx"):
            out[c] = pa.array([str(int(v)) for v in agg[c]], pa.string())
        return pa.table(out)

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=8192).to_pandas()
    sums: dict[str, list[int]] = {}
    for _, r in parts.iterrows():
        s = sums.setdefault(r["grp"], [0, 0, 0, 0, 0])
        for i, c in enumerate(("n", "sx", "sy", "sxy", "sxx")):
            s[i] += int(r[c])
    rows = []
    for grp in sorted(sums):
        n, sx, sy, sxy, sxx = sums[grp]
        num = float(n * sxy - sx * sy)
        den = float(n * sxx - sx * sx)
        slope = num / den if den else 0.0
        icept = (float(sy) - slope * float(sx)) / float(n) if n else 0.0
        rows.append(
            {
                "grp": grp,
                "n": n,
                "slope_x1e9": int(math.floor(slope * 1e9)),
                "icept_x1e6": int(math.floor(icept * 1e6)),
            }
        )
    out = pd.DataFrame(rows, columns=["grp", "n", "slope_x1e9", "icept_x1e6"])
    for c in ("n", "slope_x1e9", "icept_x1e6"):
        out[c] = out[c].astype("int64")
    return out


REGR_BY_PRIORITY_SQL = """
WITH t AS (
  SELECT o_orderpriority AS grp,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS x,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
), s AS (
  SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM t GROUP BY grp
)
SELECT grp, CAST(n AS BIGINT) AS n,
       CAST(FLOOR(CAST(n*sxy - sx*sy AS DOUBLE)
            / CAST(n*sxx - sx*sx AS DOUBLE) * 1e9) AS BIGINT) AS slope_x1e9,
       CAST(FLOOR((CAST(sy AS DOUBLE)
            - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e6) AS BIGINT)
         AS icept_x1e6
FROM s ORDER BY grp
"""


# --- hot-key skew diagnostic ----------------------------------------------------


def user_skew_profile(sf_dir: str, k: int = 10):
    """Hot-key profile of ``events.user_id``: the ``k`` heaviest users
    with their exact event counts and traffic shares, plus the corpus
    Herfindahl concentration index — the shuffle-planning diagnostic
    that decides whether a key needs salting before a groupby.

    Distributed shape: per-batch partial user counts → ONE user-keyed
    exchange (block-local count = global count) → each block emits its
    local top-k candidates AND one (Σc², ΣT) summary row as decimal
    strings → driver merges #blocks tiny partials with Python ints.
    share/HHI use exact-int numerators through the oracle's exact IEEE
    expression."""
    import math

    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ds = _read(sf_dir, "events", ["user_id"])
    ensure_hash_shuffle(ds)
    n = data_nparts(ds)

    def local_counts(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def block_profile(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "user_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.string()),
                }
            )
        g = df.groupby("user_id", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "user_id"], ascending=[False, True], kind="mergesort")
        top = g.head(k)
        c = g["n"].to_numpy(dtype=np.int64)
        s2 = sum(int(x) * int(x) for x in c)  # python ints: no overflow
        t = int(c.sum())
        return pa.table(
            {
                "kind": pa.array(["top"] * len(top) + ["sum"], pa.string()),
                "user_id": pa.array(
                    list(top["user_id"].astype("int64")) + [0], pa.int64()
                ),
                "n": pa.array(
                    [str(int(x)) for x in top["n"]] + [f"{s2},{t}"], pa.string()
                ),
            }
        )

    parts = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .repartition(n, keys=["user_id"])
        .map_batches(block_profile, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    s2 = t = 0
    cands: list[tuple[int, int]] = []
    for kind, uid, v in zip(parts["kind"], parts["user_id"], parts["n"]):
        if kind == "sum":
            a, b = v.split(",")
            s2 += int(a)
            t += int(b)
        else:
            cands.append((int(uid), int(v)))
    cands.sort(key=lambda r: (-r[1], r[0]))
    hhi = (
        int(math.floor(float(s2) / (float(t) * float(t)) * 1e9)) if t else 0
    )
    rows = [
        {
            "user_id": uid,
            "n_events": c,
            "share_x1e9": int(math.floor(float(c) / float(t) * 1e9)),
            "hhi_x1e9": hhi,
        }
        for uid, c in cands[:k]
    ]
    out = pd.DataFrame(
        rows, columns=["user_id", "n_events", "share_x1e9", "hhi_x1e9"]
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


USER_SKEW_SQL = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
), tot AS (
  SELECT CAST(SUM(n) AS HUGEINT) AS t,
         SUM(CAST(n AS HUGEINT) * n) AS s2
  FROM c
)
SELECT user_id, n AS n_events,
       CAST(FLOOR(CAST(n AS DOUBLE) / CAST(t AS DOUBLE) * 1e9) AS BIGINT)
         AS share_x1e9,
       CAST(FLOOR(CAST(s2 AS DOUBLE)
            / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) * 1e9) AS BIGINT)
         AS hhi_x1e9
FROM c, tot ORDER BY n DESC, user_id LIMIT 10
"""


# --- time-interval RANGE window over irregular event times -------------------


def events_trailing_interval(sf_dir: str, minutes: int = 60):
    """Per event: count and exact cent-sum of the same user's events in
    the trailing time interval [ts - minutes, ts] — the RANGE-frame
    window (SQL ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT
    ROW``) over an IRREGULAR series, complementing the dense-calendar
    ROWS-frame ops (events_moving_7d_sum). One user-keyed exchange;
    per block: mergesort by (user, ts, event_id), then per user segment
    two vectorized searchsorted calls + a cumsum-difference — O(rows)
    work, no per-row loop. Peer rows (equal ts) are included like the
    SQL RANGE frame. Values sum as int64 cents, bit-equal to the
    oracle."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    delta_us = np.int64(minutes) * 60_000_000

    def per_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].values.astype("datetime64[us]").astype(np.int64)
        cents = np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)
        pre = np.concatenate([[0], np.cumsum(cents)])
        uid = df["user_id"].to_numpy()
        seg_starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        bounds = np.r_[seg_starts, len(uid)]
        lo = np.empty(len(uid), np.int64)
        hi = np.empty(len(uid), np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = ts[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - delta_us, side="left")
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": uid,
                "n_window": hi - lo,
                "sum_cents_window": pre[hi] - pre[lo],
            }
        )
        return from_pandas_clean(out, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    return ds.repartition(_np_for(ds), keys=["user_id"]).map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


TRAILING_INTERVAL_SQL = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


# --- functional-dependency profiling ------------------------------------------


FD_PAIRS = (
    ("o_custkey", "o_orderstatus"),
    ("o_orderdate", "o_orderpriority"),
    ("o_orderpriority", "o_orderstatus"),
)


def fd_profile_orders(sf_dir: str, pairs=FD_PAIRS):
    """Functional-dependency validation: for each candidate lhs→rhs
    column pair, how many distinct lhs values exist and how many of
    them map to MORE than one distinct rhs (FD violations) — the
    data-profiling analog of the reference's two-sided uniqueness
    checks (StatVarState bimap collision detection, SURVEY §2.5).

    ONE scan over the union of needed columns emits per-block-distinct
    (pair_id, lhs, rhs) rows; ONE (pair_id, lhs)-keyed exchange
    co-locates each lhs group; per-block distinct-rhs counting emits
    pair-scale partials folded on the driver."""
    cols = sorted({c for p in pairs for c in p})
    ds = _read(sf_dir, "orders", cols)
    n = _np_for(ds)
    pair_list = list(pairs)

    def tagged(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        outs = []
        for i, (lhs, rhs) in enumerate(pair_list):
            d = df[[lhs, rhs]].astype(str).drop_duplicates()
            outs.append(
                pd.DataFrame(
                    {"pair_id": np.int64(i), "lhs": d[lhs], "rhs": d[rhs]}
                )
            )
        out = pd.concat(outs, ignore_index=True)
        return from_pandas_clean(out, preserve_index=False)

    def count_block(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        g = df.groupby(["pair_id", "lhs"], sort=False)["rhs"].nunique()
        per_pair = g.reset_index().groupby("pair_id", sort=False)["rhs"].agg(
            n_groups="size", n_violations=lambda s: int((s > 1).sum())
        )
        out = per_pair.reset_index()
        for c in ("n_groups", "n_violations"):
            out[c] = out[c].astype("int64")
        return from_pandas_clean(out, preserve_index=False)

    from import_ray.core.context import ensure_hash_shuffle

    t = ds.map_batches(tagged, batch_format="pyarrow")
    ensure_hash_shuffle(t)
    partials = (
        t.repartition(n, keys=["pair_id", "lhs"])
        .map_batches(count_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    agg = (
        partials.groupby("pair_id", sort=True)[["n_groups", "n_violations"]]
        .sum()
        .reset_index()
    )
    agg["lhs_col"] = [pair_list[i][0] for i in agg["pair_id"]]
    agg["rhs_col"] = [pair_list[i][1] for i in agg["pair_id"]]
    out = agg[["lhs_col", "rhs_col", "n_groups", "n_violations"]].copy()
    for c in ("n_groups", "n_violations"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["lhs_col", "rhs_col"]).reset_index(drop=True)


FD_PROFILE_SQL = """
WITH p AS (
  SELECT 'o_custkey' AS lhs_col, 'o_orderstatus' AS rhs_col,
         CAST(o_custkey AS VARCHAR) AS lhs, CAST(o_orderstatus AS VARCHAR) AS rhs
  FROM orders
  UNION ALL
  SELECT 'o_orderdate', 'o_orderpriority',
         CAST(o_orderdate AS VARCHAR), CAST(o_orderpriority AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', 'o_orderstatus',
         CAST(o_orderpriority AS VARCHAR), CAST(o_orderstatus AS VARCHAR)
  FROM orders
), g AS (
  SELECT lhs_col, rhs_col, lhs, COUNT(DISTINCT rhs) AS k
  FROM p GROUP BY lhs_col, rhs_col, lhs
)
SELECT lhs_col, rhs_col,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM g GROUP BY lhs_col, rhs_col
ORDER BY lhs_col, rhs_col
"""


def coalesce_intervals(ds, key_col="key", start_col="start", end_col="end"):
    """Gaps-and-islands interval coalescing: merge overlapping or
    touching ``[start, end]`` intervals per key into maximal islands,
    returning (key, start, end, n_merged). The SQL running-MAX window
    island construction, distributed: ONE keyed exchange on ``key``
    co-locates each key's intervals; the block kernel is a mergesort +
    grouped cummax (islands break where a start exceeds the running
    max end of everything before it). Key cardinality partitions the
    work; a single hot key lands in one partition but stays vectorized.
    """
    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    n = data_nparts(ds)

    def merge_block(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], pa.int64()),
                "start": pa.array([], pa.timestamp("us")),
                "end": pa.array([], pa.timestamp("us")),
                "n_merged": pa.array([], pa.int64()),
            }
        )
        if len(b) == 0 or b.num_columns == 0:
            return empty
        df = b.to_pandas().rename(
            columns={key_col: "key", start_col: "start", end_col: "end"}
        )
        df = df.sort_values(["key", "start", "end"], kind="mergesort").reset_index(
            drop=True
        )
        prev_max = df.groupby("key", sort=False)["end"].cummax().shift(1)
        new_key = df["key"].ne(df["key"].shift(1))
        brk = new_key | (df["start"] > prev_max)
        grp = brk.cumsum()
        out = (
            df.groupby(["key", grp], sort=False)
            .agg(
                key=("key", "first"),
                start=("start", "min"),
                end=("end", "max"),
                n_merged=("end", "size"),
            )
            .reset_index(drop=True)
        )
        out["n_merged"] = out["n_merged"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return ds.repartition(n, keys=[key_col]).map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )


def coalesce_order_intervals(sf_dir: str):
    """Per-customer-bucket activity windows: each order opens an
    interval [o_orderdate, o_orderdate + (o_orderkey%20) days]; buckets
    are o_custkey % 50. Overlapping windows coalesce into maximal
    activity islands (coalesce_intervals)."""
    import numpy as np

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def to_intervals(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        end = start + ((k % 20) * np.timedelta64(1, "D")).astype("timedelta64[us]")
        return pa.table(
            {
                "key": pa.array(
                    b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64) % 50,
                    pa.int64(),
                ),
                "start": pa.array(start, pa.timestamp("us")),
                "end": pa.array(end, pa.timestamp("us")),
            }
        )

    return coalesce_intervals(ds.map_batches(to_intervals, batch_format="pyarrow"))


COALESCE_INTERVALS_SQL = """
WITH I AS (
  SELECT o_custkey % 50 AS key,
         o_orderdate AS s,
         o_orderdate + (o_orderkey % 20) * INTERVAL 1 DAY AS e
  FROM orders
),
X AS (
  SELECT key, s, e,
         CASE WHEN s > MAX(e) OVER (PARTITION BY key ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS brk
  FROM I
),
G AS (
  SELECT key, s, e,
         SUM(brk) OVER (PARTITION BY key ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM X
)
SELECT key, MIN(s) AS start, MAX(e) AS "end",
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM G GROUP BY key, grp
"""


def interval_overlap_join(
    left_ds,
    right_ds,
    bucket_days: int = 16,
    key_col="key",
    start_col="start",
    end_col="end",
):
    """Keyed interval×interval overlap join: all (left, right) pairs
    with the same key whose ``[start, end]`` ranges intersect —
    returning (key, l_id, r_id, overlap_start, overlap_end). The
    interval analog of the engine's point-in-range join
    (purchase_click_window), and the shape a temporal-KG validity
    cross-reference needs.

    Distributed via time-GRID bucketing (the standard interval-join
    partitioning, e.g. Flink's window join): every interval replicates
    to each ``bucket_days`` grid cell it spans, ONE keyed exchange on
    (key, cell) co-locates candidates, and each pair is emitted exactly
    once — by its ANCHOR cell, the cell containing max(l.start,
    r.start) — so no second dedup exchange exists. The per-cell kernel
    is sort + searchsorted prefix counts (candidate pairs generated by
    one flat gather), never a Python pair loop. Replication factor =
    mean interval span / bucket width; pick ``bucket_days`` near the
    median span.
    """
    import pandas as pd

    from import_ray.core.context import data_nparts, ensure_hash_shuffle

    ensure_hash_shuffle(left_ds)
    n = data_nparts(left_ds)
    width = np.int64(bucket_days * 86_400_000_000)  # grid cell in us

    def explode(side: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            key = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            s = b[start_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            e = b[end_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            b0 = s // width
            b1 = e // width
            reps = (b1 - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(ids)), reps)
            offs = np.concatenate(([0], np.cumsum(reps)))[:-1]
            cell = b0[idx] + (np.arange(reps.sum()) - np.repeat(offs, reps))
            kb = key[idx] * np.int64(1_000_003) + cell  # composite exchange key
            return pa.table(
                {
                    "kb": pa.array(kb, pa.int64()),
                    "key": pa.array(key[idx], pa.int64()),
                    "cell": pa.array(cell, pa.int64()),
                    "side": pa.array(np.full(len(idx), side, np.int8), pa.int8()),
                    "id": pa.array(ids[idx], pa.int64()),
                    "s": pa.array(s[idx], pa.int64()),
                    "e": pa.array(e[idx], pa.int64()),
                }
            )

        return f

    both = left_ds.map_batches(explode(0), batch_format="pyarrow").union(
        right_ds.map_batches(explode(1), batch_format="pyarrow")
    )

    def pairs_block(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], pa.int64()),
                "l_id": pa.array([], pa.int64()),
                "r_id": pa.array([], pa.int64()),
                "overlap_start": pa.array([], pa.timestamp("us")),
                "overlap_end": pa.array([], pa.timestamp("us")),
            }
        )
        if len(b) == 0 or b.num_columns == 0:
            return empty
        df = b.to_pandas().sort_values(["key", "cell", "side", "s"], kind="mergesort")
        gk = df["key"].to_numpy()
        gc = df["cell"].to_numpy()
        side = df["side"].to_numpy()
        out_l, out_r, out_s, out_e, out_k = [], [], [], [], []
        # group bounds per (key, cell) — the kb hash is only the
        # exchange key; boundaries use the real columns so composite
        # collisions can't merge groups
        new = np.r_[True, (gk[1:] != gk[:-1]) | (gc[1:] != gc[:-1])]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(df))
        S = df["s"].to_numpy()
        E = df["e"].to_numpy()
        ID = df["id"].to_numpy()
        KEY = df["key"].to_numpy()
        CELL = df["cell"].to_numpy()
        for g0, g1 in zip(starts, ends):
            sl = slice(g0, g1)
            sd = side[sl]
            nl = int((sd == 0).sum())
            if nl == 0 or nl == g1 - g0:
                continue
            ls, le, lid = S[sl][:nl], E[sl][:nl], ID[sl][:nl]
            rs, re_, rid = S[sl][nl:], E[sl][nl:], ID[sl][nl:]
            cell = CELL[g0]
            key = KEY[g0]
            # lefts sorted by s; for each right: lefts with s <= r.e
            cnt = np.searchsorted(ls, re_, side="right")
            tot = int(cnt.sum())
            if tot == 0:
                continue
            r_idx = np.repeat(np.arange(len(rs)), cnt)
            offs = np.concatenate(([0], np.cumsum(cnt)))[:-1]
            l_idx = np.arange(tot) - np.repeat(offs, cnt)
            keep = le[l_idx] >= rs[r_idx]
            # anchor: emit only in the cell holding max(l.s, r.s)
            anchor = np.maximum(ls[l_idx], rs[r_idx]) // width == cell
            keep &= anchor
            if not keep.any():
                continue
            li, ri = l_idx[keep], r_idx[keep]
            out_k.append(np.full(len(li), key, np.int64))
            out_l.append(lid[li])
            out_r.append(rid[ri])
            out_s.append(np.maximum(ls[li], rs[ri]))
            out_e.append(np.minimum(le[li], re_[ri]))
        if not out_l:
            return empty
        return pa.table(
            {
                "key": pa.array(np.concatenate(out_k), pa.int64()),
                "l_id": pa.array(np.concatenate(out_l), pa.int64()),
                "r_id": pa.array(np.concatenate(out_r), pa.int64()),
                "overlap_start": pa.array(
                    np.concatenate(out_s).astype("datetime64[us]"), pa.timestamp("us")
                ),
                "overlap_end": pa.array(
                    np.concatenate(out_e).astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    return both.repartition(n, keys=["kb"]).map_batches(
        pairs_block, batch_format="pyarrow", batch_size=None
    )


def order_interval_overlaps(sf_dir: str):
    """Overlapping per-customer-bucket activity windows across two
    derived interval sets: left [o_orderdate, +k%10 d] vs right
    [o_orderdate+3 d, +3+(k%7) d], keyed by o_custkey % 200
    (interval_overlap_join)."""
    import numpy as np

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def to_iv(shift_days: int, span_mod: int, extra: int):
        def f(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            s = (
                b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
                + np.timedelta64(shift_days, "D").astype("timedelta64[us]")
            )
            e = s + ((k % span_mod + extra) * np.timedelta64(1, "D")).astype(
                "timedelta64[us]"
            )
            return pa.table(
                {
                    "id": pa.array(k, pa.int64()),
                    "key": pa.array(
                        b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
                        % 200,
                        pa.int64(),
                    ),
                    "start": pa.array(s, pa.timestamp("us")),
                    "end": pa.array(e, pa.timestamp("us")),
                }
            )

        return f

    left = ds.map_batches(to_iv(0, 10, 0), batch_format="pyarrow")
    right = ds.map_batches(to_iv(3, 7, 0), batch_format="pyarrow")
    return interval_overlap_join(left, right)


INTERVAL_OVERLAP_SQL = """
WITH L AS (
  SELECT o_orderkey AS id, o_custkey % 200 AS key,
         o_orderdate AS s,
         o_orderdate + (o_orderkey % 10) * INTERVAL 1 DAY AS e
  FROM orders
),
R AS (
  SELECT o_orderkey AS id, o_custkey % 200 AS key,
         o_orderdate + 3 * INTERVAL 1 DAY AS s,
         o_orderdate + (3 + o_orderkey % 7) * INTERVAL 1 DAY AS e
  FROM orders
)
SELECT L.key AS key, L.id AS l_id, R.id AS r_id,
       GREATEST(L.s, R.s) AS overlap_start,
       LEAST(L.e, R.e) AS overlap_end
FROM L JOIN R ON L.key = R.key AND L.s <= R.e AND R.s <= L.e
"""
