"""Window/rank/grouping-set pipelines.

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
