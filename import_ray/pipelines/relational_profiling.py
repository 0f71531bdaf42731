"""Data-profiling, statistics and interval pipelines.

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
from import_ray.pipelines.relational_windows import price_percentiles_by_flag
from import_ray.pipelines.relational_events import events_moving_7d_sum




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
