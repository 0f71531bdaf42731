"""Event-stream pipelines: sessions, funnels, time series.

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




# --- events: date truncation + grouped counts (events_importer,
#     simple/stats/events_importer.py:152-196,336-343) ------------------------


def events_daily_counts(sf_dir: str, ds=None):
    """``ds`` overrides the parquet read (see q6_discount_revenue)."""
    if ds is None:
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
