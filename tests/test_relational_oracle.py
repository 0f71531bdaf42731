"""Oracle-compare tests for the round-3 relational queries.

Mirrors the driver's correctness gate (tools/check_correctness.py):
run the Ray pipeline and its DuckDB oracle SQL on the same sf dir,
compare row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

NEW_QUERIES = [
    "q6_discount_revenue",
    "q4_order_priority",
    "q12_priority_by_returnflag",
    "top_orders_per_priority",
    "purchase_click_window",
    "events_sliding_counts",
    "price_percentiles_by_flag",
    "distinct_users_by_type",
    "lineitem_rollup",
    "repeat_customers_1995_1996",
    "q3_top_orders",
    "sessionize_events",
    "pivot_user_event_counts",
    "top_tokens_docs",
    "corpus_clean_exact",
    "customer_order_gaps",
    "pii_redact_planted",
    "hash_sample_docs",
    "kmeans_planted_purity",
    "doc_rarity_stats",
    "chunk_docs",
    "bloom_semi_orders",
    "decontam_planted",
    "oov_stats_docs",
    "bigram_repetition_docs",
    "cross_dup_docs",
    "dup_span_docs",
    "stratified_sample_docs",
    "mixture_sample_docs",
    "sampled_percentiles_orders",
    "q13_customer_distribution",
    "q18_large_orders",
    "q17_small_quantity_revenue",
    "top_supplier_per_nation",
    "q22_rich_inactive_customers",
    "q14_promo_revenue",
    "q16_part_supplier_counts",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q21_sole_return_suppliers",
    "q2_min_cost_supplier",
    "q9_profit_by_nation_year",
    "q11_important_parts",
    "q20_dominant_part_suppliers",
    "inverted_index_docs",
    "token_pairs_docs",
    "weighted_sample_orders",
    "gopher_quality_docs",
    "segment_dedup_docs",
    "badword_filter_docs",
    "events_props_stats",
    "ntile_customers",
    "first_last_touch",
    "top_event_per_user",
    "topn_orders_per_customer",
    "profile_orders",
    "top_terms_per_doc",
    "funnel_events",
    "cohort_retention",
    "event_transitions",
    "orders_price_histogram",
    "corr_price_quantity",
    "events_gapfill_daily",
    "events_moving_7d_sum",
    "user_activity_trend",
    "quantity_moments_by_flag",
    "order_part_jaccard",
    "percent_rank_orders",
    "events_trailing_interval",
    "editdist_pairs_planted",
    "fd_profile_orders",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


@pytest.fixture(scope="module")
def oracle_con(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_query_matches_oracle(ray_session, sf_small, oracle_con, name):
    import __ray_entry__ as entry

    ray_df = _canon(_to_pandas(entry.queries()[name](sf_small)))
    sql_df = _canon(oracle_con.sql(entry.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    pd.testing.assert_frame_equal(
        ray_df, sql_df, check_dtype=False, check_exact=True
    )


def test_q2_join_fallback_matches_broadcast(ray_session, sf_small):
    """broadcast_limit=0 forces the distributed-join plan; results must
    equal the default broadcast plan exactly."""
    from import_ray.pipelines.relational import q2_min_cost_supplier

    a = _canon(_to_pandas(q2_min_cost_supplier(sf_small)))
    b = _canon(_to_pandas(q2_min_cost_supplier(sf_small, broadcast_limit=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_grouping_sets_match_oracle(ray_session, sf_small, oracle_con):
    import __ray_entry__ as entry

    for name in ("cube_lineitem",):
        ray_df = _canon(_to_pandas(entry.queries()[name](sf_small)))
        sql_df = _canon(oracle_con.sql(entry.oracle_sql()[name]).df())
        pd.testing.assert_frame_equal(
            ray_df, sql_df, check_dtype=False, check_exact=True
        )


def test_q9_join_fallback_matches_broadcast(ray_session, sf_small):
    from import_ray.pipelines.relational import q9_profit_by_nation_year

    a = _canon(_to_pandas(q9_profit_by_nation_year(sf_small)))
    b = _canon(_to_pandas(q9_profit_by_nation_year(sf_small, broadcast_limit=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_skyline_matches_oracle(ray_session, sf_small, oracle_con):
    import __ray_entry__ as entry

    ray_df = _canon(_to_pandas(entry.queries()["skyline_orders"](sf_small)))
    sql_df = _canon(oracle_con.sql(entry.oracle_sql()["skyline_orders"]).df())
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=True)


def test_skyline_mask_brute_force_parity():
    import numpy as np

    from import_ray.pipelines.relational import _skyline2d_mask

    rng = np.random.RandomState(9)
    p = rng.randint(0, 20, 400).astype(np.int64)  # heavy ties incl. exact dups
    d = rng.randint(0, 20, 400).astype(np.int64)
    got = _skyline2d_mask(p, d)
    dom = (
        (p[None, :] >= p[:, None])
        & (d[None, :] >= d[:, None])
        & ((p[None, :] > p[:, None]) | (d[None, :] > d[:, None]))
    )
    exp = ~dom.any(axis=1)
    assert (got == exp).all()


def test_q20_join_fallback_matches_broadcast(ray_session, sf_small):
    from import_ray.pipelines.relational import q20_dominant_part_suppliers

    a = _canon(_to_pandas(q20_dominant_part_suppliers(sf_small)))
    b = _canon(_to_pandas(q20_dominant_part_suppliers(sf_small, broadcast_limit=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_q11_join_fallback_matches_broadcast(ray_session, sf_small):
    from import_ray.pipelines.relational import q11_important_parts

    a = _canon(_to_pandas(q11_important_parts(sf_small)))
    b = _canon(_to_pandas(q11_important_parts(sf_small, broadcast_limit=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_q21_join_fallback_matches_broadcast(ray_session, sf_small):
    from import_ray.pipelines.relational import q21_sole_return_suppliers

    a = _canon(_to_pandas(q21_sole_return_suppliers(sf_small)))
    b = _canon(_to_pandas(q21_sole_return_suppliers(sf_small, broadcast_limit=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_trailing_interval_peer_rows(ray_session, tmp_path):
    """RANGE frame must include peer rows (equal ts) AFTER the current
    row, and the boundary ts-1h row inclusively — planted ties exercise
    both."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from import_ray.pipelines.relational import (
        TRAILING_INTERVAL_SQL,
        events_trailing_interval,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600, "s")
    ts = [
        base, base, base,                # 3 peers at t0
        base + h,                        # exactly 1h later (inclusive bound)
        base + h + np.timedelta64(1, "us"),  # just outside for t0 peers
        base + 3 * h,
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7] * 6, pa.int64()),
            "event_type": pa.array(["click"] * 6),
            "value": pa.array([1.11, 2.22, 3.33, 4.44, 5.55, 6.66]),
            "props": pa.array(["{}"] * 6),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")

    got = _canon(events_trailing_interval(str(d)).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = _canon(con.sql(TRAILING_INTERVAL_SQL).df())
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # the three t0 peers each see all three peers
    assert (
        got.set_index("event_id").loc[[0, 1, 2], "n_window"] == 3
    ).all()
