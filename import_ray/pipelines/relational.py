"""Relational operator pipelines over the testdata tables (facade).

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

The implementation lives in thematic submodules (relational_base /
_tpch1 / _tpch2 / _events / _windows / _profiling); this facade
re-exports every public and test-used name so existing imports keep
working.
"""

from __future__ import annotations

from import_ray.pipelines.relational_base import (  # noqa: F401
    _cents, _np, _np_for, _read, _read_pandas,
)
from import_ray.pipelines.relational_tpch1 import (  # noqa: F401
    q1_pricing_summary,
    Q1_SQL,
    q3_top_orders,
    Q3_SQL,
    q5_region_revenue,
    Q5_SQL,
    distinct_mktsegment,
    DISTINCT_SQL,
    filter_project_lineitem,
    FILTER_PROJECT_SQL,
    version_diff_orders,
    VERSION_DIFF_SQL,
    melt_part,
    MELT_PART_SQL,
    customers_without_orders,
    ANTI_JOIN_SQL,
    q6_discount_revenue,
    Q6_SQL,
    q4_order_priority,
    Q4_SQL,
    q12_priority_by_returnflag,
    Q12_SQL,
    q13_customer_distribution,
    Q13_SQL,
    q18_large_orders,
    Q18_SQL,
    q17_small_quantity_revenue,
    Q17_SQL,
    top_supplier_per_nation,
    TOP_SUPPLIER_SQL,
)
from import_ray.pipelines.relational_tpch2 import (  # noqa: F401
    q22_rich_inactive_customers,
    Q22_SQL,
    q14_promo_revenue,
    Q14_SQL,
    q16_part_supplier_counts,
    Q16_SQL,
    q7_volume_shipping,
    Q7_SQL,
    q8_market_share,
    Q8_SQL,
    q10_returned_items,
    Q10_SQL,
    q15_top_supplier,
    Q15_SQL,
    q19_disjunctive_revenue,
    Q19_SQL,
    q21_sole_return_suppliers,
    Q21_SQL,
    _nation_region_arrays,
    q2_min_cost_supplier,
    _q2_join_plan,
    Q2_SQL,
    q9_profit_by_nation_year,
    Q9_SQL,
    q11_important_parts,
    Q11_SQL,
    q20_dominant_part_suppliers,
    Q20_SQL,
)
from import_ray.pipelines.relational_events import (  # noqa: F401
    events_daily_counts,
    EVENTS_DAILY_SQL,
    purchase_last_signup,
    ASOF_JOIN_SQL,
    purchase_click_window,
    RANGE_JOIN_SQL,
    events_sliding_counts,
    SLIDING_SQL,
    sessionize_events,
    SESSIONIZE_SQL,
    _PIVOT_TYPES,
    pivot_user_event_counts,
    PIVOT_SQL,
    events_props_stats,
    EVENTS_PROPS_SQL,
    FUNNEL_STAGES,
    funnel_counts,
    FUNNEL_SQL,
    cohort_retention,
    COHORT_SQL,
    event_transitions,
    TRANSITIONS_SQL,
    _dense_daily_series,
    events_gapfill_daily,
    GAPFILL_SQL,
    events_moving_7d_sum,
    MOVING_7D_SQL,
    user_activity_trend,
    TREND_SQL,
    user_event_paths,
    USER_EVENT_PATHS_SQL,
    user_skew_profile,
    USER_SKEW_SQL,
    events_trailing_interval,
    TRAILING_INTERVAL_SQL,
)
from import_ray.pipelines.relational_windows import (  # noqa: F401
    orders_running_total,
    RUNNING_TOTAL_SQL,
    top_orders_per_priority,
    TOPK_PER_GROUP_SQL,
    _PCTL_BUCKET_BITS,
    price_percentiles_by_flag,
    PERCENTILE_SQL,
    distinct_users_by_type,
    DISTINCT_USERS_SQL,
    lineitem_rollup,
    ROLLUP_SQL,
    repeat_customers_1995_1996,
    INTERSECT_SQL,
    customer_order_gaps,
    ORDER_GAPS_SQL,
    _NTILE_BUCKET_BITS,
    ntile_customers_by_balance,
    NTILE_SQL,
    first_last_touch,
    FIRST_LAST_TOUCH_SQL,
    top_event_per_user,
    TOP_EVENT_PER_USER_SQL,
    topn_orders_per_customer,
    TOPN_ORDERS_SQL,
    _grouping_sets_lineitem,
    cube_lineitem,
    CUBE_SQL,
    _skyline2d_mask,
    skyline_orders,
    SKYLINE_SQL,
)
from import_ray.pipelines.relational_profiling import (  # noqa: F401
    _PROFILE_COLS,
    profile_orders,
    PROFILE_ORDERS_SQL,
    orders_price_histogram,
    HISTOGRAM_SQL,
    corr_price_quantity,
    CORR_SQL,
    quantity_moments_by_flag,
    MOMENTS_SQL,
    order_part_jaccard,
    ORDER_JACCARD_SQL,
    percent_rank_orders,
    PERCENT_RANK_SQL,
    regr_orders_by_priority,
    REGR_BY_PRIORITY_SQL,
    FD_PAIRS,
    fd_profile_orders,
    FD_PROFILE_SQL,
    coalesce_intervals,
    coalesce_order_intervals,
    COALESCE_INTERVALS_SQL,
    interval_overlap_join,
    order_interval_overlaps,
    INTERVAL_OVERLAP_SQL,
)
