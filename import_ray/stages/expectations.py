"""Declarative table-quality expectations over any Dataset.

The reference validates MCF graphs (`McfChecker`, `StatChecker`); a
general data engine also needs table-level contracts on arbitrary
columns — the great-expectations / dbt-test shape. Each expectation
is a dict:

    {"type": "not_null", "col": c}
    {"type": "unique",   "col": c}          # dup rows among non-nulls
    {"type": "range",    "col": c, "min": x, "max": y}   # closed bounds,
                                            # either side optional; nulls skip
    {"type": "regex",    "col": c, "pattern": p}         # full match
    {"type": "in_set",   "col": c, "values": [...]}      # nulls violate
    {"type": "ref",      "col": c, "ref_ds": d, "ref_col": rc}
                                            # foreign key: non-null values
                                            # absent from ref_ds[rc]; nulls skip

Output: ONE row per expectation — (expectation, col, violations,
n_rows, passed) — exactly reproducible in SQL (driver-oracle
checked). ``unique`` counts via 64-bit value hashes (collision odds
~n²/2⁻⁶⁴ — the same stance as the repo's other hash keys).

Scale shape: every per-row check runs vectorized inside ONE
``map_batches`` pass emitting a fixed #expectations partial rows per
batch, folded by a tiny keyed sum — no shuffle touches data rows.
``unique`` is the one keyed operator: non-null values hash to 8-byte
keys, per-batch (hash, count) partials move through one exchange
bounded by distinct values per batch, and Σ(count−1) over duplicated
hashes equals non-null − distinct without ever collecting values.
``ref`` tags both sides' hashed keys and counts left rows whose hash
never appears with the ref tag — one 8-byte exchange, neither table's
values collected (a 64-bit hash collision masks a violation with odds
~n²/2⁻⁶⁴ — the shared stance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_BATCH_TYPES = ("not_null", "range", "regex", "in_set")


def _violations_in_batch(batch: pa.Table, exp: dict) -> int:
    col = batch[exp["col"]]
    t = exp["type"]
    if t == "not_null":
        return int(pc.sum(pc.is_null(col)).as_py() or 0)
    if t == "range":
        ok = pa.array(np.ones(len(batch), bool))
        if exp.get("min") is not None:
            ok = pc.and_(ok, pc.greater_equal(col, pa.scalar(exp["min"])))
        if exp.get("max") is not None:
            ok = pc.and_(ok, pc.less_equal(col, pa.scalar(exp["max"])))
        # nulls skip range checks (SQL comparison semantics)
        bad = pc.and_(pc.is_valid(col), pc.invert(pc.fill_null(ok, True)))
        return int(pc.sum(bad).as_py() or 0)
    if t == "regex":
        m = pc.match_substring_regex(col, f"^(?:{exp['pattern']})$")
        bad = pc.and_(pc.is_valid(col), pc.invert(pc.fill_null(m, True)))
        return int(pc.sum(bad).as_py() or 0)
    if t == "in_set":
        member = pc.is_in(col, value_set=pa.array(exp["values"]))
        bad = pc.invert(pc.fill_null(member, False))  # nulls violate
        return int(pc.sum(bad).as_py() or 0)
    raise ValueError(f"unknown expectation type: {t!r}")


def _exp_label(exp: dict) -> str:
    return exp["type"]


def check_expectations(ds, expectations: list[dict]):
    """Evaluate ``expectations`` over ``ds`` → Dataset of one result
    row per expectation, ordered by (expectation, col)."""
    from ray.data.aggregate import Sum

    from import_ray.core.context import (
        configure_data_context,
        ensure_hash_shuffle,
        join_safe,
    )

    configure_data_context()
    ensure_hash_shuffle(ds)
    batch_exps = [e for e in expectations if e["type"] in _BATCH_TYPES]
    uniq_exps = [e for e in expectations if e["type"] == "unique"]
    ref_exps = [e for e in expectations if e["type"] == "ref"]
    unknown = [
        e
        for e in expectations
        if e["type"] not in _BATCH_TYPES + ("unique", "ref")
    ]
    if unknown:
        raise ValueError(f"unknown expectation types: {unknown}")

    def partial(batch: pa.Table) -> pa.Table:
        n = len(batch)
        rows = {
            "eid": list(range(len(batch_exps))) + [-1],
            "violations": [_violations_in_batch(batch, e) for e in batch_exps]
            + [0],
            "rows": [n] * (len(batch_exps) + 1),
        }
        # eid -1 carries the total row count even when batch_exps is empty
        return pa.table(
            {
                "eid": pa.array(rows["eid"], pa.int64()),
                "violations": pa.array(rows["violations"], pa.int64()),
                "rows": pa.array(rows["rows"], pa.int64()),
            }
        )

    folded = (
        join_safe(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby("eid", num_partitions=2)
        .aggregate(
            Sum("violations", alias_name="violations"),
            Sum("rows", alias_name="rows"),
        )
        .to_pandas()
    )
    total_rows = int(folded.loc[folded["eid"] == -1, "rows"].sum())
    results = []
    for i, e in enumerate(batch_exps):
        sub = folded[folded["eid"] == i]
        v = int(sub["violations"].sum())
        results.append((_exp_label(e), e["col"], v, total_rows))

    for e in uniq_exps:
        col = e["col"]

        def hash_partial(batch: pa.Table, c=col) -> pa.Table:
            acol = batch[c]
            if isinstance(acol, pa.ChunkedArray):
                acol = acol.combine_chunks()
            # drop nulls in ARROW: pandas converts int64-with-nulls to
            # float64, so the same value would hash differently in
            # batches with and without nulls
            s = pc.drop_null(acol).to_pandas()
            h = pd.util.hash_array(s.to_numpy(dtype=object)).astype(np.uint64)
            hv, cnt = np.unique(h, return_counts=True)
            return pa.table(
                {
                    "h": pa.array(hv.view(np.int64), pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        def extra_rows(batch: pa.Table) -> pa.Table:
            if len(batch) == 0 or batch.num_columns == 0:
                return pa.table({"extra": pa.array([], pa.int64())})
            df = batch.to_pandas().groupby("h", sort=False)["n"].sum()
            return pa.table(
                {"extra": pa.array([int((df - 1).sum())], pa.int64())}
            )

        parts = (
            join_safe(ds.map_batches(hash_partial, batch_format="pyarrow"))
            .repartition(4, keys=["h"])
            .map_batches(extra_rows, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        results.append(("unique", col, int(parts["extra"].sum()), total_rows))

    for e in ref_exps:
        col, ref_ds, ref_col = e["col"], e["ref_ds"], e["ref_col"]
        ensure_hash_shuffle(ref_ds)

        def side_partial(c, is_ref):
            def fn(batch: pa.Table) -> pa.Table:
                acol = batch[c]
                if isinstance(acol, pa.ChunkedArray):
                    acol = acol.combine_chunks()
                s = pc.drop_null(acol).to_pandas()
                h = pd.util.hash_array(
                    s.to_numpy(dtype=object)
                ).astype(np.uint64)
                if is_ref:
                    hv = np.unique(h)
                    cnt = np.zeros(len(hv), np.int64)
                else:
                    hv, cnt = np.unique(h, return_counts=True)
                return pa.table(
                    {
                        "h": pa.array(hv.view(np.int64), pa.int64()),
                        "n": pa.array(cnt.astype(np.int64), pa.int64()),
                        "is_ref": pa.array(
                            np.full(len(hv), int(is_ref), np.int64), pa.int64()
                        ),
                    }
                )

            return fn

        def missing_rows(batch: pa.Table) -> pa.Table:
            if len(batch) == 0 or batch.num_columns == 0:
                return pa.table({"missing": pa.array([], pa.int64())})
            df = batch.to_pandas().groupby("h", sort=False).agg(
                n=("n", "sum"), present=("is_ref", "max")
            )
            return pa.table(
                {
                    "missing": pa.array(
                        [int(df.loc[df["present"] == 0, "n"].sum())], pa.int64()
                    )
                }
            )

        tagged = join_safe(
            ds.map_batches(side_partial(col, False), batch_format="pyarrow")
        ).union(
            join_safe(
                ref_ds.map_batches(
                    side_partial(ref_col, True), batch_format="pyarrow"
                )
            )
        )
        parts = (
            tagged.repartition(4, keys=["h"])
            .map_batches(missing_rows, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        results.append(("ref", col, int(parts["missing"].sum()), total_rows))

    results.sort(key=lambda r: (r[0], r[1]))
    out = pd.DataFrame(
        results, columns=["expectation", "col", "violations", "n_rows"]
    )
    out["passed"] = out["violations"] == 0
    return out
