"""Global dense-id assignment for strings, and consistent
pseudonymization built on it.

``dense_string_ids`` is the zipWithIndex primitive Ray Data lacks:
assign every distinct string a contiguous 0-based id equal to its
LEXICAL dense rank (SQL ``DENSE_RANK() OVER (ORDER BY value) - 1``) —
the id layout a KG assigns to interned dcids, dictionary-encodes
predicates with, or feeds an embedding table. No global sort: the
same histogram-offset shape as the engine's exact NTILE
(relational.ntile_customers_by_balance):

1. global DISTINCT (one keyed exchange on an 8-byte value hash);
2. a driver-side PREFIX histogram (counts per ``prefix_len``-char
   prefix — bounded by the distinct-prefix count, never by rows) gives
   every prefix its global rank offset;
3. one keyed exchange on the prefix co-locates each prefix's values;
   the block kernel sorts locally and adds the broadcast offset.

Prefix skew (every value sharing one prefix) degrades to a single
partition — raise ``prefix_len`` for adversarial key sets.

``pseudonymize_mentions`` applies the table: every ``prop:val`` entity
mention in transcript text is rewritten to ``ENT<dense id>`` —
CONSISTENTLY across the whole corpus (same entity, same pseudonym),
which masking-style PII redaction (stages/scrub) can't promise.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from import_ray.core.context import data_nparts, ensure_hash_shuffle, join_safe
from import_ray.stages.extract import place_dcid

_MENTION_RE = re.compile(r"(geoId|isoCode|nutsCode|wikidataId):([A-Za-z0-9\-]+)")


def dense_string_ids(ds, col: str = "value", prefix_len: int = 2):
    """Dataset of (value, id): id = lexical dense rank (0-based) over
    the global distinct values of ``ds[col]``."""
    import ray

    ensure_hash_shuffle(ds)
    n = data_nparts(ds)

    def distinct_rows(b: pa.Table) -> pa.Table:
        vals = np.unique(
            b[col].to_pandas().dropna().to_numpy(dtype=object).astype(str)
        ).astype(object)
        h = pd.util.hash_array(vals.astype(object)).view(np.int64)
        return pa.table(
            {
                "vh": pa.array(h, pa.int64()),
                "value": pa.array(vals, pa.large_string()),
            }
        )

    def block_distinct(b: pa.Table) -> pa.Table:
        if len(b) == 0 or b.num_columns == 0:
            return pa.table(
                {
                    "vh": pa.array([], pa.int64()),
                    "value": pa.array([], pa.large_string()),
                }
            )
        vals = np.unique(b["value"].to_pandas().to_numpy(dtype=object).astype(str)).astype(object)
        h = pd.util.hash_array(vals.astype(object)).view(np.int64)
        return pa.table(
            {
                "vh": pa.array(h, pa.int64()),
                "value": pa.array(vals, pa.large_string()),
            }
        )

    distinct = (
        ds.map_batches(distinct_rows, batch_format="pyarrow")
        .repartition(n, keys=["vh"])
        .map_batches(block_distinct, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    def prefix_of(vals: np.ndarray) -> np.ndarray:
        return np.asarray([v[:prefix_len] for v in vals], object)

    def hist(b: pa.Table) -> pa.Table:
        vals = b["value"].to_pandas().to_numpy(dtype=object)
        pfx, cnt = np.unique(prefix_of(vals), return_counts=True)
        pfx = pfx.astype(object)
        return pa.table(
            {
                "prefix": pa.array(pfx, pa.large_string()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    h = (
        distinct.map_batches(hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("prefix", sort=True)["cnt"]
        .sum()
    )
    prefixes = h.index.to_numpy(dtype=object)
    offsets = np.concatenate([[0], h.to_numpy().cumsum()])[:-1]
    offset_ref = ray.put(dict(zip(prefixes, offsets.astype(int))))

    def with_prefix(b: pa.Table) -> pa.Table:
        vals = b["value"].to_pandas().to_numpy(dtype=object)
        pfx = prefix_of(vals)
        ph = pd.util.hash_array(pfx).view(np.int64)
        return pa.table(
            {
                "ph": pa.array(ph, pa.int64()),
                "prefix": pa.array(pfx, pa.large_string()),
                "value": pa.array(vals, pa.large_string()),
            }
        )

    def rank_block(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "value": pa.array([], pa.large_string()),
                "id": pa.array([], pa.int64()),
            }
        )
        if len(b) == 0 or b.num_columns == 0:
            return empty
        off = ray.get(offset_ref)
        df = b.to_pandas().sort_values(["prefix", "value"], kind="mergesort")
        pfx = df["prefix"].to_numpy(dtype=object)
        new = np.r_[True, pfx[1:] != pfx[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(df)))
        local = np.arange(len(df)) - np.repeat(starts, counts)
        base = np.repeat(
            np.asarray([off[p] for p in pfx[starts]], np.int64), counts
        )
        return pa.table(
            {
                "value": pa.array(df["value"].to_numpy(dtype=object), pa.large_string()),
                "id": pa.array(base + local, pa.int64()),
            }
        )

    return (
        distinct.map_batches(with_prefix, batch_format="pyarrow")
        .repartition(n, keys=["ph"])
        .map_batches(rank_block, batch_format="pyarrow", batch_size=None)
    )


def pseudonymize_mentions(transcripts_path: str | list[str]):
    """Rewrite every ``prop:val`` entity mention in transcript text to
    ``ENT<id>`` where id is the dense lexical rank of the entity's
    dcid over the corpus — consistent pseudonymization. Returns
    (conv_id, turn_idx, text). The id table is built distributed
    (dense_string_ids) and broadcast once via ``ray.put``; the rewrite
    pass is one streaming map with a compiled regex."""
    import ray
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    ds = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "text"]
    ).map_batches(lambda b: b.replace_schema_metadata(None), batch_format="pyarrow")

    def mention_rows(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pandas().to_numpy(dtype=object)
        ents = []
        for m in _MENTION_RE.finditer("\x1e".join(map(str, texts))):
            ents.append(place_dcid(m.group(1), m.group(2)))
        return pa.table({"value": pa.array(np.unique(np.asarray(ents, object)).astype(object), pa.large_string())})

    # the id table is entity-vocabulary-scale (the same bound as the
    # engine's broadcast resolution caches), never corpus-scale
    idf = dense_string_ids(ds.map_batches(mention_rows, batch_format="pyarrow")).to_pandas()
    table_ref = ray.put(dict(zip(idf["value"], idf["id"].astype(int))))

    def rewrite(b: pa.Table) -> pa.Table:
        t = ray.get(table_ref)

        def sub(m):
            return f"ENT{t[place_dcid(m.group(1), m.group(2))]}"

        texts = b["text"].to_pandas().to_numpy(dtype=object)
        out = np.asarray([_MENTION_RE.sub(sub, str(x)) for x in texts], object)
        return pa.table(
            {
                "conv_id": pc.cast(b["conv_id"], pa.string()),
                "turn_idx": pc.cast(b["turn_idx"], pa.int64()),
                "text": pa.array(out, pa.large_string()),
            }
        )

    return ds.map_batches(rewrite, batch_format="pyarrow")
