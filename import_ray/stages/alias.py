"""Entity alias-table mining: surface forms per resolved entity.

The reference resolves names → dcids through its recon/ngram machinery
(ExternalIdResolver, NgramMatcher — SURVEY §2.5/2.6); this stage mines
the INVERSE artifact from the transcripts themselves: every textual
mention ``prop:val (Surface Name)`` contributes (entity dcid, alias)
evidence, aggregated to an alias table — the input a name-resolution
index is built FROM at the next refresh.

Scale shape: the regex pass runs ONCE per block over the concatenated
block text (match offsets map back to rows via searchsorted), so the
Python loop is over MATCHES, not rows; per-block partial counts
combine before ONE keyed exchange on an 8-byte (entity, alias) hash.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from import_ray.core.context import data_nparts, ensure_hash_shuffle
from import_ray.stages.extract import place_dcid

_ALIAS_RE = re.compile(
    r"(geoId|isoCode|nutsCode|wikidataId):([A-Za-z0-9\-]+)\s+\(([^)]{1,80})\)"
)
_SEP = "\x1e"


def _block_pairs(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All (entity dcid, alias) mention pairs in a block: one regex
    pass over the join-concatenated text."""
    if not len(texts):
        return np.array([], object), np.array([], object)
    joined = _SEP.join(map(str, texts))
    ents, aliases = [], []
    for m in _ALIAS_RE.finditer(joined):
        prop, val, name = m.group(1), m.group(2), m.group(3)
        if _SEP in name:  # a paren spanning two rows is not a mention
            continue
        ents.append(place_dcid(prop, val))
        aliases.append(name)
    return np.asarray(ents, object), np.asarray(aliases, object)


def alias_table(transcripts_path: str | list[str], text_col: str = "text"):
    """Dataset of (entity_id, alias, n_mentions) over a transcripts
    parquet path — grouped mention counts of every ``prop:val (Name)``
    surface-form pairing."""
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    ds = ray.data.read_parquet(transcripts_path, columns=[text_col]).map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )
    n = data_nparts(ds)

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().to_numpy(dtype=object)
        ents, aliases = _block_pairs(texts)
        empty = pa.table(
            {
                "kh": pa.array([], pa.int64()),
                "entity_id": pa.array([], pa.large_string()),
                "alias": pa.array([], pa.large_string()),
                "n_mentions": pa.array([], pa.int64()),
            }
        )
        if not len(ents):
            return empty
        df = (
            pd.DataFrame({"entity_id": ents, "alias": aliases})
            .groupby(["entity_id", "alias"], sort=False)
            .size()
            .reset_index(name="n_mentions")
        )
        key = (df["entity_id"] + _SEP + df["alias"]).to_numpy(dtype=object)
        return pa.table(
            {
                "kh": pa.array(pd.util.hash_array(key).view(np.int64), pa.int64()),
                "entity_id": pa.array(
                    df["entity_id"].to_numpy(dtype=object), pa.large_string()
                ),
                "alias": pa.array(df["alias"].to_numpy(dtype=object), pa.large_string()),
                "n_mentions": pa.array(
                    df["n_mentions"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    def fold(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "entity_id": pa.array([], pa.large_string()),
                "alias": pa.array([], pa.large_string()),
                "n_mentions": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0 or batch.num_columns == 0:
            return empty
        df = (
            batch.select(["entity_id", "alias", "n_mentions"])
            .to_pandas()
            .groupby(["entity_id", "alias"], sort=False, as_index=False)["n_mentions"]
            .sum()
        )
        return pa.table(
            {
                "entity_id": pa.array(
                    df["entity_id"].to_numpy(dtype=object), pa.large_string()
                ),
                "alias": pa.array(df["alias"].to_numpy(dtype=object), pa.large_string()),
                "n_mentions": pa.array(
                    df["n_mentions"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    ensure_hash_shuffle(ds)
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .repartition(n, keys=["kh"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )


class _MentionLinker:
    """Actor-pool stage: gazetteer (alias → winning entity) fetched
    node-locally ONCE per actor; the alias alternation regex compiles
    in ``__init__``. Per batch: one finditer pass over the
    concatenated block text — the Python loop is over MATCHES, not
    rows. At open-vocabulary gazetteer scale swap the alternation for
    an Aho-Corasick automaton; the broadcast + per-actor-build shape
    is unchanged."""

    def __init__(self, refs):
        import ray

        aliases_ref, entities_ref = refs
        self.aliases = ray.get(aliases_ref)
        self.entities = ray.get(entities_ref)
        # longest-first so no alias shadows a longer one sharing its prefix
        order = sorted(
            range(len(self.aliases)), key=lambda i: -len(self.aliases[i])
        )
        self.rank = {self.aliases[i]: i for i in order}
        self.pattern = re.compile(
            "|".join(re.escape(self.aliases[i]) for i in order) or r"(?!x)x"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pandas().to_numpy(dtype=object)
        empty = pa.table(
            {
                "alias": pa.array([], pa.large_string()),
                "entity_id": pa.array([], pa.large_string()),
                "n_links": pa.array([], pa.int64()),
            }
        )
        if not len(texts):
            return empty
        joined = _SEP.join(map(str, texts))
        counts: dict[str, int] = {}
        for m in self.pattern.finditer(joined):
            a = m.group(0)
            counts[a] = counts.get(a, 0) + 1
        if not counts:
            return empty
        al = np.asarray(list(counts.keys()), object)
        return pa.table(
            {
                "alias": pa.array(al, pa.large_string()),
                "entity_id": pa.array(
                    np.asarray(
                        [self.entities[self.rank[a]] for a in al], object
                    ),
                    pa.large_string(),
                ),
                "n_links": pa.array(
                    np.asarray(list(counts.values()), np.int64), pa.int64()
                ),
            }
        )


def link_mentions(transcripts_path: str | list[str], alias_ds, text_col: str = "text"):
    """Dictionary-based entity linking with prior disambiguation: each
    alias resolves to its argmax-prior entity (``n_mentions`` DESC,
    ``entity_id`` ASC from the mined alias table), then every textual
    occurrence of an alias in the corpus links to that entity —
    grouped to (alias, entity_id, n_links).

    The reference's name→dcid resolution (NgramMatcher,
    ExternalIdResolver — SURVEY §2.5/2.6) resolves the IMPORT batch's
    own nodes; this stage applies the mined gazetteer back onto free
    text, the standard KG-construction mention-linking pass.

    Scale shape: the winner election is ONE alias-keyed exchange +
    block argmax (the alias table is gazetteer-scale); winners
    broadcast via ``ray.put`` ONCE and are fetched node-locally per
    actor; the corpus streams through the actor pool and only
    gazetteer-sized partial counts hit the final keyed exchange."""
    import ray
    import ray.data

    from import_ray.core.context import configure_data_context, npartitions

    configure_data_context()
    n = npartitions()

    def block_argmax(batch: pa.Table) -> pa.Table:
        df = batch.select(["entity_id", "alias", "n_mentions"]).to_pandas()
        df = df.sort_values(
            ["alias", "n_mentions", "entity_id"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates(["alias"], keep="first")
        return pa.Table.from_pandas(
            df[["alias", "entity_id"]], preserve_index=False
        ).replace_schema_metadata(None)

    ensure_hash_shuffle(alias_ds)
    winners = (
        alias_ds.repartition(n, keys=["alias"])
        .map_batches(block_argmax, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    aliases = winners["alias"].to_numpy(dtype=object)
    entities = winners["entity_id"].to_numpy(dtype=object)
    refs = (ray.put(aliases), ray.put(entities))

    ds = ray.data.read_parquet(transcripts_path, columns=[text_col]).map_batches(
        lambda b: b.rename_columns(["text"]), batch_format="pyarrow"
    )
    ensure_hash_shuffle(ds)
    partials = ds.map_batches(
        _MentionLinker,
        fn_constructor_args=(refs,),
        batch_format="pyarrow",
        concurrency=(1, n),
    )

    def fold(batch: pa.Table) -> pa.Table:
        # schema-less empty blocks (RefBundle "new schema: ." warnings)
        # must not reach the pandas groupby — same guard as alias_table
        if len(batch) == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "alias": pa.array([], pa.large_string()),
                    "entity_id": pa.array([], pa.large_string()),
                    "n_links": pa.array([], pa.int64()),
                }
            )
        df = (
            batch.to_pandas()
            .groupby(["alias", "entity_id"], sort=False, as_index=False)["n_links"]
            .sum()
        )
        df["n_links"] = df["n_links"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    return partials.repartition(min(n, 4), keys=["alias"]).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )
