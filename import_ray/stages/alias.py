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


# gazetteers above this size switch from the alternation regex to the
# hashed token-n-gram matcher (regex alternation compile/scan degrades
# superlinearly with pattern count; the n-gram matcher is O(tokens ×
# n_distinct_alias_lengths) regardless of gazetteer size)
REGEX_GAZETTEER_MAX = 512

# independent second hash for 128-bit n-gram identity (repo-wide
# convention: 128-bit content keys need no exact-verify pass)
_POLY_B = np.uint64(0x9E3779B97F4A7C15)
_MIX_C = np.uint64(0xC2B2AE3D27D4EB4F)


def _alnum_tokens_flat(texts: np.ndarray):
    """Tokenize a block of texts into flat alphanumeric runs with row
    ids — fully vectorized (pyarrow regex split + dictionary-encoded
    hashing; the unique-token trick from neardup._split_flat)."""
    import pyarrow.compute as pc

    arr = pa.array(texts, pa.large_string())
    lists = pc.split_pattern_regex(arr, pattern="[^A-Za-z0-9]+")
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return (
            np.zeros(0, np.uint64),
            np.zeros(0, np.uint64),
            np.zeros(0, np.int64),
        )
    mask = pc.not_equal(flat, "")
    row_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    keep = mask.to_numpy(zero_copy_only=False)
    flat = flat.filter(mask)
    row_of = row_of[keep]
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False)
    uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
    h1u = pd.util.hash_array(uniq).astype(np.uint64)
    h2u = (h1u ^ _POLY_B) * _MIX_C
    return h1u[codes], h2u[codes], row_of


def _ngram_hashes(h: np.ndarray, row_of: np.ndarray, L: int):
    """Rolling length-``L`` polynomial hashes over a flat token-hash
    array; windows crossing a row boundary are masked out. Returns
    (window_hashes, valid_mask) aligned to window start positions."""
    n = len(h)
    if n < L:
        return np.zeros(0, np.uint64), np.zeros(0, bool)
    w = h[: n - L + 1].copy()
    for k in range(1, L):
        w = w * _POLY_B + h[k : n - L + 1 + k]
    valid = row_of[: n - L + 1] == row_of[L - 1 :]
    return w, valid


def _probe_sorted_table(g1, g2, max_run, w1, w2, valid):
    """Probe a (g1, g2)-lexsorted hash table with query windows
    (w1, w2): returns the table position of each window's match or -1.

    searchsorted 'left' lands on the FIRST table entry of a g1 run;
    when distinct aliases collide on the 64-bit g1 (run length >1) the
    true match can sit deeper in the run, so the tail is probed —
    bounded by max_run, which is 1 for any realistic gazetteer."""
    pos = np.searchsorted(g1, w1)
    pos_c = np.minimum(pos, len(g1) - 1)
    match_pos = np.where(
        valid & (g1[pos_c] == w1) & (g2[pos_c] == w2), pos_c, -1
    )
    if max_run > 1:
        pend = valid & (g1[pos_c] == w1) & (match_pos < 0)
        p = pos_c + 1
        for _ in range(max_run - 1):
            if not pend.any():
                break
            in_range = pend & (p < len(g1))
            pc = np.minimum(p, len(g1) - 1)
            same = in_range & (g1[pc] == w1)
            newhit = same & (g2[pc] == w2)
            match_pos[newhit] = pc[newhit]
            pend = same & ~newhit
            p = p + 1
    return match_pos


class _HashedGazetteerLinker:
    """Actor-pool open-vocabulary linker: the Aho-Corasick-shaped swap
    for large gazetteers. ``__init__`` (once per actor) tokenizes every
    alias into alphanumeric runs and builds per-length sorted 128-bit
    n-gram tables; ``__call__`` computes rolling token-n-gram hashes
    over the whole batch (one vectorized pass per distinct alias
    length) and probes by binary search — O(tokens × n_lengths),
    independent of gazetteer size, no per-character automaton stepping
    and no Python loop over rows or matches.

    Semantics: counts every alias occurrence whose alphanumeric token
    sequence appears contiguously in the text's token stream (word-
    boundary aligned, overlaps and nested aliases all counted) — the
    multi-pattern-matching semantics of a classic Aho-Corasick scan.
    The small-gazetteer regex path counts leftmost-longest
    non-overlapping character matches instead; on gazetteer/corpus
    pairs without nested or substring aliases the two agree
    (pytest-gated byte-equal on a 10k-alias gazetteer)."""

    def __init__(self, refs):
        import re as _re

        import ray

        aliases_ref, entities_ref = refs
        self.aliases = ray.get(aliases_ref)
        self.entities = ray.get(entities_ref)
        tok_re = _re.compile(r"[A-Za-z0-9]+")
        by_len: dict[int, list[tuple[int, int, int]]] = {}
        for i, alias in enumerate(self.aliases):
            toks = tok_re.findall(str(alias))
            if not toks:
                continue
            u = np.asarray(toks, dtype=object)
            t1 = pd.util.hash_array(u).astype(np.uint64)
            t2 = (t1 ^ _POLY_B) * _MIX_C
            a1 = t1[0]
            a2 = t2[0]
            for k in range(1, len(toks)):
                a1 = a1 * _POLY_B + t1[k]
                a2 = a2 * _POLY_B + t2[k]
            by_len.setdefault(len(toks), []).append((int(a1), int(a2), i))
        self.tables = {}
        for L, rows in by_len.items():
            g1 = np.array([r[0] for r in rows], np.uint64)
            g2 = np.array([r[1] for r in rows], np.uint64)
            gi = np.array([r[2] for r in rows], np.int64)
            o = np.lexsort((g2, g1))
            g1s = g1[o]
            # longest run of duplicate g1 values: bounds the tail probe
            # in __call__ when distinct aliases collide on the 64-bit g1
            max_run = 1
            if len(g1s) > 1:
                _, run_counts = np.unique(g1s, return_counts=True)
                max_run = int(run_counts.max())
            self.tables[L] = (g1s, g2[o], gi[o], max_run)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "alias": pa.array([], pa.large_string()),
                "entity_id": pa.array([], pa.large_string()),
                "n_links": pa.array([], pa.int64()),
            }
        )
        texts = batch["text"].to_pandas().to_numpy(dtype=object)
        if not len(texts) or not self.tables:
            return empty
        h1, h2, row_of = _alnum_tokens_flat(texts)
        counts = np.zeros(len(self.aliases), np.int64)
        for L, (g1, g2, gi, max_run) in self.tables.items():
            w1, valid = _ngram_hashes(h1, row_of, L)
            if not len(w1):
                continue
            w2, _ = _ngram_hashes(h2, row_of, L)
            match_pos = _probe_sorted_table(g1, g2, max_run, w1, w2, valid)
            ok = match_pos >= 0
            if ok.any():
                np.add.at(counts, gi[match_pos[ok]], 1)
        found = np.flatnonzero(counts)
        if not len(found):
            return empty
        return pa.table(
            {
                "alias": pa.array(self.aliases[found], pa.large_string()),
                "entity_id": pa.array(self.entities[found], pa.large_string()),
                "n_links": pa.array(counts[found], pa.int64()),
            }
        )


class _MentionLinker:
    """Actor-pool stage: gazetteer (alias → winning entity) fetched
    node-locally ONCE per actor; the alias alternation regex compiles
    in ``__init__``. Per batch: one finditer pass over the
    concatenated block text — the Python loop is over MATCHES, not
    rows. ``link_mentions`` swaps this for ``_HashedGazetteerLinker``
    past ``REGEX_GAZETTEER_MAX`` aliases; the broadcast +
    per-actor-build shape is unchanged."""

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


def link_mentions(
    transcripts_path: str | list[str],
    alias_ds,
    text_col: str = "text",
    matcher: str = "auto",
):
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
    if matcher == "auto":
        matcher = "regex" if len(aliases) <= REGEX_GAZETTEER_MAX else "ngram"
    linker_cls = {"regex": _MentionLinker, "ngram": _HashedGazetteerLinker}[matcher]
    partials = ds.map_batches(
        linker_cls,
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
