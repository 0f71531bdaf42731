"""N-Triples / N-Quads interchange for the canonical triple schema.

The reference exchanges graphs as MCF text and (via Beam) as proto
shards; the W3C N-Triples / N-Quads line formats are the standard
KG interchange the rest of the ecosystem speaks, so the Ray engine
gets a vectorized serializer + parser over the same canonical
(subject_id, predicate, object_id, object_value, provenance) rows
that `pipelines/kg.build_triples` emits (reference graph writer
analog: pipeline/.../GraphUtils.java node→MCF render; here the
target grammar is the public N-Quads spec instead).

Mapping (bijective, so serialize→parse is lossless):

- ids / predicates ride in `dc:`-scheme IRIs (`<dc:conv/x/t0>`),
  percent-encoded only where the IRI grammar forbids the raw byte;
- entity objects (non-empty ``object_id``) are IRIs, value objects
  are literals with the four canonical ECHAR escapes;
- a NULL ``object_value`` with no object_id keeps its nullness via
  an `""^^<dc:null>` typed-literal marker;
- ``provenance`` is the N-Quads graph label (4th term).

Everything is batch-vectorized: pyarrow.compute string kernels for
the escape/format path, one compiled regex + pandas extract for the
parse path; the rare rows that need percent-encoding fall back to a
Python loop over just those rows.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# IRI grammar (N-Quads spec) forbids control chars, space and <>"{}|^`\
_IRI_UNSAFE = re.compile(r'[\x00-\x20<>"{}|^`\\%]')
_PCT = re.compile(r"%([0-9A-Fa-f]{2})")


def _pct_encode_unsafe(values: pa.Array) -> pa.Array:
    """Percent-encode IRI-forbidden bytes; vectorized check, Python
    fallback only on the (rare) offending rows."""
    arr = pc.cast(values, pa.large_string())
    bad = pc.match_substring_regex(arr, _IRI_UNSAFE.pattern)
    if not pc.any(bad).as_py():
        return arr
    out = arr.to_pandas().to_numpy(dtype=object)
    for i in np.flatnonzero(bad.to_numpy(zero_copy_only=False)):
        out[i] = _IRI_UNSAFE.sub(
            lambda m: "".join(f"%{b:02X}" for b in m.group(0).encode("utf-8")),
            out[i],
        )
    return pa.array(out, pa.large_string())


def _pct_decode(s: pd.Series) -> pd.Series:
    """Reverse of _pct_encode_unsafe; byte-wise so multi-byte UTF-8
    percent sequences reassemble correctly."""
    mask = s.str.contains("%", regex=False)
    if not mask.any():
        return s

    def _dec(v: str) -> str:
        out = bytearray()
        i = 0
        while i < len(v):
            if v[i] == "%" and _PCT.match(v, i):
                out.append(int(v[i + 1 : i + 3], 16))
                i += 3
            else:
                out.extend(v[i].encode("utf-8"))
                i += 1
        return out.decode("utf-8")

    s = s.copy()
    s[mask] = s[mask].map(_dec)
    return s


def _escape_literal(values: pa.Array) -> pa.Array:
    """Canonical ECHAR escapes: backslash, quote, LF, CR (+ TAB for
    symmetry; raw TAB is grammar-legal but the parser unescapes either
    form). Order matters — backslash first."""
    arr = pc.cast(values, pa.large_string())
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        arr = pc.replace_substring(arr, raw, esc)
    return arr


_UNESCAPE = re.compile(r"\\(.)")
_UNESCAPE_MAP = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}


def _unescape_literal(s: pd.Series) -> pd.Series:
    mask = s.str.contains("\\", regex=False)
    if not mask.any():
        return s
    s = s.copy()
    s[mask] = s[mask].map(
        lambda v: _UNESCAPE.sub(lambda m: _UNESCAPE_MAP.get(m.group(1), m.group(1)), v)
    )
    return s


def triples_to_nquads(batch: pa.Table) -> pa.Table:
    """Vectorized canonical-triple rows → N-Quads ``line`` column."""
    n = len(batch)
    subj = pc.binary_join_element_wise(
        pa.array(np.full(n, "<dc:", object), pa.large_string()),
        _pct_encode_unsafe(pc.fill_null(batch["subject_id"], "")),
        pa.array(np.full(n, ">", object), pa.large_string()),
        pa.scalar("", pa.large_string()),
    )
    pred = pc.binary_join_element_wise(
        pa.array(np.full(n, "<dc:", object), pa.large_string()),
        _pct_encode_unsafe(pc.fill_null(batch["predicate"], "")),
        pa.array(np.full(n, ">", object), pa.large_string()),
        pa.scalar("", pa.large_string()),
    )
    oid = pc.fill_null(pc.cast(batch["object_id"], pa.large_string()), "")
    is_ref = pc.not_equal(oid, "")
    ref_term = pc.binary_join_element_wise(
        pa.array(np.full(n, "<dc:", object), pa.large_string()),
        _pct_encode_unsafe(oid),
        pa.array(np.full(n, ">", object), pa.large_string()),
        pa.scalar("", pa.large_string()),
    )
    oval = batch["object_value"]
    null_val = pc.is_null(oval)
    lit_body = _escape_literal(pc.fill_null(oval, ""))
    closer = pc.if_else(
        null_val,
        pa.array(np.full(n, '"^^<dc:null>', object), pa.large_string()),
        pa.array(np.full(n, '"', object), pa.large_string()),
    )
    lit_term = pc.binary_join_element_wise(
        pa.array(np.full(n, '"', object), pa.large_string()), lit_body, closer, pa.scalar("", pa.large_string())
    )
    obj = pc.if_else(is_ref, ref_term, lit_term)
    graph = pc.binary_join_element_wise(
        pa.array(np.full(n, "<dc:prov/", object), pa.large_string()),
        _pct_encode_unsafe(pc.fill_null(batch["provenance"], "")),
        pa.array(np.full(n, ">", object), pa.large_string()),
        pa.scalar("", pa.large_string()),
    )
    line = pc.binary_join_element_wise(
        subj, pred, obj, graph,
        pa.scalar(".", pa.large_string()),
        pa.scalar(" ", pa.large_string()),
    )
    return pa.table({"line": line})


_LINE_RE = re.compile(
    r"^<dc:([^>]*)> <dc:([^>]*)> "
    r"(?:<dc:([^>]*)>|\"((?:[^\"\\]|\\.)*)\"(\^\^<dc:null>)?)"
    r"(?: <dc:prov/([^>]*)>)? \.$"
)


def nquads_to_triples(batch: pa.Table) -> pa.Table:
    """Vectorized N-Quads ``line`` column → canonical-triple rows."""
    lines = batch["line"].to_pandas().astype(str)
    m = lines.str.extract(_LINE_RE)
    bad = m[0].isna() & (lines.str.strip() != "")
    if bad.any():
        raise ValueError(f"unparseable N-Quads line: {lines[bad].iloc[0]!r}")
    m = m[~m[0].isna()]
    subj = _pct_decode(m[0])
    pred = _pct_decode(m[1])
    obj_ref = m[2]
    has_ref = obj_ref.notna()
    obj_id = _pct_decode(obj_ref.fillna("")).where(has_ref, None)
    lit = _unescape_literal(m[3].fillna(""))
    null_marker = m[4].notna()
    obj_val = lit.where(~null_marker, None).where(~has_ref, None)
    prov = _pct_decode(m[5].fillna(""))
    return pa.table(
        {
            "subject_id": pa.array(subj.to_numpy(dtype=object), pa.string()),
            "predicate": pa.array(pred.to_numpy(dtype=object), pa.string()),
            "object_id": pa.array(obj_id.to_numpy(dtype=object), pa.string()),
            "object_value": pa.array(obj_val.to_numpy(dtype=object), pa.large_string()),
            "provenance": pa.array(prov.to_numpy(dtype=object), pa.string()),
        }
    )


def serialize_triples(triples_ds):
    """Lazy Dataset of N-Quads lines from a canonical-triple Dataset."""
    return triples_ds.map_batches(triples_to_nquads, batch_format="pyarrow")


def parse_lines(lines_ds):
    """Lazy Dataset of canonical triples from an N-Quads ``line`` Dataset."""
    return lines_ds.map_batches(nquads_to_triples, batch_format="pyarrow")


def write_nquads(triples_ds, out_dir: str):
    """Triples → ``part-<hash>.nq`` shards (one per block, content-hash
    named → idempotent rewrite, the resumable-output contract). Returns
    the manifest as a small pandas frame (path, n_lines)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        lines = triples_to_nquads(batch)["line"]
        if not len(lines):
            return pa.table(
                {"path": pa.array([], pa.string()), "n_lines": pa.array([], pa.int64())}
            )
        blob = ("\n".join(lines.to_pylist()) + "\n").encode("utf-8")
        name = hashlib.sha256(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.nq")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_lines": pa.array([len(lines)], pa.int64()),
            }
        )

    return (
        triples_ds.map_batches(write_shard, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )


def read_nquads(paths: list[str] | str):
    """Dataset of canonical triples from .nq files (splittable text read)."""
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    lines = ray.data.read_text(paths)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["line"])

    return parse_lines(lines.map_batches(rename, batch_format="pyarrow"))
