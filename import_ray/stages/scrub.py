"""PII scrubbing and deterministic corpus sampling.

Training-data-pipeline operators the reference lacks (SURVEY.md §2 has
no text-scrub analog; closest is value normalization in
``util/.../McfMutator.java:161-163``):

- ``pii_redact``: vectorized regex redaction of emails / phone numbers
  over the whole Arrow batch via ``pyarrow.compute`` RE2 kernels
  (``count_substring_regex`` + ``replace_substring_regex``) — no
  per-row Python. DuckDB's regex engine is also RE2, so the planted
  oracle matches byte-for-byte.
- ``hash_sample``: deterministic multiplicative-hash Bernoulli sample —
  keep rows where ``(doc_id * KNUTH) mod 2^32 < threshold``. Unlike
  ``Dataset.random_sample`` this is reproducible across runs/cluster
  sizes and SQL-expressible, so the sample is auditable; at 100 TB the
  filter runs at the read (no shuffle, no RNG state).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RE = r"[A-Za-z0-9_.]+@[A-Za-z0-9_.]+\.[A-Za-z]+"
PHONE_RE = r"555-[0-9]{4}"

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(0xFFFFFFFF)


def plant_pii(batch: pa.Table) -> pa.Table:
    """Deterministic PII planting (test/oracle fixture): every doc with
    doc_id % 3 == 0 gains an email, % 3 == 1 a phone number."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    email = pa.array([f" contact user{i}@example.com" for i in ids])
    phone_sfx = pa.array([" call 555-0100 now"] * len(ids))
    empty = pa.array([""] * len(ids))
    sfx = pc.if_else(
        pa.array(ids % 3 == 0),
        email,
        pc.if_else(pa.array(ids % 3 == 1), phone_sfx, empty),
    )
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(text, sfx, ""),
    )


def pii_redact(batch: pa.Table) -> pa.Table:
    """(doc_id, n_emails, n_phones, clean_len): per-doc PII counts and
    the length of the redacted text ([EMAIL]/[PHONE] placeholders)."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_emails = pc.count_substring_regex(text, EMAIL_RE)
    n_phones = pc.count_substring_regex(text, PHONE_RE)
    clean = pc.replace_substring_regex(text, EMAIL_RE, "[EMAIL]")
    clean = pc.replace_substring_regex(clean, PHONE_RE, "[PHONE]")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_phones": pc.cast(n_phones, pa.int64()),
            "clean_len": pc.cast(pc.utf8_length(clean), pa.int64()),
        }
    )


PII_REDACT_SQL = r"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
                THEN text || ' contact user' || doc_id || '@example.com'
              WHEN doc_id % 3 = 1
                THEN text || ' call 555-0100 now'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+\.[A-Za-z]+')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
       CAST(length(
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+\.[A-Za-z]+', '[EMAIL]', 'g'),
           '555-[0-9]{4}', '[PHONE]', 'g')) AS BIGINT) AS clean_len
FROM planted
"""


def hash_sample(batch: pa.Table, threshold_u32: int = 858993459) -> pa.Table:
    """Keep rows whose 32-bit multiplicative doc_id hash falls under
    ``threshold_u32`` (default ≈ 20% rate); emits the hash as
    ``sample_key`` for auditability."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = (ids * _KNUTH) & _MOD32
    keep = h < np.uint64(threshold_u32)
    out = batch.filter(pa.array(keep))
    return out.append_column(
        "sample_key", pa.array(h[keep].astype(np.int64), pa.int64())
    )


HASH_SAMPLE_SQL = """
SELECT doc_id, n_chars,
       CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS sample_key
FROM documents
WHERE (doc_id * 2654435761) % 4294967296 < 858993459
"""


# --- C4-style token-blocklist filter -----------------------------------------

BADWORD_DEFAULT = ("spark", "dup")


def badword_filter(batch: pa.Table, blocklist=BADWORD_DEFAULT) -> pa.Table:
    """Drop documents containing any blocklisted token (the C4 bad-words
    rule, token-exact so the DuckDB ``list_has_any`` oracle matches).
    Vectorized: split → flatten → np.isin on the flat token array →
    per-doc any() via bincount; no per-row loops."""
    import pyarrow.compute as pc

    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, pattern=" ")
    n_tok = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(n_tok)
    if n == 0:
        return batch.select(["doc_id", "text"])
    flat = pc.list_flatten(lists).to_pandas().to_numpy(dtype=object)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), n_tok)
    bad = np.isin(flat, np.asarray(list(blocklist), dtype=object))
    bad_per_doc = np.bincount(doc_of[bad], minlength=n) > 0
    return batch.select(["doc_id", "text"]).filter(pa.array(~bad_per_doc))


BADWORD_FILTER_SQL = """
SELECT doc_id, text FROM documents
WHERE NOT list_has_any(string_split(text, ' '), ['spark', 'dup'])
"""
