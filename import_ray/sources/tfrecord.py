"""TFRecord optimized-graph I/O — the Beam ingestion's interchange
format (PipelineUtils.java:121-141,250-306: gzipped TFRecord files of
serialized ``McfOptimizedGraph`` protos, one record per SVObs series).

Everything here is built from PUBLIC specs:

- TFRecord framing: ``uint64le length | uint32le masked_crc32c(length)
  | data | uint32le masked_crc32c(data)``, masked_crc = ((crc >> 15 |
  crc << 17) + 0xa282ead8) mod 2^32, CRC32C (Castagnoli, reflected
  poly 0x82F63B78) — the TensorFlow record spec;
- protobuf wire format (varint tags, length-delimited submessages,
  little-endian doubles) hand-rolled for the three message shapes in
  the reference's ``Mcf.proto``:

    McfStatVarObsSeries.Key { 1: observation_about, 2:
      variable_measured, 3: measurement_method, 4: observation_period,
      5: scaling_factor, 6: unit, 7: provenance_url }
    McfStatVarObsSeries.StatVarObs { 1: date, 2: double number | 3:
      text, 5: dcid, 6: local_node_id }  (field 4 ``pvs`` is skipped on
      read and never written — documented deviation: the engine keeps
      extra PVs in its own obs columns)
    McfStatVarObsSeries { 1: Key, 2: repeated StatVarObs }
    McfOptimizedGraph { 1: sv_obs_series }

Series rows use the engine's ``group_series`` schema (SERIES_KEY +
parallel ``dates``/``values`` lists; optional ``dcids``). Values parse
to the ``number`` field when float()-able (GraphUtils semantics),
``text`` otherwise; integral numbers re-render without a decimal
point.

Ray integration: the writer is a ``map_batches`` stage — one gzipped
shard per batch, named by content hash (deterministic, resumable:
rewriting a shard is idempotent) — returning a manifest Dataset
(path, n_records). The reader is ``read_binary_files`` + a flat decode
map.
"""

from __future__ import annotations

import gzip
import hashlib
import math
import os
import struct

import numpy as np
import pyarrow as pa

SERIES_KEY = [
    "entity",
    "variable",
    "measurement_method",
    "observation_period",
    "scaling_factor",
    "unit",
]

# --- CRC32C (Castagnoli, reflected) ------------------------------------------

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- protobuf wire helpers ---------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _tag_bytes(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _str_field(field: int, val: str) -> bytes:
    if not val:
        return b""
    enc = val.encode("utf-8")
    return _tag_bytes(field, 2) + _varint(len(enc)) + enc


def _msg_field(field: int, payload: bytes) -> bytes:
    return _tag_bytes(field, 2) + _varint(len(payload)) + payload


def _double_field(field: int, val: float) -> bytes:
    return _tag_bytes(field, 1) + struct.pack("<d", val)


# --- McfOptimizedGraph encode/decode -----------------------------------------


def _format_number(x: float) -> str:
    if not math.isfinite(x):
        return repr(x)
    if x == int(x) and abs(x) < 2**53:
        return str(int(x))
    return repr(x)


def encode_series(key: dict, dates, values, dcids=None) -> bytes:
    """One series → serialized McfOptimizedGraph proto bytes."""
    key_payload = b"".join(
        _str_field(i + 1, key.get(name) or "")
        for i, name in enumerate(
            ["entity", "variable", "measurement_method", "observation_period",
             "scaling_factor", "unit"]
        )
    )
    obs_parts = []
    for i, (d, v) in enumerate(zip(dates, values)):
        part = _str_field(1, d or "")
        try:
            fv = float(v)
            if not math.isfinite(fv):
                # non-finite values stay in the text field so decode
                # round-trips the original token ('NaN'/'Infinity')
                raise ValueError
            part += _double_field(2, fv)
        except (TypeError, ValueError):
            part += _str_field(3, v or "")
        dcid = dcids[i] if dcids is not None else ""
        part += _str_field(5, dcid or "")
        obs_parts.append(_msg_field(2, part))
    series = _msg_field(1, key_payload) + b"".join(obs_parts)
    return _msg_field(1, series)  # McfOptimizedGraph.sv_obs_series


def decode_series(data: bytes) -> dict:
    """Serialized McfOptimizedGraph → series row dict."""
    # unwrap McfOptimizedGraph.field1
    pos = 0
    tag, pos = _read_varint(data, pos)
    if tag >> 3 != 1 or tag & 7 != 2:
        raise ValueError(f"not an McfOptimizedGraph record (tag {tag})")
    ln, pos = _read_varint(data, pos)
    series = data[pos : pos + ln]

    key = {name: "" for name in SERIES_KEY}
    dates, values, dcids = [], [], []
    pos = 0
    while pos < len(series):
        tag, pos = _read_varint(series, pos)
        field, wire = tag >> 3, tag & 7
        if wire != 2:
            raise ValueError(f"unexpected wire type {wire} in series")
        ln, pos = _read_varint(series, pos)
        payload = series[pos : pos + ln]
        pos += ln
        if field == 1:  # Key
            kpos = 0
            while kpos < len(payload):
                ktag, kpos = _read_varint(payload, kpos)
                kfield = ktag >> 3
                kln, kpos = _read_varint(payload, kpos)
                val = payload[kpos : kpos + kln].decode("utf-8")
                kpos += kln
                if 1 <= kfield <= 6:
                    key[SERIES_KEY[kfield - 1]] = val
        elif field == 2:  # StatVarObs
            date, value, dcid = "", "", ""
            opos = 0
            while opos < len(payload):
                otag, opos = _read_varint(payload, opos)
                ofield, owire = otag >> 3, otag & 7
                if owire == 1:  # double
                    (num,) = struct.unpack_from("<d", payload, opos)
                    opos += 8
                    if ofield == 2:
                        value = _format_number(num)
                elif owire == 2:
                    oln, opos = _read_varint(payload, opos)
                    raw = payload[opos : opos + oln]
                    opos += oln
                    if ofield == 1:
                        date = raw.decode("utf-8")
                    elif ofield == 3:
                        value = raw.decode("utf-8")
                    elif ofield == 5:
                        dcid = raw.decode("utf-8")
                    # field 4 (pvs) / 6 (local_node_id): skipped
                elif owire == 0:
                    _, opos = _read_varint(payload, opos)
                else:
                    raise ValueError(f"unexpected obs wire type {owire}")
            dates.append(date)
            values.append(value)
            dcids.append(dcid)
    return {**key, "dates": dates, "values": values, "dcids": dcids}


# --- TFRecord framing --------------------------------------------------------


def write_tfrecords(records: list[bytes], compress: bool = True) -> bytes:
    out = bytearray()
    for rec in records:
        ln = struct.pack("<Q", len(rec))
        out += ln
        out += struct.pack("<I", _masked_crc(ln))
        out += rec
        out += struct.pack("<I", _masked_crc(rec))
    return gzip.compress(bytes(out)) if compress else bytes(out)


def read_tfrecords(blob: bytes, validate: bool = True) -> list[bytes]:
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    out = []
    pos = 0
    while pos < len(blob):
        (ln,) = struct.unpack_from("<Q", blob, pos)
        len_bytes = blob[pos : pos + 8]
        (len_crc,) = struct.unpack_from("<I", blob, pos + 8)
        pos += 12
        data = blob[pos : pos + ln]
        pos += ln
        (data_crc,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        if validate:
            if _masked_crc(len_bytes) != len_crc:
                raise ValueError("TFRecord length CRC mismatch")
            if _masked_crc(data) != data_crc:
                raise ValueError("TFRecord data CRC mismatch")
        out.append(data)
    return out


# --- Ray Data integration ----------------------------------------------------


def write_optimized_graph(series_ds, out_dir: str, compress: bool = True):
    """Series rows → gzipped TFRecord shards under ``out_dir`` (one
    shard per batch, content-hash named → idempotent/resumable).
    Returns a manifest Dataset (path, n_records)."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".tfrecord.gz" if compress else ".tfrecord"

    def write_shard(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        records = [
            encode_series(
                {k: r.get(k) for k in SERIES_KEY},
                r.get("dates") or [],
                r.get("values") or [],
                r.get("dcids"),
            )
            for r in rows
        ]
        if not records:
            return pa.table(
                {"path": pa.array([], pa.string()), "n_records": pa.array([], pa.int64())}
            )
        blob = write_tfrecords(records, compress=compress)
        name = hashlib.sha256(b"".join(records)).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}{suffix}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(records)], pa.int64()),
            }
        )

    return series_ds.map_batches(write_shard, batch_format="pyarrow")


def read_optimized_graph(path: str, validate: bool = True):
    """TFRecord shard file/dir → Dataset of series rows
    (SERIES_KEY + dates/values/dcids lists)."""
    import ray.data

    from import_ray.core.context import configure_data_context

    configure_data_context()
    files = ray.data.read_binary_files(path)

    def decode(batch: pa.Table) -> pa.Table:
        rows = []
        for blob in batch["bytes"].to_pylist():
            for rec in read_tfrecords(blob, validate=validate):
                rows.append(decode_series(rec))
        if not rows:
            return pa.table(
                {
                    **{k: pa.array([], pa.string()) for k in SERIES_KEY},
                    "dates": pa.array([], pa.list_(pa.string())),
                    "values": pa.array([], pa.list_(pa.string())),
                    "dcids": pa.array([], pa.list_(pa.string())),
                }
            )
        return pa.table(
            {
                **{
                    k: pa.array([r[k] for r in rows], pa.string())
                    for k in SERIES_KEY
                },
                "dates": pa.array([r["dates"] for r in rows], pa.list_(pa.string())),
                "values": pa.array([r["values"] for r in rows], pa.list_(pa.string())),
                "dcids": pa.array([r["dcids"] for r in rows], pa.list_(pa.string())),
            }
        )

    return files.map_batches(decode, batch_format="pyarrow")
