"""Pure-numpy baseline-DCT JPEG codec (JFIF).

Covers the dominant real-world image format end-to-end through the
multimodal actor-pool stages with no external libraries: sequential
baseline (SOF0) with 8-bit samples, Huffman entropy coding, 4:4:4 or
4:2:0 subsampling — the layout virtually all camera/tool JPEGs use.
Progressive (SOF2), arithmetic coding, 12-bit and hierarchical modes
raise cleanly.

The decoder builds quantization and Huffman tables FROM THE FILE
(DQT/DHT segments), so it decodes any conforming baseline JPEG, not
just this module's output. The encoder emits the standard Annex-K
tables. Entropy decoding is the one inherently serial loop (bit-level
prefix codes); it runs over a 16-bit-peek lookup table (one array
probe per symbol). Everything after entropy decode — dequantize,
de-zigzag, IDCT, upsample, color convert — is batched numpy over ALL
blocks at once (``einsum`` with the orthonormal 8-point DCT matrix).

Parity note: this replaces the reference's PIL/external decode calls
(no image libs in this environment); the Ray-side contracts (schema,
actor signature, batch sizing) are identical either way.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants ----------------------------------------------------------------

_SOI = 0xD8
_EOI = 0xD9
_SOS = 0xDA
_DQT = 0xDB
_DHT = 0xC4
_DRI = 0xDD
_SOF0 = 0xC0

# zigzag scan: index i of the scan reads natural position _ZZ[i]
_ZZ = np.empty(64, np.intp)
_i = 0
for _s in range(15):
    _rows = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (_rows if _s % 2 == 1 else reversed(list(_rows))):
        _ZZ[_i] = _r * 8 + (_s - _r)
        _i += 1

# orthonormal 8-point DCT-II matrix
_k = np.arange(8)
_DCT8 = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_DCT8[0] /= np.sqrt(2)

# Annex-K quantization tables (natural order), quality 50
_QY50 = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    np.int32,
).reshape(8, 8)
_QC50 = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    np.int32,
).reshape(8, 8)

# Annex-K Huffman specs: (bits[1..16] code counts, symbol values)
_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


# --- Huffman helpers ----------------------------------------------------------


def _canonical_codes(bits, vals):
    """(bits, vals) → list of (symbol, code, length), canonical order."""
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[i], code, length))
            code += 1
            i += 1
        code <<= 1
    return out


def _encode_table(bits, vals):
    """symbol → (code, length) dict for the encoder."""
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(bits, vals)}


def _decode_lut(bits, vals):
    """16-bit-peek LUT: (sym[65536] int16, len[65536] uint8). A peeked
    16-bit window indexes directly; len 0 ⇒ invalid prefix."""
    sym = np.zeros(1 << 16, np.int16)
    ln = np.zeros(1 << 16, np.uint8)
    for s, code, length in _canonical_codes(bits, vals):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over destuffed entropy bytes."""

    def __init__(self, data: bytes):
        # 4 zero guard bytes so peek16 near the end never walks off
        self.d = np.frombuffer(bytes(data) + b"\x00" * 4, np.uint8)
        self.pos = 0

    def peek16(self) -> int:
        byte = self.pos >> 3
        b = (
            (int(self.d[byte]) << 24)
            | (int(self.d[byte + 1]) << 16)
            | (int(self.d[byte + 2]) << 8)
            | int(self.d[byte + 3])
        )
        return (b >> (16 - (self.pos & 7))) & 0xFFFF

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, size: int) -> int:
    """JPEG amplitude decode: top bit 0 ⇒ negative branch."""
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _quality_tables(quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qy = np.clip((_QY50 * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC50 * scale + 50) // 100, 1, 255).astype(np.int32)
    return qy, qc


# --- encoder ------------------------------------------------------------------


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int, dc_tbl, ac_tbl) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = int(abs(diff)).bit_length()
    code, ln = dc_tbl[size]
    w.put(code, ln)
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    nz = np.flatnonzero(zz[1:]) + 1
    k = 1
    for idx in nz:
        run = int(idx) - k
        while run >= 16:
            zcode, zln = ac_tbl[0xF0]
            w.put(zcode, zln)
            run -= 16
        v = int(zz[idx])
        s = abs(v).bit_length()
        code, ln = ac_tbl[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        k = int(idx) + 1
    if k < 64:
        code, ln = ac_tbl[0x00]  # EOB
        w.put(code, ln)
    return dc


def jpeg_encode(img: np.ndarray, quality: int = 85, subsample: bool = True) -> bytes:
    """Encode (H, W, 3) or (H, W) uint8 as baseline JFIF JPEG.

    ``subsample=True`` → 4:2:0 (2×2 Y blocks per MCU); otherwise 4:4:4.
    Grayscale input encodes as a single-component scan."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected (H,W[,3]) uint8, got {img.shape}")
    h, w = img.shape[:2]
    qy, qc = _quality_tables(quality)

    if gray:
        comps = [("Y", img.astype(np.float64), qy, 1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to 16 and average 2×2 for chroma
            h16, w16 = -(-h // 16) * 16, -(-w // 16) * 16
            y = np.pad(y, ((0, h16 - h), (0, w16 - w)), mode="edge")
            cb = np.pad(cb, ((0, h16 - h), (0, w16 - w)), mode="edge")
            cr = np.pad(cr, ((0, h16 - h), (0, w16 - w)), mode="edge")
            cb = cb.reshape(h16 // 2, 2, w16 // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h16 // 2, 2, w16 // 2, 2).mean(axis=(1, 3))
            comps = [("Y", y, qy, 2, 2), ("Cb", cb, qc, 1, 1), ("Cr", cr, qc, 1, 1)]
        else:
            comps = [("Y", y, qy, 1, 1), ("Cb", cb, qc, 1, 1), ("Cr", cr, qc, 1, 1)]

    max_h = max(c[3] for c in comps)
    max_v = max(c[4] for c in comps)
    # pad every component plane to its block grid implied by the MCU grid
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    coefs = []
    for name, plane, q, ch, cv in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        plane = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        by, bx = ph // 8, pw // 8
        blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        f = np.einsum("ij,abjk,lk->abil", _DCT8, blocks, _DCT8)
        qcoef = np.round(f / q).astype(np.int32).reshape(by, bx, 64)
        coefs.append(qcoef[:, :, _ZZ])  # natural → zigzag scan order

    dc_lum = _encode_table(*_HUFF_DC_LUM)
    ac_lum = _encode_table(*_HUFF_AC_LUM)
    dc_chr = _encode_table(*_HUFF_DC_CHR)
    ac_chr = _encode_table(*_HUFF_AC_CHR)

    bw = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (name, _plane, _q, ch, cv) in enumerate(comps):
                dct, act = (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
                for v in range(cv):
                    for hh in range(ch):
                        zz = coefs[ci][my * cv + v, mx * ch + hh]
                        preds[ci] = _encode_block(bw, zz, preds[ci], dct, act)
    entropy = bw.flush()

    # --- headers ---
    parts = [b"\xff\xd8"]  # SOI
    parts.append(
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, q in ((0, qy),) + (() if gray else ((1, qc),)):
        parts.append(
            b"\xff\xdb"
            + struct.pack(">HB", 67, tid)
            + bytes(int(x) for x in q.reshape(64)[_ZZ])
        )
    ncomp = len(comps)
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (_n, _p, _q, ch, cv) in enumerate(comps):
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    parts.append(b"\xff\xc0" + sof)
    tables = [(0, 0, _HUFF_DC_LUM), (1, 0, _HUFF_AC_LUM)]
    if not gray:
        tables += [(0, 1, _HUFF_DC_CHR), (1, 1, _HUFF_AC_CHR)]
    for tc, th, (bits, vals) in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        parts.append(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    parts.append(b"\xff\xda" + sos)
    parts.append(entropy)
    parts.append(b"\xff\xd9")  # EOI
    return b"".join(parts)


# --- decoder ------------------------------------------------------------------


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) Huffman JFIF/EXIF JPEG to (H, W, 3)
    uint8 RGB. Grayscale replicates; restart intervals supported."""
    data = memoryview(bytes(payload))
    if len(data) < 4 or data[0] != 0xFF or data[1] != _SOI:
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hlut: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps = None  # list of (cid, ch, cv, tq)
    h = w = None
    restart_interval = 0
    scan = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker sync at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == _EOI:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = bytes(data[pos + 2 : pos + seglen])
        if marker == _DQT:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                o += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, o).astype(np.int32)
                    o += 64
                else:
                    vals = np.frombuffer(body, ">u2", 64, o).astype(np.int32)
                    o += 128
                nat = np.empty(64, np.int32)
                nat[_ZZ] = vals  # DQT is zigzag order → natural
                qtables[tq] = nat.reshape(8, 8)
        elif marker == _DHT:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1 : o + 17])
                nvals = sum(bits)
                vals = list(body[o + 17 : o + 17 + nvals])
                hlut[(tc, th)] = _decode_lut(bits, vals)
                o += 17 + nvals
        elif marker == _SOF0:
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF{marker - 0xC0})")
        elif marker == _DRI:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == _SOS:
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tsel = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cid, tsel >> 4, tsel & 15))
            pos += seglen
            break
        pos += seglen

    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # entropy-coded bytes: destuff FF00 and strip restart markers
    raw = np.frombuffer(data, np.uint8)
    ff = np.flatnonzero(raw[pos:] == 0xFF) + pos
    stops = ff[
        (raw[np.minimum(ff + 1, len(raw) - 1)] != 0x00)
        & ~(
            (raw[np.minimum(ff + 1, len(raw) - 1)] >= 0xD0)
            & (raw[np.minimum(ff + 1, len(raw) - 1)] <= 0xD7)
        )
    ]
    end = int(stops[0]) if len(stops) else len(raw)
    seg = raw[pos:end]
    # drop 0x00 after 0xFF (stuffing) and FFDn restart marker pairs
    drop = np.zeros(len(seg), bool)
    ffpos = np.flatnonzero(seg[:-1] == 0xFF)
    nxt = seg[ffpos + 1]
    drop[ffpos[nxt == 0x00] + 1] = True
    rst = ffpos[(nxt >= 0xD0) & (nxt <= 0xD7)]
    drop[rst] = True
    drop[rst + 1] = True
    entropy = seg[~drop].tobytes()
    # restart-marker positions in destuffed bit units are irrelevant:
    # baseline decoders resync by MCU count (restart_interval), and
    # byte alignment at restarts is handled by re-aligning the reader

    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))

    br = _BitReader(entropy)
    preds = {cid: 0 for cid, *_ in comps}
    comp_by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    # coefficient grids per scan component
    grids = {}
    for cid, _dc, _ac in scan:
        ch, cv, _tq = comp_by_id[cid]
        grids[cid] = np.zeros((mcuy * cv, mcux * ch, 64), np.int32)

    sym_len = hlut

    def read_block(dc_th, ac_th):
        coef = np.zeros(64, np.int32)
        sym, ln = sym_len[(0, dc_th)]
        idx = br.peek16()
        s, length = int(sym[idx]), int(ln[idx])
        if length == 0:
            raise ValueError("invalid DC Huffman prefix")
        br.pos += length
        coef[0] = _extend(br.read_bits(s), s)
        asym, aln = sym_len[(1, ac_th)]
        k = 1
        while k < 64:
            idx = br.peek16()
            rs, length = int(asym[idx]), int(aln[idx])
            if length == 0:
                raise ValueError("invalid AC Huffman prefix")
            br.pos += length
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break
            k += r
            if k > 63:
                break
            coef[k] = _extend(br.read_bits(s), s)
            k += 1
        return coef

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align at restart boundaries; DC predictors reset
                br.pos = (br.pos + 7) & ~7
                for k in preds:
                    preds[k] = 0
            for cid, dc_th, ac_th in scan:
                ch, cv, _tq = comp_by_id[cid]
                for v in range(cv):
                    for hh in range(ch):
                        coef = read_block(dc_th, ac_th)
                        preds[cid] += int(coef[0])
                        coef[0] = preds[cid]
                        grids[cid][my * cv + v, mx * ch + hh] = coef
            mcu_count += 1

    # batched dequantize → de-zigzag → IDCT per component
    planes = {}
    for cid, _dc, _ac in scan:
        ch, cv, tq = comp_by_id[cid]
        g = grids[cid]
        by, bx = g.shape[:2]
        nat = np.zeros((by, bx, 64), np.int32)
        nat[:, :, _ZZ] = g  # zigzag scan → natural positions
        f = nat.reshape(by, bx, 8, 8).astype(np.float64) * qtables[tq]
        px = np.einsum("ji,abjk,kl->abil", _DCT8, f, _DCT8) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, max_v // cv, axis=0), max_h // ch, axis=1)
        planes[cid] = plane[:h, :w]

    ids = [cid for cid, _dc, _ac in scan]
    if len(ids) == 1:
        y = np.clip(planes[ids[0]], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes[ids[0]], planes[ids[1]], planes[ids[2]]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
