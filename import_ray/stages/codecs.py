"""Pure-numpy media codecs: uncompressed BMP (BI_RGB 24-bit / 8-bit
grayscale palette), PNG (8-bit, all 5 row filters), baseline-DCT JPEG
(via ``stages/jpeg.py``) and PCM WAV (16-bit / 8-bit RIFF).

The sandbox has no PIL/ffmpeg, so these formats — decodable from their
published byte layouts — make real image and audio formats END-TO-END
through the multimodal actor-pool stages (decode →
feature/aHash/resize), replacing the deterministic fake decoder for
`decoder="bmp"` / `"png"` / `"jpeg"` / `"wav"` (or auto-sniffing
`"image"`). A real deployment swaps these functions for PIL/soundfile
calls; every Ray-side contract (schema, batch sizing, actor signature)
is identical.

Formats follow the public specs: BITMAPFILEHEADER (14 B) +
BITMAPINFOHEADER (40 B), bottom-up rows padded to 4-byte boundaries;
RIFF/WAVE with fmt + data chunks (PCM only).
"""

from __future__ import annotations

import struct

import numpy as np

# baseline-DCT JPEG lives in its own module (entropy coder + batched
# DCT are substantial); re-exported here so codec users import one place
from import_ray.stages.jpeg import jpeg_decode, jpeg_encode  # noqa: F401


# --- BMP ---------------------------------------------------------------------


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) or (H, W) uint8 array as an uncompressed
    24-bit BI_RGB BMP (grayscale input is replicated across channels)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H,W[,3]) uint8, got {img.shape}")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BMP stores BGR, bottom-up, rows padded to 4 bytes
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_data = rows.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixel_data


def bmp_decode(payload: bytes) -> np.ndarray:
    """Decode an uncompressed BMP to an (H, W, 3) uint8 RGB array.

    Supports 24-bit BI_RGB and 8-bit palettized (incl. grayscale)
    images, top-down or bottom-up row order — the layouts ~all
    synthetic/tool-generated BMPs use."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if w <= 0 or h_raw == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bpp == 24:
        row_bytes = w * 3
    elif bpp == 8:
        row_bytes = w
    else:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(payload, np.uint8, stride * h, data_offset).reshape(h, stride)
    if bpp == 24:
        bgr = raw[:, :row_bytes].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
    else:
        # palette sits between the info header and the pixel data
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + header_size
        pal = np.frombuffer(payload, np.uint8, n_colors * 4, pal_off).reshape(-1, 4)
        rgb = pal[raw[:, :w]][:, :, [2, 1, 0]]  # BGRA palette → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def luma(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB → (H, W) float64 Rec.601 luma."""
    f = img.astype(np.float64)
    return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]


def block_mean_grid(img2d: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Downsample a 2-D array to a (gh, gw) grid of block means —
    vectorized via bincount over per-pixel cell ids (handles arbitrary
    non-divisible shapes)."""
    h, w = img2d.shape
    yi = (np.arange(h) * gh // h).astype(np.intp)
    xi = (np.arange(w) * gw // w).astype(np.intp)
    cell = (yi[:, None] * gw + xi[None, :]).ravel()
    sums = np.bincount(cell, weights=img2d.ravel(), minlength=gh * gw)
    counts = np.bincount(cell, minlength=gh * gw)
    return (sums / np.maximum(counts, 1)).reshape(gh, gw)


# --- WAV ---------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a 1-D (mono) or (N, C) int16 array as PCM WAV."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved little-endian
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to ((N, C) float64 in [-1, 1], sample_rate).

    Supports 16-bit and 8-bit PCM, any channel count; walks the RIFF
    chunk list so extra chunks (LIST/fact) are skipped correctly."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
    if bits == 16:
        s = np.frombuffer(data, "<i2")
        x = s.astype(np.float64) / 32768.0
    elif bits == 8:
        s = np.frombuffer(data, np.uint8)
        x = (s.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    n = len(x) // ch
    return x[: n * ch].reshape(n, ch), rate


def wav_band_energies(x: np.ndarray, n_bands: int) -> np.ndarray:
    """Mono-mixed log band energies over an rFFT magnitude spectrum —
    the classic cheap audio fingerprint feature."""
    mono = x.mean(axis=1) if x.ndim == 2 else x
    if len(mono) == 0:
        return np.zeros(n_bands)
    spec = np.abs(np.fft.rfft(mono))
    edges = np.linspace(0, len(spec), n_bands + 1).astype(np.intp)
    e = np.add.reduceat(spec**2, edges[:-1])
    # empty trailing bands (reduceat quirk) → 0
    e[edges[:-1] == edges[1:]] = 0.0
    return np.log1p(e)


# --- PNG ---------------------------------------------------------------------
#
# zlib is stdlib, so PNG (the other ubiquitous lossless format) decodes
# fully: chunk walk → IDAT inflate → per-row unfilter (the 5 standard
# filters) → pixel array. 8-bit gray / gray+alpha / RGB / RGBA /
# palette, the layouts that cover ~all tool-generated PNGs.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(img: np.ndarray) -> bytes:
    """Encode (H, W), (H, W, 3) or (H, W, 4) uint8 as PNG (filter 0)."""
    import struct
    import zlib

    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        data = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        data = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, channels = 6, 4
        data = img
    else:
        raise ValueError(f"unsupported PNG shape {img.shape}")
    h, w = img.shape[:2]
    raw = np.zeros((h, 1 + w * channels), np.uint8)
    raw[:, 1:] = data.reshape(h, w * channels)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters. The row loop is inherent (each row depends
    on the previous); within a row the Sub/Paeth carry is a serial
    prefix — vectorized per-pixel-column across the bpp channels."""
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), np.uint16)
    prior = np.zeros(stride, np.uint16)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.uint16)
        if ftype == 0:
            line = cur
        elif ftype == 1:  # Sub
            line = cur.copy()
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            line = (cur + prior) & 0xFF
        elif ftype == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((int(a) + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = line
        prior = line
    return out.astype(np.uint8)


def png_decode(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W, 3) uint8 RGB
    (alpha dropped, gray replicated, palette resolved)."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = []
    pal = None
    w = h = None
    color_type = None
    while pos + 8 <= len(payload):
        size = struct.unpack_from(">I", payload, pos)[0]
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif typ == b"PLTE":
            pal = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * channels
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG data length mismatch")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color_type == 3:
        if pal is None:
            raise ValueError("palette PNG missing PLTE")
        return np.ascontiguousarray(pal[px[:, :, 0]])
    if color_type in (0, 4):
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def image_decode(payload: bytes) -> np.ndarray:
    """Magic-sniffing image decode (BMP, PNG or baseline JPEG) →
    (H, W, 3) uint8."""
    if payload.startswith(_PNG_SIG):
        return png_decode(payload)
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    if payload[:2] == b"\xff\xd8":
        return jpeg_decode(payload)
    raise ValueError("unrecognized image payload (not BMP/PNG/JPEG)")
