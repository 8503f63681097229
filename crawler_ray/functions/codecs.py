"""Image codecs for the ``bytes``/``fmt`` columns of the images table.

The sandbox has no PIL/libjpeg/libwebp, so:

- ``png`` is a REAL minimal PNG codec (RGB8, zlib, filter 0) — bytes produced
  here are valid PNG files decodable by any standard reader.
- ``jpeg`` and ``webp`` are clearly-marked DETERMINISTIC STAND-INS: a lossy
  per-channel quantization (6 / 7 bits) wrapped in a tagged container. They
  model exactly what the pipeline needs from a lossy codec — decode(encode(x))
  ≠ x but PSNR(decode(encode(x)), x) ≥ 40 dB — so the per-row PSNR invariant
  (BASELINE.json input_hint) is exercised for real. Swap ``encode_image`` /
  ``decode_image`` for PIL on a cluster with image libs; every other stage is
  format-agnostic over (pixels, fmt).

All functions are pure and deterministic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FAKE_SIG = {"jpeg": b"FJPG", "webp": b"FWBP"}  # stand-in container magics
_FAKE_BITS = {"jpeg": 6, "webp": 7}


# ---------------------------------------------------------------------------
# real PNG (RGB8)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8, filter 0)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    assert c == 3, "RGB8 only"
    raw = np.concatenate([np.zeros((h, 1), np.uint8), px.reshape(h, w * 3)], axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports 8-bit RGB, all 5 filter types."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, idat, w, h = 8, b"", 0, 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "RGB8 only"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        row = np.frombuffer(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], np.uint8)
        f = raw[y * (stride + 1)]
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub
            cur = row.astype(np.int64)
            acc = out[y]
            acc[:bpp] = row[:bpp]
            for x in range(bpp, stride):
                acc[x] = (cur[x] + acc[x - bpp]) & 0xFF
        elif f == 2:  # Up
            prev = out[y - 1] if y else np.zeros(stride, np.uint8)
            out[y] = (row.astype(np.int64) + prev) & 0xFF
        elif f == 3:  # Average
            prev = out[y - 1] if y else np.zeros(stride, np.uint8)
            acc = out[y]
            for x in range(stride):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (int(row[x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            prev = out[y - 1] if y else np.zeros(stride, np.uint8)
            acc = out[y]
            for x in range(stride):
                a = int(acc[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                acc[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# deterministic lossy stand-ins (no libjpeg/libwebp in this sandbox)


def _encode_fake_lossy(pixels: np.ndarray, fmt: str) -> bytes:
    bits = _FAKE_BITS[fmt]
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    shift = 8 - bits
    q = (px.astype(np.uint16) >> shift).astype(np.uint8)  # quantize (lossy)
    header = _FAKE_SIG[fmt] + struct.pack(">IIB", w, h, bits)
    return header + zlib.compress(q.tobytes(), 6)


def _decode_fake_lossy(data: bytes, fmt: str) -> np.ndarray:
    assert data[:4] == _FAKE_SIG[fmt], f"not a {fmt} stand-in payload"
    w, h, bits = struct.unpack(">IIB", data[4:13])
    shift = 8 - bits
    q = np.frombuffer(zlib.decompress(data[13:]), np.uint8).reshape(h, w, 3)
    # dequantize to bucket midpoint
    return ((q.astype(np.uint16) << shift) | (1 << (shift - 1) if shift else 0)).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# dispatch


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """(h, w, 3) uint8 → encoded bytes for ``fmt`` ∈ {png, jpeg, webp}."""
    if fmt == "png":
        return encode_png(pixels)
    if fmt in _FAKE_SIG:
        return _encode_fake_lossy(pixels, fmt)
    raise ValueError(f"unsupported fmt: {fmt}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Encoded bytes → (h, w, 3) uint8 pixels."""
    if fmt == "png":
        return decode_png(data)
    if fmt in _FAKE_SIG:
        return _decode_fake_lossy(data, fmt)
    raise ValueError(f"unsupported fmt: {fmt}")


def sniff_fmt(data: bytes) -> str:
    """Magic-byte sniffing (the reference sniffs encodings by BOM,
    FileHelper.cs:273-314; here: container magic → fmt)."""
    if data[:8] == _PNG_SIG:
        return "png"
    for fmt, sig in _FAKE_SIG.items():
        if data[:4] == sig:
            return fmt
    return "bin"


_TEXT_BOMS = (
    # order matters: UTF-32 BOMs contain the UTF-16 ones as prefixes
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def sniff_text_encoding(data: bytes) -> str:
    """BOM-first text-encoding detection (``FileHelper.cs:273-314``: the
    reference checks UTF-8/Unicode/BigEndian BOMs, then falls back to a
    default encoding). Without a BOM, a zero-byte parity heuristic catches
    BOM-less UTF-16 (ASCII-heavy text has NULs in every other byte); the
    final default is UTF-8."""
    for bom, enc in _TEXT_BOMS:
        if data[: len(bom)] == bom:
            return enc
    probe = data[:512]
    if len(probe) >= 4 and probe.count(b"\x00"):
        evens = probe[0::2].count(0)
        odds = probe[1::2].count(0)
        half = max(1, len(probe) // 2)
        if odds / half > 0.7 and evens == 0:
            return "utf-16-le"
        if evens / half > 0.7 and odds == 0:
            return "utf-16-be"
    return "utf-8"


def decode_text(data: bytes) -> str:
    """bytes → str across the sniffed encoding; tolerant fallback chain
    (utf-8 strict → gb18030 → latin-1, mirroring the reference's
    Encoding.Default tolerance without platform dependence)."""
    enc = sniff_text_encoding(data)
    if enc != "utf-8-sig":  # the -sig codec strips its own BOM
        for bom, benc in _TEXT_BOMS:
            if benc == enc and data[: len(bom)] == bom:
                data = data[len(bom):]
                break
    try:
        return data.decode(enc)
    except (UnicodeDecodeError, LookupError):
        pass
    for fallback in ("gb18030", "latin-1"):
        try:
            return data.decode(fallback)
        except UnicodeDecodeError:  # pragma: no cover - latin-1 never fails
            continue
    return data.decode("latin-1", errors="replace")  # pragma: no cover


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
