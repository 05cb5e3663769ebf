"""Stdlib-only media codecs (round-3 VERDICT item 4): a real PNG
decoder/encoder built on ``zlib`` and a WAV decoder/encoder built on the
stdlib ``wave`` module, so the multimodal operators exercise genuine
container formats without any non-baked-in library. JPEG (and every other
codec-library format) remains a documented ``NotImplementedError``
boundary in multimodal.decode_image.

PNG scope (everything the spec requires for the formats we emit, plus the
full filter set any third-party encoder may use):
- bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette), 6 (RGBA);
- all five scanline filters (None/Sub/Up/Average/Paeth) on decode;
- no Adam7 interlace (raises — the progressive layout is a streaming
  concern no batch pipeline needs);
- CRC verified on every chunk.

The encoder always writes filter 0 (None) scanlines — valid PNG, and it
keeps the common decode path (our own round-trips) a pure memcpy;
filters 1–4 are exercised by unit tests with independently hand-filtered
fixtures (tests/test_codecs.py).

Decoded images are returned as (h, w[, c]) uint8; multimodal collapses
color to luma so downstream feature schemas stay rank-2.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
def _chunks(data: bytes):
    pos = len(_PNG_SIG)
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        pos += 12 + length


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Invert per-scanline filtering. Filter 0 (our encoder's output) and
    filters 2/1 stay vectorized; Average/Paeth fall back to a per-byte
    loop — unit-test-only territory for payloads we produce."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: prefix sum (mod 256) along each bpp lane
            cur = line.reshape(-1, bpp)
            out[y] = (np.cumsum(cur, axis=0) & 0xFF).reshape(-1)
        elif ftype == 3:  # Average
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
            out[y] = cur
        elif ftype == 4:  # Paeth
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"PNG filter type {ftype} is invalid")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for gray, (h, w, 3/4) for RGB(A);
    palette images resolve through PLTE to (h, w, 3)."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("PNG: unknown compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7-interlaced PNG")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expect = height * (width * bpp + 1)
    if len(raw) != expect:
        raise ValueError(f"PNG: decompressed {len(raw)} bytes, want {expect}")
    flat = _unfilter(raw, height, width, bpp)
    if color_type == 0:
        return flat.reshape(height, width)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        return palette[flat.reshape(height, width)]
    return flat.reshape(height, width, bpp)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, 3/4) → PNG bytes (filter 0, zlib -1)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 0
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"cannot PNG-encode array of shape {a.shape}")
    h, w = a.shape[:2]
    stride = w * _CHANNELS[color_type]
    body = a.reshape(h, stride)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), body], axis=1).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (PCM via stdlib wave)
# ---------------------------------------------------------------------------
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples, sample_rate). 8-bit PCM → uint8, 16-bit PCM
    → int16; multi-channel keeps channel 0 (the pipelines are mono)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        n = wf.getnframes()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        channels = wf.getnchannels()
        frames = wf.readframes(n)
    if width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8)
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    else:
        raise NotImplementedError(f"WAV sample width {width} (only 1/2 bytes)")
    if channels > 1:
        samples = samples[::channels]
    return samples, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """uint8 (8-bit PCM) or int16 (16-bit PCM) mono samples → WAV bytes."""
    a = np.asarray(samples)
    if a.dtype == np.uint8:
        width, payload = 1, a.tobytes()
    elif a.dtype == np.int16:
        width, payload = 2, a.astype("<i2").tobytes()
    else:
        raise ValueError(f"cannot WAV-encode dtype {a.dtype} (uint8/int16)")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(width)
        wf.setframerate(sample_rate)
        wf.writeframes(payload)
    return buf.getvalue()
