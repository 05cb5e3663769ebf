"""Exact-value tests for the stdlib PNG/WAV codecs (ner_spark/codecs.py).

The filter tests build PNG byte streams BY HAND in the test (independent
chunk writer + the spec's forward-filter arithmetic transcribed directly
from RFC 2083 §6), so the decoder is checked against the spec, not
against our own encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ner_spark.codecs import decode_png, decode_wav, encode_png, encode_wav


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_bytes(img: np.ndarray, filters: list[int], color_type: int = 0,
               plte: bytes | None = None) -> bytes:
    """Hand-assembled PNG with a chosen filter per scanline (forward
    filtering per the PNG spec, independently of codecs.encode_png)."""
    h, w = img.shape[:2]
    bpp = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
    flat = img.reshape(h, w * bpp).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * bpp, np.int32)
    for y, ftype in zip(range(h), filters):
        line = flat[y]
        out = np.zeros(w * bpp, np.int32)
        for x in range(w * bpp):
            left = line[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                out[x] = line[x]
            elif ftype == 1:
                out[x] = (line[x] - left) & 0xFF
            elif ftype == 2:
                out[x] = (line[x] - up) & 0xFF
            elif ftype == 3:
                out[x] = (line[x] - (left + up) // 2) & 0xFF
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[x] = (line[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte)
    return body + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def test_png_roundtrip_gray():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_rgb_rgba():
    rng = np.random.default_rng(8)
    for c in (3, 4):
        img = rng.integers(0, 256, (9, 5, c), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type_inverts(ftype):
    rng = np.random.default_rng(100 + ftype)
    img = rng.integers(0, 256, (6, 11), dtype=np.uint8)
    data = _png_bytes(img, [ftype] * 6)
    assert np.array_equal(decode_png(data), img)


def test_png_mixed_filters_rgb():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    data = _png_bytes(img, [0, 1, 2, 3, 4], color_type=2)
    assert np.array_equal(decode_png(data), img)


def test_png_palette():
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    got = decode_png(_png_bytes(idx, [0, 0], color_type=3, plte=plte))
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [0, 255, 0]]], np.uint8
    )
    assert np.array_equal(got, expect)


def test_png_crc_corruption_raises():
    data = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    data[20] ^= 0xFF  # flip a bit inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_bad_signature_and_interlace_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8not-a-png")
    img = np.zeros((2, 2), np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # interlace=1
    data = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(data)


def test_wav_roundtrip_8bit_and_16bit():
    rng = np.random.default_rng(3)
    s8 = rng.integers(0, 256, 777, dtype=np.uint8)
    got, rate = decode_wav(encode_wav(s8, 16000))
    assert rate == 16000 and got.dtype == np.uint8
    assert np.array_equal(got, s8)
    s16 = rng.integers(-(2**15), 2**15, 500).astype(np.int16)
    got16, rate16 = decode_wav(encode_wav(s16, 44100))
    assert rate16 == 44100 and got16.dtype == np.int16
    assert np.array_equal(got16, s16)


def test_wav_stereo_keeps_channel_zero():
    import io
    import wave

    left = np.arange(100, dtype=np.int16)
    right = -left
    inter = np.empty(200, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(inter.astype("<i2").tobytes())
    got, rate = decode_wav(buf.getvalue())
    assert rate == 8000
    assert np.array_equal(got, left)


def test_container_and_stub_decode_agree():
    """The same pixel/sample stream decodes identically whether it rides
    the x-fake stub or a real container — the invariant that makes the
    registry entries comparable across the format mix."""
    from ner_spark.multimodal import FAKE_FORMAT, decode_audio, decode_image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    meta_fake = {"format": FAKE_FORMAT, "width": 31, "height": 23}
    meta_png = {"format": "png", "width": 31, "height": 23}
    assert np.array_equal(
        decode_image(img.tobytes(), meta_fake),
        decode_image(encode_png(img), meta_png),
    )
    samples = rng.integers(0, 256, 640, dtype=np.uint8)
    assert np.array_equal(
        decode_audio(samples.tobytes(), {"format": FAKE_FORMAT}),
        decode_audio(encode_wav(samples, 16000), {"format": "wav"}),
    )


def test_png_luma_collapse_is_integer_deterministic():
    from ner_spark.multimodal import decode_image

    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    img[0, 1] = [0, 255, 0]
    img[1, 0] = [0, 0, 255]
    img[1, 1] = [10, 20, 30]
    got = decode_image(encode_png(img), {"format": "png"})
    expect = np.array(
        [
            [255 * 299 // 1000, 255 * 587 // 1000],
            [255 * 114 // 1000, (10 * 299 + 20 * 587 + 30 * 114) // 1000],
        ],
        np.uint8,
    )
    assert np.array_equal(got, expect)
