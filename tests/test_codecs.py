"""Real-codec tests: the dependency-free PNG decoder/encoder and WAV
probe (functions/codecs.py) plus the Spark decode path that uses them
(operators/multimodal.py:decode_media_batch). Closes the multimodal
'real codec' seam: these decode actual pixel/frame bytes, while the
fake-codec path keeps the SQL value oracle."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from database_query_processor_spark.functions import codecs


def _gradient_rgb(w: int, h: int) -> bytes:
    """Pixels where Sub/Up/Average/Paeth filters all produce distinct
    encodings (monotone ramps in both axes plus noise)."""
    rng = random.Random(7)
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes(
                ((x * 31 + y * 17 + c * 11 + rng.randrange(5)) & 0xFF)
                for c in range(3)
            )
    return bytes(out)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type):
    """decode must invert each of the five scanline filters exactly."""
    w, h = 13, 9  # odd sizes: no accidental stride alignment
    px = _gradient_rgb(w, h)
    payload = codecs.encode_png(w, h, 3, px, filter_type=filter_type)
    assert codecs.is_png(payload)
    gw, gh, gch, gpx = codecs.decode_png(payload)
    assert (gw, gh, gch) == (w, h, 3)
    assert gpx == px


def test_png_all_filters_agree():
    """The same image encoded under all five filters decodes to ONE
    pixel buffer — a cross-check that each unfilter path inverts its
    own filter rather than compensating for a shared bug."""
    w, h = 8, 5
    px = _gradient_rgb(w, h)
    decoded = {
        codecs.decode_png(codecs.encode_png(w, h, 3, px, filter_type=f))[3]
        for f in range(5)
    }
    assert decoded == {px}


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_color_types(channels):
    w, h = 6, 4
    px = bytes((i * 7) & 0xFF for i in range(w * h * channels))
    gw, gh, gch, gpx = codecs.decode_png(
        codecs.encode_png(w, h, channels, px, filter_type=4)
    )
    assert (gw, gh, gch, gpx) == (w, h, channels, px)


def test_png_known_vector():
    """A hand-checkable 2x1 grayscale image: pixels (10, 250), Sub
    filter stores the second byte as 250-10=240; the decoder must add
    the left neighbor back mod 256."""
    payload = codecs.encode_png(2, 1, 1, bytes([10, 250]), filter_type=1)
    # pull the raw filtered scanline back out of the IDAT chunk
    idat_off = payload.index(b"IDAT") + 4
    (length,) = struct.unpack(">I", payload[idat_off - 8 : idat_off - 4])
    raw = zlib.decompress(payload[idat_off : idat_off + length])
    assert raw == bytes([1, 10, 240])  # filter byte, first px, delta
    assert codecs.decode_png(payload)[3] == bytes([10, 250])


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"JFIF not a png")
    good = codecs.encode_png(2, 2, 3, bytes(12))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_png(good[:20])
    # 16-bit depth: patch IHDR's depth byte and re-checksum
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        good[:8]
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError, match="bit depth"):
        codecs.decode_png(bad)


def test_wav_roundtrip():
    frames = struct.pack("<8h", *[0, 1000, -1000, 32767, -32768, 5, -5, 0])
    payload = codecs.encode_wav(2, 16000, frames, sample_width=2)
    assert codecs.is_wav(payload) and not codecs.is_png(payload)
    assert codecs.decode_wav(payload) == (2, 16000, 4, 2)  # 8 samples / 2 ch


def test_decode_media_batch_real_payloads(spark):
    """The REAL decode path end-to-end in Spark: PNG and WAV payloads
    through Arrow-batched mapInPandas, pixel-exact dims and frame
    counts out, and the plan stays MapInPandas (never row-at-a-time
    Python)."""
    from database_query_processor_spark.operators.multimodal import (
        decode_media_batch,
    )
    from database_query_processor_spark.plans.inspect import explain_str

    png = codecs.encode_png(13, 9, 3, _gradient_rgb(13, 9), filter_type=4)
    wav = codecs.encode_wav(1, 8000, struct.pack("<4h", 1, 2, 3, 4))
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav))], "doc_id long, payload binary"
    )
    out = decode_media_batch(df)
    plan = explain_str(out, "simple")
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].kind == "image" and (rows[1].width, rows[1].height) == (13, 9)
    assert rows[1].channels == 3 and rows[1].n_frames == 1
    assert rows[1].mean_val == pytest.approx(
        sum(_gradient_rgb(13, 9)) / (13 * 9 * 3)
    )
    assert rows[2].kind == "audio"
    assert (rows[2].channels, rows[2].sample_rate, rows[2].n_frames) == (1, 8000, 4)


def test_corrupt_payloads_raise_value_error_not_codec_errors():
    """The quarantine contract: magic-valid but corrupt payloads must
    raise ValueError (routable, the src13 pattern), never leak
    zlib.error / wave.Error and kill the task."""
    good = codecs.encode_png(4, 4, 3, bytes(48))
    # corrupt the IDAT DEFLATE bytes in place, keeping chunk framing
    idat_at = good.index(b"IDAT") + 4
    bad_png = good[:idat_at] + bytes(8) + good[idat_at + 8 :]
    with pytest.raises(ValueError, match="IDAT"):
        codecs.decode_png(bad_png)
    # RIFF/WAVE magic with a garbage body
    bad_wav = b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE" + b"\x00" * 32
    with pytest.raises(ValueError, match="WAV"):
        codecs.decode_wav(bad_wav)
    # unsupported channel count is a ValueError, not a KeyError
    with pytest.raises(ValueError, match="channel"):
        codecs.encode_png(2, 2, 2, bytes(8))
