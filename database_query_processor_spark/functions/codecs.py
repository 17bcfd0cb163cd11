"""Real (dependency-free) media codecs for the multimodal pipeline:
a PNG decoder/encoder and a WAV probe built on the Python standard
library only (zlib, struct, wave).

Closes the multimodal operators' "real codec" seam without optional
native dependencies: PNG is DEFLATE (zlib, in the stdlib) plus five
byte-level scanline filters (RFC 2083 §6), and WAV headers parse with
the stdlib `wave` module — so an actual pixel-accurate decode needs
no PIL/libav. The Arrow-batched mapInPandas plumbing in
operators/multimodal.py stays identical; only the per-payload decode
body changes. Supported PNG subset: 8-bit depth, color types 0
(grayscale), 2 (RGB), 6 (RGBA), non-interlaced — the overwhelming
majority of real-world PNGs; anything else raises ValueError (a
production pipeline routes those rows to a quarantine column, the
src13 pattern).

No reference analog (the reference engine has three scalar types and
no binary payloads at all).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel
_MAX_PIXEL_BYTES = 64 * 1024 * 1024  # decode cap: reject absurd IHDR dims


def is_png(payload: bytes) -> bool:
    return payload[:8] == _PNG_SIG


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to raw pixels: (width, height, channels,
    pixel_bytes) with pixel_bytes laid out row-major,
    `channels` bytes per pixel. Pixel-accurate: DEFLATE-inflates the
    IDAT stream and inverts the per-scanline filter (None/Sub/Up/
    Average/Paeth)."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    pos, width, height, channels, idat = 8, None, None, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        if pos + 8 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            try:
                width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
            except struct.error as e:  # honest length field, short body
                raise ValueError(f"malformed PNG IHDR chunk: {e}") from e
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    stride = width * channels
    expected = height * (stride + 1)
    if expected > _MAX_PIXEL_BYTES:
        raise ValueError(
            f"PNG dimensions {width}x{height}x{channels} exceed the "
            f"{_MAX_PIXEL_BYTES}-byte decode cap"
        )
    try:
        # bounded inflate: the output size is KNOWN from IHDR, so cap
        # the decompressor there — a few-KB crafted payload with a
        # high-ratio DEFLATE stream (decompression bomb) must raise
        # the quarantine ValueError, not allocate executor memory
        # until the post-hoc length check
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:  # corrupt DEFLATE stream inside valid chunks
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) != expected or d.unconsumed_tail or d.unused_data or not d.eof:
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(height * stride)
    prev_off = -stride
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        if f == 0:  # None
            out[off : off + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                a = out[off + i - channels] if i >= channels else 0
                out[off + i] = (line[i] + a) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                b = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + b) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = out[off + i - channels] if i >= channels else 0
                b = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = out[off + i - channels] if i >= channels else 0
                b = out[prev_off + off + i] if y else 0
                c = out[prev_off + off + i - channels] if (y and i >= channels) else 0
                out[off + i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
    return width, height, channels, bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, channels: int, pixels: bytes, filter_type: int = 0
) -> bytes:
    """Encode raw row-major pixels as a valid PNG. `filter_type`
    selects the scanline filter applied to EVERY row (0-4) — exposing
    all five filters lets the decoder's unfilter paths be exercised
    one by one; real encoders pick per-row, which decode handles the
    same way."""
    try:
        color = {1: 0, 3: 2, 4: 6}[channels]
    except KeyError:
        raise ValueError(f"unsupported channel count {channels}") from None
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer length mismatch")
    lines = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        lines.append(filter_type)
        for i in range(stride):
            x = row[i]
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                v = x
            elif filter_type == 1:
                v = x - a
            elif filter_type == 2:
                v = x - b
            elif filter_type == 3:
                v = x - ((a + b) >> 1)
            elif filter_type == 4:
                v = x - _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter type {filter_type}")
            lines.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """Probe a WAV payload: (n_channels, sample_rate, n_frames,
    sample_width_bytes) via the stdlib wave reader."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    try:
        with wave.open(io.BytesIO(payload)) as w:
            return (
                w.getnchannels(),
                w.getframerate(),
                w.getnframes(),
                w.getsampwidth(),
            )
    except (wave.Error, EOFError, struct.error) as e:  # malformed chunks
        raise ValueError(f"corrupt WAV payload: {e}") from e


def encode_wav(
    n_channels: int, sample_rate: int, frames: bytes, sample_width: int = 2
) -> bytes:
    """Encode raw PCM frames as a WAV payload (test-fixture mirror of
    decode_wav)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()
