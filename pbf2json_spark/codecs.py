"""Real media codecs, stdlib-only (the container has no Pillow/librosa,
but PNG needs only zlib + numpy and WAV/PCM is in the standard library).

PNG (RFC 2083 / ISO 15948 subset): 8-bit depth, color types 0 (grayscale),
2 (RGB) and 6 (RGBA), no interlace — the subset every screenshot/thumbnail
pipeline actually emits. The decoder implements all five scanline filters
(None/Sub/Up/Average/Paeth); the encoder can emit any fixed filter, which
the tests use to prove the decoder against every filter path. Chunk CRCs
are validated with zlib.crc32 (the spec's CRC-32).

WAV: PCM 16-bit via the stdlib `wave` module.

These kernels run inside Arrow-batched mapInPandas (multimodal.py); they
are deliberately numpy-vectorized per image row, not per pixel.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, 3|4) uint8 array → PNG bytes. `filter_type` picks
    the per-scanline filter (0..4) — functionally irrelevant (lossless),
    kept as a knob so tests exercise every decoder filter path."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)

    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        line = img[y]
        if filter_type == 0:
            filt = line
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.uint8), line[:-1]])
            filt = (line.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (line.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.uint8), line[:-1]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (line.astype(np.int16) - avg).astype(np.uint8)
        else:  # Paeth
            left = np.vstack([np.zeros((1, ch), np.uint8), line[:-1]])
            ul = np.vstack([np.zeros((1, ch), np.uint8), prev[:-1]])
            pred = _paeth(left.astype(np.int16), prev.astype(np.int16), ul.astype(np.int16))
            filt = (line.astype(np.int16) - pred).astype(np.uint8)
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = line
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w) or (h, w, ch) uint8 array. Validates magic and
    chunk CRCs; supports the encode_png subset (8-bit, color types 0/2/6,
    no interlace), which is also the common-crawl thumbnail subset."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={ctype} "
            f"compression={comp} filter_method={filt} interlace={interlace})"
        )
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")

    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            cur = line
        elif ft == 2:  # Up — vectorized
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ft in (1, 3, 4):
            # left-dependent filters need a sequential pixel scan
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter byte {ft}")
        out[y] = cur.reshape(w, ch)
        prev = cur
    return out[:, :, 0] if ch == 1 else out


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono/stereo samples → WAV bytes (PCM 16-bit)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (sample_rate, n_channels, int16 samples flat array)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM 16-bit WAV is supported")
        sr = f.getframerate()
        ch = f.getnchannels()
        frames = f.readframes(f.getnframes())
    return sr, ch, np.frombuffer(frames, dtype=np.int16)
