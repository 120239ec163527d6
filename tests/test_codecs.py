"""Stdlib-only PNG/WAV codecs: lossless round-trips across every scanline
filter, CRC validation, and unsupported-variant errors. No Spark session
needed — these are the numpy kernels multimodal.py runs inside
mapInPandas."""

from __future__ import annotations

import numpy as np
import pytest

from pbf2json_spark import codecs

RNG = np.random.default_rng(1)


@pytest.mark.parametrize("shape", [(5, 7), (8, 3, 3), (4, 4, 4), (1, 1), (16, 16, 3)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(shape, filter_type):
    img = RNG.integers(0, 256, shape, dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(img, filter_type=filter_type))
    assert out.shape == img.shape
    assert (out == img).all()


def test_png_structure_per_spec():
    b = codecs.encode_png(np.zeros((2, 2), dtype=np.uint8))
    assert b[:8] == b"\x89PNG\r\n\x1a\n"          # spec signature
    assert b[12:16] == b"IHDR" and b[-8:-4] == b"IEND"
    import struct
    w, h, depth, ctype = struct.unpack(">IIBB", b[16:26])
    assert (w, h, depth, ctype) == (2, 2, 8, 0)   # big-endian dims, gray


def test_png_crc_validation():
    bad = bytearray(codecs.encode_png(RNG.integers(0, 256, (3, 3), dtype=np.uint8)))
    bad[30] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(bad))


def test_png_rejects_non_png_and_bad_dtype():
    with pytest.raises(ValueError, match="magic"):
        codecs.decode_png(b"JPEGnope")
    with pytest.raises(ValueError, match="uint8"):
        codecs.encode_png(np.zeros((2, 2), dtype=np.float32))


def test_wav_roundtrip_mono_and_stereo():
    s = RNG.integers(-32768, 32767, 1000).astype(np.int16)
    sr, ch, out = codecs.decode_wav(codecs.encode_wav(s, 22050))
    assert (sr, ch) == (22050, 1) and (out == s).all()
    st = RNG.integers(-100, 100, (500, 2)).astype(np.int16)
    sr2, ch2, out2 = codecs.decode_wav(codecs.encode_wav(st, 8000))
    assert (sr2, ch2) == (8000, 2) and (out2 == st.reshape(-1)).all()
