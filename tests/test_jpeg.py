"""Baseline JPEG codec (analytics/jpeg.py, ITU-T T.81): spec
conformance via near-lossless round-trips (flat q=1 quant tables leave
only DCT/rounding error — any huffman/zigzag/IDCT/predictor bug blows
the diff up by orders of magnitude), exact solid-color forms, sampling
modes, restart intervals, and the progressive/truncation seams."""

import numpy as np
import pytest

from image_pdf_ocr_suite_spark.analytics import jpeg, multimodal
from image_pdf_ocr_suite_spark import fixtures


def _maxdiff(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_solid_gray_is_lossless():
    # constant block -> DC-only spectrum -> exact float IDCT round-trip
    for g in (0, 1, 77, 128, 254, 255):
        arr = np.full((16, 24), g, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
        assert out.shape == (16, 24) and (out == g).all(), g


def test_random_gray_near_lossless():
    rng = np.random.RandomState(3)
    for shape in [(8, 8), (24, 17), (5, 30)]:   # incl. non-multiple-of-8
        arr = rng.randint(0, 256, shape, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
        assert out.shape == arr.shape
        assert _maxdiff(out, arr) <= 2, shape


def test_random_rgb_444_near_lossless():
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (16, 19, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
    # YCbCr int rounding both ways + DCT rounding
    assert _maxdiff(out, arr) <= 4


def test_subsampled_420_solid_exact():
    arr = np.full((20, 20, 3), [10, 200, 30], dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, subsample=True))
    assert _maxdiff(out, arr) <= 1   # chroma constant -> upsample exact


def test_restart_intervals():
    rng = np.random.RandomState(9)
    arr = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, restart_interval=2))
    assert _maxdiff(out, arr) <= 2


def test_quantization_actually_quantizes():
    # coarse tables must lose information (sanity that q=1 wasn't a no-op
    # path) while remaining a valid stream
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quant_luma=50))
    assert out.shape == arr.shape
    assert _maxdiff(out, arr) > 2


def test_corrupt_and_unsupported_seams():
    import struct
    # SOF2 with no scan data is corrupt, not unsupported (progressive
    # decodes for real now)
    sof2 = (b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(sof2)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xd9")        # SOI+EOI, no scan
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(NotImplementedError):
        # arithmetic-coded sequential (SOF9) stays a seam
        sof9 = (b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 11)
                + bytes([8]) + struct.pack(">HH", 8, 8)
                + bytes([1, 1, 0x11, 0]))
        jpeg.decode_jpeg(sof9)
    with pytest.raises(NotImplementedError):
        # 12-bit precision
        sof12 = (b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 11)
                 + bytes([12]) + struct.pack(">HH", 8, 8)
                 + bytes([1, 1, 0x11, 0]))
        jpeg.decode_jpeg(sof12)


def test_progressive_decode_equals_baseline():
    """Every progressive scan path (interleaved DC first+refine, AC
    first with EOB/ZRL, AC successive-approximation refinement with
    correction bits) reconstructs the EXACT coefficients — decoding the
    progressive stream must equal decoding the baseline stream of the
    same raster bit-for-bit."""
    rng = np.random.RandomState(31)
    for shape in [(8, 8), (16, 24), (17, 13), (16, 16, 3), (11, 21, 3)]:
        arr = rng.randint(0, 256, shape, dtype=np.uint8)
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr))
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
        assert (prog == base).all(), shape


def test_progressive_solid_gray_lossless():
    for g in (0, 77, 255):
        arr = np.full((16, 16), g, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr))
        assert (out == g).all(), g


def test_progressive_sparse_spectra_exercise_zrl_and_eob():
    """Long zero runs between significant coefficients force ZRL symbols
    (first pass) and ZRL-with-correction-bits (refinement pass)."""
    arr = np.zeros((8, 8), dtype=np.uint8)
    arr[7, 7] = 255                     # energy in the highest frequencies
    arr[0, 0] = 255
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr))
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
    assert (prog == base).all()


def test_progressive_truncation_quarantines():
    full = jpeg.encode_jpeg_progressive(
        np.random.RandomState(1).randint(0, 256, (16, 16), dtype=np.uint8))
    for cut in (30, len(full) // 3, len(full) - 4):
        with pytest.raises((ValueError, NotImplementedError)):
            jpeg.decode_jpeg(full[:cut])


def test_decode_image_dispatches_jpeg():
    arr = np.full((16, 16), 99, dtype=np.uint8)
    out = multimodal.decode_image(jpeg.encode_jpeg(arr))
    assert (out == 99).all()
    # fixture helper closed form
    out = multimodal.decode_image(fixtures.jpeg_solid_gray(16, 16, 123))
    assert out.shape == (16, 16) and (out == 123).all()
    # WebP stays behind the seam
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"RIFF\x00\x00\x00\x00WEBP" + bytes(16))


def test_truncated_streams_raise_valueerror_not_indexerror():
    """Quarantine contract: a decode kernel routes bad payloads to an
    err column — truncation anywhere in the stream must surface as
    ValueError, never IndexError/struct.error task failures."""
    full = jpeg.encode_jpeg(np.full((16, 16), 50, dtype=np.uint8))
    for cut in (3, 10, 25, len(full) // 2, len(full) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            jpeg.decode_jpeg(full[:cut])


def test_image_features_quarantines_truncated_jpeg(spark):
    full = jpeg.encode_jpeg(np.full((16, 16), 50, dtype=np.uint8))
    df = spark.createDataFrame(
        [("ok", bytearray(full)), ("cut", bytearray(full[: len(full) // 2]))],
        "id string, image binary")
    got = {r["id"]: r for r in multimodal.image_features(df).collect()}
    assert got["ok"]["err"] is None and got["ok"]["mean_lum"] == 50.0
    assert got["cut"]["format"] == "jpg" and got["cut"]["err"] is not None


def test_decode_bomb_guards():
    """Untrusted-crawl hardening: header-declared giant dimensions and
    over-expanding pixel streams raise ValueError before allocation."""
    import struct
    import zlib
    # JPEG: 60000x60000 header
    sof = (b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 11)
           + bytes([8]) + struct.pack(">HH", 60000, 60000)
           + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(sof)
    # PNG: small header, over-long (bomb-style) pixel stream
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 100000)   # 2x2 gray needs 6 bytes
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        multimodal.decode_image(payload)
    # PNG: giant header dims
    ihdr_big = struct.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_big)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
               + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        multimodal.decode_image(payload)


def test_subsampled_422_decode_path():
    """4:2:2 (h2v1) chroma: solid colors exact, random rasters within
    luma tolerance on the Y channel (chroma is genuinely lossy)."""
    arr = np.full((20, 24, 3), [200, 40, 90], dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, subsample="h2v1"))
    assert out.shape == arr.shape
    assert _maxdiff(out, arr) <= 1
    rng = np.random.RandomState(13)
    arr = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, subsample="h2v1"))
    # valid stream with plausible content; chroma averaging is lossy, so
    # only a loose luminance check applies
    ly = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    oy = 0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
    assert np.abs(ly - oy).max() <= 16


def test_baseline_noninterleaved_equals_interleaved():
    """Legal multi-scan baseline JPEG (one SOS per component, T.81
    A.2.2): the quantized coefficients are identical to the interleaved
    encoding of the same raster, so the decode must match bit-for-bit —
    including 4:2:0, where the luma scan is the single-component-with-
    h/v>1 case that walks the component raster block grid, not the MCU
    grid (the r4 ADVICE seam, now implemented instead of guarded)."""
    rng = np.random.RandomState(41)
    for shape, sub in [((16, 24), False), ((17, 13), False),
                       ((16, 16, 3), False), ((11, 21, 3), False),
                       ((20, 24, 3), True), ((18, 14, 3), "h2v1")]:
        arr = rng.randint(0, 256, shape, dtype=np.uint8)
        non = jpeg.decode_jpeg(
            jpeg.encode_jpeg(arr, subsample=sub, interleaved=False))
        inter = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, subsample=sub))
        assert non.shape == arr.shape
        assert (non == inter).all(), (shape, sub)


def test_baseline_noninterleaved_solid_exact():
    arr = np.full((24, 40, 3), [200, 40, 90], dtype=np.uint8)
    out = jpeg.decode_jpeg(
        jpeg.encode_jpeg(arr, subsample=True, interleaved=False))
    assert _maxdiff(out, arr) <= 1


def test_baseline_noninterleaved_restart_intervals():
    """DRI in the non-interleaved form counts BLOCKS within each scan."""
    rng = np.random.RandomState(43)
    arr = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    non = jpeg.decode_jpeg(jpeg.encode_jpeg(
        arr, subsample=True, interleaved=False, restart_interval=3))
    inter = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, subsample=True))
    assert (non == inter).all()


def test_baseline_multiscan_truncation_quarantines():
    """A multi-scan stream cut mid-way must surface as ValueError (or a
    partial-coverage decode must not crash with IndexError) — the
    quarantine contract the r4 guard protected, kept by the real
    implementation."""
    full = jpeg.encode_jpeg(
        np.random.RandomState(7).randint(0, 256, (16, 16, 3),
                                         dtype=np.uint8),
        subsample=True, interleaved=False)
    for cut in (30, len(full) // 2, len(full) - 4):
        try:
            jpeg.decode_jpeg(full[:cut])
        except (ValueError, NotImplementedError):
            pass                         # quarantine path — acceptable
        # a clean partial decode (missing later scans) is also legal
