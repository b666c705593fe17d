"""Property-based tests (hypothesis): payload round-trip under arbitrary
document shapes, and reference-model invariants that must hold for ANY
generated document — not just the curated fixtures."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from image_pdf_ocr_suite_spark import backends, refmodel
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.payload import Document, Page, Word

CFG = ExtractConfig()

word_text = st.one_of(
    st.none(),
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=0x30FF,
                                   blacklist_characters="\\"), max_size=8),
)

words = st.builds(
    Word,
    block=st.integers(1, 3), par=st.integers(1, 2),
    line=st.integers(1, 4), word=st.integers(1, 6),
    left=st.floats(0, 200, allow_nan=False), top=st.floats(0, 200, allow_nan=False),
    width=st.floats(1, 50, allow_nan=False), height=st.floats(1, 30, allow_nan=False),
    conf_base=st.floats(-1, 100, allow_nan=False),
    conf_pre=st.floats(-1, 100, allow_nan=False),
    text=word_text,
)

pages = st.builds(
    Page,
    width_px=st.integers(10, 120), height_px=st.integers(10, 120),
    words=st.lists(words, max_size=12),
    ink=st.integers(0, 254),
)

documents = st.builds(Document, pages=st.lists(pages, max_size=4))


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(documents, st.sampled_from([0, 1, 6]), st.one_of(st.none(), st.just("pw")))
def test_payload_roundtrip(doc, level, password):
    raw = spdf.encode(doc, password=password, level=level)
    out = spdf.decode(raw, password=password)
    assert len(out.pages) == len(doc.pages)
    for p_in, p_out in zip(doc.pages, out.pages):
        assert (p_out.width_px, p_out.height_px) == (p_in.width_px, p_in.height_px)
        assert [w.to_json() for w in p_out.words] == [w.to_json() for w in p_in.words]


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(documents)
def test_extract_text_shape_invariants(doc):
    """For ANY document: trailing newline; header per page (post-strip can
    only drop EMPTY trailing pages, never headers); empty doc -> "\\n"."""
    text = refmodel.extract_text(spdf.encode(doc), CFG)
    assert text.endswith("\n")
    if not doc.pages:
        assert text == "\n"
    else:
        assert text.count("--- ページ ") == len(doc.pages)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(documents)
def test_spans_always_visible_in_text(doc):
    """Any span's text appears in the page's rendered text: spans require
    conf>=50 >= legibility floor 30, so a span word is always rendered."""
    payload = spdf.encode(doc)
    text = refmodel.extract_text(payload, CFG)
    for s in refmodel.extract_spans(payload, CFG):
        assert s["text"] in text
        assert s["conf"] >= 50.0
        assert s["fontsize"] == s["height"] * 0.8


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pages)
def test_adaptive_winner_never_below_base(page):
    """The adaptive result's average confidence is >= the base average
    (strict-> winner rule can only improve or keep, ocr.py:63-79)."""
    img = backends.rasterize(page)
    base_avg = refmodel.compute_average_confidence(backends.ocr_boxes(img))
    result = refmodel.perform_adaptive_ocr(img, CFG)
    assert result.average_confidence >= base_avg


# ---- multimodal codecs: encode/decode round-trips for ANY content ------

import numpy as np


def _bmp(arr):
    import struct
    h, w = arr.shape[:2]
    stride = ((3 * w + 3) // 4) * 4
    body = bytearray()
    for row in arr[::-1]:
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])
        line += b"\x00" * (stride - len(line))
        body += line
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return bytes(hdr + body)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_any_shape(w, h, seed):
    from image_pdf_ocr_suite_spark.analytics import multimodal
    arr = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert (multimodal.decode_image(_bmp(arr)) == arr).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 3), st.integers(8000, 48000), st.integers(1, 400),
       st.integers(0, 2**32 - 1))
def test_wav_roundtrip_any_shape(channels, rate, n_frames, seed):
    import struct

    from image_pdf_ocr_suite_spark.analytics import multimodal
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, (n_frames, channels)).astype("<i2")
    data = samples.tobytes()
    raw = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                   rate * channels * 2, channels * 2, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    got_rate, got_ch, got = multimodal.decode_wav(raw)
    assert (got_rate, got_ch) == (rate, channels)
    assert got.shape == (n_frames, channels)
    assert np.allclose(got * 32768.0, samples.astype(np.float64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(["jpn", "eng", "deu", "fra", "osd"]),
                min_size=1, max_size=4))
def test_parse_langs_accepts_any_valid_combo(parts):
    from image_pdf_ocr_suite_spark.backends import parse_langs
    assert parse_langs("+".join(parts)) == tuple(parts)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=12))
def test_parse_langs_never_crashes_weird_input(s):
    import pytest as _pytest

    from image_pdf_ocr_suite_spark.backends import parse_langs
    parts = s.split("+")
    valid = all(len(p) == 3 and p.isalpha() and p.islower() for p in parts)
    if valid:
        assert parse_langs(s) == tuple(parts)
    else:
        with _pytest.raises(ValueError):
            parse_langs(s)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(2, 24), st.integers(2, 24), st.integers(0, 3),
       st.integers(0, 2**31 - 1))
def test_png_roundtrip_any_shape(w, h, mode, seed):
    """PNG decode inverts the test-side filtered encoder for ANY raster
    shape, channel count, and filter sequence."""
    import numpy as np
    from image_pdf_ocr_suite_spark.analytics import multimodal
    from tests.test_analytics import _png_encode_filtered
    rng = np.random.RandomState(seed)
    shape = [(h, w), (h, w, 2), (h, w, 3), (h, w, 4)][mode]
    arr = rng.randint(0, 256, shape, dtype=np.uint8)
    filters = [int(rng.randint(0, 5)) for _ in range(h)]
    out = multimodal.decode_image(_png_encode_filtered(arr, filters))
    assert out.shape == arr.shape and (out == arr).all()


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 40), st.integers(1, 40), st.booleans(),
       st.integers(0, 6), st.integers(0, 2**31 - 1))
def test_jpeg_roundtrip_any_shape(w, h, gray, dri, seed):
    """Baseline JPEG with flat q=1 tables stays within DCT-rounding
    tolerance for ANY shape (incl. non-multiple-of-8 + MCU padding),
    grayscale or RGB, with or without restart intervals."""
    import numpy as np
    from image_pdf_ocr_suite_spark.analytics import jpeg
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, restart_interval=dri))
    assert out.shape == arr.shape
    tol = 2 if gray else 4
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= tol


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                min_size=1, max_size=60),
       st.integers(1, 20))
def test_watermark_thinning_invariants(events, delay):
    """Greedy anchor thinning (driver-side replica of the kernel's
    per-key walk): kept events are pairwise > delay apart, every
    dropped event is within delay AFTER a kept one, and the first
    event per key always survives."""
    import numpy as np
    per_key: dict[int, list[int]] = {}
    for k, t in sorted(events, key=lambda e: (e[0], e[1])):
        per_key.setdefault(k, []).append(t)
    for ts in per_key.values():
        arr = np.asarray(ts)
        kept = []
        i = 0
        while i < len(arr):
            kept.append(i)
            i = int(np.searchsorted(arr, arr[i] + delay, side="right"))
        kt = [arr[i] for i in kept]
        assert kept[0] == 0
        assert all(b - a > delay for a, b in zip(kt, kt[1:]))
        for j, t in enumerate(arr):
            if j not in kept:
                prior = [a for a in kt if a <= t]
                assert prior and t - prior[-1] <= delay


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 32), st.integers(1, 32), st.booleans(),
       st.integers(0, 2**31 - 1))
def test_progressive_equals_baseline_any_shape(w, h, gray, seed):
    """Progressive reconstruction recovers the exact coefficient matrix
    for ANY raster — decode(progressive stream) == decode(baseline
    stream) bit-for-bit."""
    import numpy as np
    from image_pdf_ocr_suite_spark.analytics import jpeg
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(arr))
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
    assert (prog == base).all()


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500)),
                min_size=1, max_size=40),
       st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500),
                          st.integers(0, 99)),
                min_size=1, max_size=25),
       st.sampled_from([7.0, 60.0, 1000.0]))
def test_asof_bucketed_equals_plain_reference(left_rows, right_rows, width):
    """Bucketed as-of must equal the plain per-key backward search for
    ANY data — driver-side reference replica of both plans' contract
    (the Spark-level equivalence is pinned separately in test_asof)."""
    # unique right (k, ts): the operator's caller contract
    seen, uniq = set(), {}
    for k, ts, v in right_rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq.setdefault(k, []).append((ts, float(v)))
    for lst in uniq.values():
        lst.sort()

    def plain(k, t):
        best = None
        for ts, v in uniq.get(k, []):
            if ts <= t:
                best = v
        return best

    def bucketed(k, t):
        # within-bucket backward search, else latest tail of any
        # earlier bucket — the same decomposition asof.py materializes
        b = int(t // width)
        cands = [(ts, v) for ts, v in uniq.get(k, [])
                 if ts <= t and int(ts // width) == b]
        if cands:
            return cands[-1][1]
        tails = [(ts, v) for ts, v in uniq.get(k, [])
                 if int(ts // width) < b]
        return tails[-1][1] if tails else None

    for k, t in left_rows:
        assert plain(k, t) == bucketed(k, t), (k, t, width)
