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
