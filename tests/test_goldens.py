"""Golden-parquet oracle integrity.

The committed files under golden/sf0.01/ ARE the driver's oracle for the
flagship extraction queries, so two things must hold at all times:

1. regenerating them from the current fixtures + reference model yields
   exactly the committed bytes' values (drift in fixtures, refmodel, or
   payload format without a deliberate golden refresh = loud failure);
2. the independent HTML golden model (ground-truth paragraphs + documented
   thresholds) agrees with the DOM-density parser the pipeline actually
   runs — the two are separate implementations by design.

The Spark-vs-golden value comparison itself runs in
tests/test_oracle_parity.py (the golden entries are ordinary oracle_sql()
rows there).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from image_pdf_ocr_suite_spark import fixtures, goldens
from image_pdf_ocr_suite_spark.kernels.html import extract_main_text

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def regenerated():
    return goldens.build_golden_frames(SF_DIR)


@pytest.mark.parametrize("name", goldens.GOLDEN_QUERIES)
def test_committed_golden_matches_regeneration(regenerated, name):
    path = goldens.golden_path(name)
    assert os.path.exists(path), f"golden missing: {path} (run goldens.py)"
    committed = pd.read_parquet(path)
    fresh = regenerated[name]
    assert list(committed.columns) == list(fresh.columns)
    assert len(committed) == len(fresh)
    ck = sorted(committed.itertuples(index=False, name=None), key=repr)
    fk = sorted(fresh.itertuples(index=False, name=None), key=repr)
    assert ck == fk, f"{name}: committed golden drifted from regeneration"


def test_html_golden_model_agrees_with_parser():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    n_html = 0
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id, text = int(doc_id), text or ""
        if doc_id % fixtures.EDGE_MOD != fixtures.HTML_AT:
            continue
        n_html += 1
        html = fixtures.build_html(doc_id, text).decode("utf-8")
        assert goldens.golden_html_main_text(doc_id, text) == \
            extract_main_text(html), f"doc {doc_id}: golden html model drifted"
    assert n_html > 0


def test_golden_oracles_registered():
    import __spark_entry__ as em
    oracles = em.oracle_sql()
    for name in goldens.GOLDEN_QUERIES:
        assert name in oracles
        assert goldens.golden_path(name) in oracles[name]


def test_span_goldens_satisfy_offset_invariant(regenerated):
    """F4 invariant on the golden itself: extracted_text[start:end] == text
    for every golden span row (offsets are meaningful, not just matching)."""
    text = regenerated["ocr_extract_text"].set_index("url")["extracted_text"]
    spans = regenerated["ocr_spans"]
    assert len(spans) > 10_000
    for row in spans.itertuples(index=False):
        doc = text[row.url]
        assert doc[row.start_off:row.end_off] == row.text
