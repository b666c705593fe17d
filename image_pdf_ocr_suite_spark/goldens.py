"""Golden-output generator — turns the single-process reference model into
DuckDB-readable parquet oracles for the driver's correctness gate.

The flagship extraction semantics (adaptive OCR, assembly, span offsets,
quarantine taxonomy) are not SQL-expressible, so the driver's hash gate was
blind on exactly the queries the engine exists for.  ``refmodel.py`` is an
independent page-at-a-time implementation of the reference pipelines
(/root/reference/image_pdf_ocr/ocr.py:720-780, 487-511); this module runs
it — plus equally independent single-process models for span offsets, HTML
main text, quarantine, and payload metadata — over the driver's documents
table and writes the results as parquet.  ``oracle_sql()`` then registers
``SELECT ... FROM read_parquet('<golden>')`` for each flagship query, so
byte-identity becomes part of the driver's hard signal.

Independence notes (what makes these oracles, not tautologies):

- extracted text comes from ``refmodel.extract_text`` — a sequential
  per-page loop sharing only the deterministic backends with the Spark
  kernels (the same relationship the reference CLI would have);
- span offsets are computed by REPLAYING the ``ocr_text`` join rules as
  literal string building with a position cursor — not the Spark kernel's
  shift/cumsum (kernels/ocr.py:_word_offsets) nor its window arithmetic
  (relational/assemble.py:emit_spans);
- HTML main text is derived from the fixture's ground-truth paragraphs
  (fixtures.main_content_paragraphs) plus the documented density
  thresholds — it never calls the DOM parser the pipeline uses
  (tests/test_goldens.py pins that the two agree, as a drift alarm);
- quarantine/metadata replay the payload container's documented dispatch
  rules with direct library calls, no Spark.

Regenerate (after a deliberate semantics change ONLY)::

    python -m image_pdf_ocr_suite_spark.goldens /root/testdata/sf0.01

``tests/test_goldens.py`` fails if the committed files drift from what
this module produces for the current fixtures.
"""

from __future__ import annotations

import math
import os

import pandas as pd

from image_pdf_ocr_suite_spark import backends, fixtures, refmodel
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import EMPTY_DOC_TEXT, ExtractConfig
from image_pdf_ocr_suite_spark.kernels import html as htmlmod

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "golden")

GOLDEN_QUERIES = ("ocr_extract_text", "ocr_spans", "ocr_quarantine",
                  "html_main_text", "payload_metadata",
                  "searchable_pdf_stats", "images_to_pdf_stats")

# q_searchable_pdf_stats builds its input with build_pages_df(limit=...)
SEARCHABLE_LIMIT = 100


def _renderable(s: str) -> bool:
    """The PDF sink's documented per-word encode-skip (round 5): cp1252
    words go to the WinAnsi /F1 layer, every OTHER BMP word — the
    reference's Japanese use case — to the Identity-H /F2 layer; only
    non-BMP text (code points > U+FFFF) is skipped, mirroring the
    reference's per-word RuntimeError swallow (ocr.py:509-511)."""
    return all(ord(c) <= 0xFFFF for c in s)


def golden_html_main_text(doc_id: int, text: str) -> str:
    """Independent model of the density stripper's output on FIXTURE html:
    the fixture's main-content paragraphs are single-spaced text inside
    bare ``<p>`` blocks (link_len 0, tag_count 1), so the block classifier
    (kernels/html.py thresholds) reduces to the length floor; every other
    fixture block (nav/ads/footer) is pure link text and fails the link-
    density test.  Derived from ground truth, not from the parser."""
    paras = fixtures.main_content_paragraphs(doc_id, text)
    kept = [p for p in paras if len(p) >= htmlmod.MIN_TEXT_LEN]
    return "\n".join(kept)


def _page_word_offsets(frame: pd.DataFrame) -> dict:
    """Character offset of each rendered word inside the raw page text, by
    replaying ``backends.ocr_text``'s join rules (" " within a line, "\\n"
    between lines of a block, "\\n\\n" between blocks) as literal string
    building with a cursor.  Returns {frame row index -> offset}."""
    offs: dict = {}
    pos = 0
    prev = None
    for ridx, row in frame.iterrows():
        if row["level"] != 5:
            continue
        t = row["text"]
        if t is None or (isinstance(t, float) and math.isnan(t)):
            continue
        conf = float(row["conf"])
        if not (conf >= backends.LEGIBILITY_FLOOR):
            continue
        key = (row["block_num"], row["par_num"], row["line_num"])
        if prev is not None:
            pos += 1 if (key == prev or key[0] == prev[0]) else 2
        offs[ridx] = pos
        pos += len(str(t))
        prev = key
    return offs


def golden_doc_spans(url: str, payload_bytes: bytes,
                     cfg: ExtractConfig) -> list[tuple]:
    """Span rows for one decodable multi-page document: the searchable-text
    layer (conf >= 50, strip-empty and NaN-coordinate drops, ocr.py:487-511)
    with offsets into the assembled document text."""
    doc = spdf.decode(payload_bytes)
    spans: list[tuple] = []
    pos = 0  # chunk-start cursor within the assembled document
    for index, page in enumerate(doc.pages, start=1):
        image = backends.rasterize(page)
        result = refmodel.perform_adaptive_ocr(image, cfg)
        page_text = backends.ocr_text(result.image_for_string, cfg.lang)
        header = f"--- ページ {index} ---"
        stripped = page_text.strip()
        page_text_off = pos + len(header) + 1
        lead = len(page_text) - len(page_text.lstrip())
        offs = _page_word_offsets(result.frame)
        for ridx, row in result.frame.iterrows():
            if row["level"] != 5:
                continue
            conf = float(row["conf"])
            if not (conf >= cfg.render_conf_threshold):
                continue
            t = row["text"]
            t = "" if t is None or (isinstance(t, float) and math.isnan(t)) else str(t)
            st = t.strip()
            if not st:
                continue
            left, top = float(row["left"]), float(row["top"])
            width, height = float(row["width"]), float(row["height"])
            if any(math.isnan(v) for v in (left, top, height)):
                continue
            if ridx not in offs:
                continue  # word not rendered by ocr_text
            lead_w = len(t) - len(t.lstrip())
            start = page_text_off + (offs[ridx] - lead) + lead_w
            spans.append((url, index,
                          int(row["block_num"]), int(row["par_num"]),
                          int(row["line_num"]), int(row["word_num"]),
                          left, top, width, height, conf,
                          st, start, start + len(st)))
        pos += len(header) + 1 + len(stripped) + 1 + 1  # chunk + "\n" join
    return spans


# q_images_to_pdf* build their input with build_images_df(limit=..., 8 groups)
IMAGES_LIMIT, IMAGES_GROUPS = 80, 8


def _rendered_word_count(frame: pd.DataFrame, cfg: ExtractConfig) -> int:
    """Words the P2/P3 invisible text layer must contain, per the
    reference semantics (conf>=50 filter, strip-empty skip, NaN
    coordinate guard, ocr.py:487-511) plus the non-BMP encode-skip
    (cp1252 words render via /F1, other BMP words via the Identity-H
    /F2 CJK layer)."""
    filtered = refmodel.filter_frame_by_confidence(
        frame, cfg.render_conf_threshold)
    filtered = filtered[filtered["level"] == 5]
    n = 0
    for _, row in filtered.iterrows():
        text = str(row.get("text", "")).strip()
        if not text or not _renderable(text):
            continue
        try:
            vals = (float(row["left"]), float(row["top"]), float(row["height"]))
        except (TypeError, ValueError):
            continue
        if any(math.isnan(v) for v in vals):
            continue
        n += 1
    return n


def golden_images_stats(sf_dir: str, cfg: ExtractConfig | None = None
                        ) -> pd.DataFrame:
    """Independent single-process model of the P3 flow's observable PDF
    facts: per group, the max-extent canvas, E5 normalization, adaptive
    OCR and render filters — everything EXCEPT the PDF writer, whose
    output the Spark query parses back structurally."""
    cfg = cfg or ExtractConfig()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    docs = docs[docs["doc_id"] < IMAGES_LIMIT]
    groups: dict[str, list] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        page = fixtures.build_document(doc_id, text or "").pages[0]
        groups.setdefault(f"grp{doc_id % IMAGES_GROUPS}", []).append(page)
    rows = []
    for g in sorted(groups):
        pages = groups[g]
        cw = max(p.width_px for p in pages)
        ch = max(p.height_px for p in pages)
        ops = 0
        for page in pages:
            norm = backends.normalize_for_canvas(
                backends.rasterize(page), cw, ch)
            result = refmodel.perform_adaptive_ocr(norm, cfg)
            ops += _rendered_word_count(result.frame, cfg)
        rows.append((g, len(pages), ops))
    return pd.DataFrame(rows, columns=["group", "n_pages", "n_text_ops"])


def build_golden_frames(sf_dir: str, cfg: ExtractConfig | None = None
                        ) -> dict[str, pd.DataFrame]:
    """Single-process golden outputs for every flagship query over the
    documents table at ``sf_dir`` (column order matches the Spark side)."""
    cfg = cfg or ExtractConfig()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    text_rows: list[tuple] = []
    span_rows: list[tuple] = []
    quar_rows: list[tuple] = []
    html_rows: list[tuple] = []
    meta_rows: list[tuple] = []
    pdf_rows: list[tuple] = []

    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        text = text or ""
        payload = fixtures.make_payload(doc_id, text)
        url = fixtures.url_for(doc_id)
        kind = spdf.sniff(payload)

        # --- payload_metadata (multimodal dispatch rules) ---
        n_pages = mw = mh = nw = 0
        meta_kind = kind
        if kind == "spdf" and not (len(payload) > 5
                                   and payload[5] & spdf.FLAG_ENCRYPTED):
            try:
                doc = spdf.decode(payload)
                n_pages = len(doc.pages)
                mw = max((p.width_px for p in doc.pages), default=0)
                mh = max((p.height_px for p in doc.pages), default=0)
                nw = sum(len(p.words) for p in doc.pages)
            except spdf.PayloadError:
                meta_kind = "corrupt"
        meta_rows.append((url, meta_kind, n_pages, mw, mh, nw, len(payload)))

        # --- extraction / quarantine dispatch (decode-kernel taxonomy) ---
        if kind == "html":
            main = golden_html_main_text(doc_id, text)
            text_rows.append((url, main, 1, "html"))
            html_rows.append((url, main))
            continue
        if kind == "unknown":
            quar_rows.append((url, "unknown", "unknown payload format"))
            continue
        flags = payload[5] if len(payload) > 5 else 0
        if flags & spdf.FLAG_ENCRYPTED:
            quar_rows.append((url, "encrypted",
                              "payload is encrypted and no password was given"))
            continue
        try:
            doc = spdf.decode(payload)
        except spdf.PayloadError as exc:
            quar_rows.append((url, "corrupt", f"could not open payload: {exc}"))
            continue
        if not doc.pages:
            text_rows.append((url, EMPTY_DOC_TEXT, 0, "spdf"))
            if doc_id < SEARCHABLE_LIMIT:
                pdf_rows.append((url, 0, 0))
            continue
        text_rows.append((url, refmodel.extract_text(payload, cfg),
                          len(doc.pages), "spdf"))
        doc_spans = golden_doc_spans(url, payload, cfg)
        span_rows.extend(doc_spans)
        if doc_id < SEARCHABLE_LIMIT:
            # what the P2 sink must render: the span word list minus
            # non-BMP text (the documented encode-skip; CJK renders now)
            pdf_rows.append((url, len(doc.pages),
                             sum(1 for sp in doc_spans if _renderable(sp[11]))))

    return {
        "ocr_extract_text": pd.DataFrame(
            text_rows, columns=["url", "extracted_text", "n_pages", "kind"]),
        "ocr_spans": pd.DataFrame(
            span_rows, columns=["url", "page", "block", "par", "line", "word",
                                "left", "top", "width", "height", "conf",
                                "text", "start_off", "end_off"]),
        "ocr_quarantine": pd.DataFrame(
            quar_rows, columns=["url", "kind", "error"]),
        "html_main_text": pd.DataFrame(
            html_rows, columns=["url", "extracted_text"]),
        "payload_metadata": pd.DataFrame(
            meta_rows, columns=["url", "kind", "n_pages", "max_width",
                                "max_height", "n_words", "payload_bytes"]),
        "searchable_pdf_stats": pd.DataFrame(
            pdf_rows, columns=["url", "n_pages", "n_text_ops"]),
        "images_to_pdf_stats": golden_images_stats(sf_dir, cfg),
    }


def _arrow_schemas():
    """Exact parquet types matching each Spark query's output schema."""
    import pyarrow as pa
    s, i32, i64, f64 = pa.string(), pa.int32(), pa.int64(), pa.float64()
    return {
        "ocr_extract_text": pa.schema([
            ("url", s), ("extracted_text", s), ("n_pages", i32), ("kind", s)]),
        "ocr_spans": pa.schema([
            ("url", s), ("page", i32), ("block", i32), ("par", i32),
            ("line", i32), ("word", i32), ("left", f64), ("top", f64),
            ("width", f64), ("height", f64), ("conf", f64), ("text", s),
            ("start_off", i64), ("end_off", i64)]),
        "ocr_quarantine": pa.schema([("url", s), ("kind", s), ("error", s)]),
        "html_main_text": pa.schema([("url", s), ("extracted_text", s)]),
        "payload_metadata": pa.schema([
            ("url", s), ("kind", s), ("n_pages", i32), ("max_width", i32),
            ("max_height", i32), ("n_words", i64), ("payload_bytes", i64)]),
        "searchable_pdf_stats": pa.schema([
            ("url", s), ("n_pages", i32), ("n_text_ops", i64)]),
        "images_to_pdf_stats": pa.schema([
            ("group", s), ("n_pages", i32), ("n_text_ops", i64)]),
    }


def golden_path(name: str, sf_tag: str = "sf0.01") -> str:
    return os.path.join(GOLDEN_DIR, sf_tag, f"{name}.parquet")


def write_goldens(sf_dir: str, out_dir: str | None = None) -> dict[str, str]:
    """Generate and write the golden parquet files; returns {name: path}."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out_dir = out_dir or os.path.join(GOLDEN_DIR, sf_tag)
    os.makedirs(out_dir, exist_ok=True)
    frames = build_golden_frames(sf_dir)
    schemas = _arrow_schemas()
    paths: dict[str, str] = {}
    for name, pdf in frames.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        table = pa.Table.from_pandas(pdf, schema=schemas[name],
                                     preserve_index=False)
        pq.write_table(table, path, compression="zstd")
        paths[name] = path
    return paths


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    for name, path in write_goldens(sf).items():
        print(f"{name}: {path}")
