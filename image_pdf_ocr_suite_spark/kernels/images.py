"""Images -> searchable PDF — parity with create_searchable_pdf_from_images
(/root/reference/image_pdf_ocr/ocr.py:596-716, pipeline P3).

The reference's distinctive structure, distributed:

1. **max-extent canvas** over ALL input images (= _determine_canvas_size,
   ocr.py:536-558) — a global aggregate per output group;
2. the canvas size flows back to every image (broadcast join) and each
   image is **canvas-normalized** (E5: fit-preserving scale, center-paste
   on white, ocr.py:561-593), then adaptive-OCR'd and conf>=50-filtered —
   an embarrassingly parallel kernel;
3. one output PDF per group: page bundles collect via ``applyInPandas``
   over the group (72/300 pt coordinate scale, ocr.py:667-677, is inherited
   from the shared PDF writer).

Input table: ``(group, image_index, image)`` where ``image`` is a
single-page SPDF payload standing in for an image file (no Pillow in the
sandbox; the payload carries the raster recipe + OCR ground truth).
"""

from __future__ import annotations

import pickle
import zlib
from collections.abc import Iterator

import pandas as pd

from image_pdf_ocr_suite_spark import backends
from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.config import ExtractConfig
from image_pdf_ocr_suite_spark.kernels.pdfsink import assemble_pdf, ocr_page_bundle

EXTENT_SCHEMA = "group string, image_index int, width int, height int"
BUNDLE_SCHEMA = "group string, image_index int, bundle binary"
PDF_SCHEMA = "group string, pdf binary, n_images int"


def _extent_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for g, i, raw in zip(pdf["group"], pdf["image_index"], pdf["image"]):
            # header-only dims peek: the extent pass must not pay a full
            # decode — the normalize kernel downstream is the one decode
            w, h = spdf.peek_dims(bytes(raw))
            rows.append((g, int(i), w, h))
        if rows:
            yield pd.DataFrame(rows, columns=["group", "image_index", "width", "height"])


def make_normalize_ocr_kernel(cfg: ExtractConfig):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g, i, raw, tw, th in zip(pdf["group"], pdf["image_index"],
                                         pdf["image"], pdf["canvas_w"], pdf["canvas_h"]):
                page = spdf.decode(bytes(raw)).pages[0]
                img = backends.rasterize(page)
                normalized = backends.normalize_for_canvas(img, int(tw), int(th))
                bundle = ocr_page_bundle(normalized, cfg)
                rows.append((g, int(i), zlib.compress(pickle.dumps(bundle), 1)))
            if rows:
                yield pd.DataFrame(rows, columns=["group", "image_index", "bundle"])
    return kernel


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("image_index")  # explicit page order (§2.2 reorder)
    bundles = [pickle.loads(zlib.decompress(bytes(b))) for b in pdf["bundle"]]
    return pd.DataFrame({"group": [pdf["group"].iloc[0]],
                         "pdf": [assemble_pdf(bundles)],
                         "n_images": [len(bundles)]})


def images_to_searchable_pdf(df, cfg: ExtractConfig | None = None):
    """(group, image_index, image) -> (group, pdf, n_images): one searchable
    PDF per group, pages on a common max-extent canvas.

    Shuffle profile: the extent aggregate moves (group, w, h) ints only;
    the canvas join broadcasts the tiny per-group extents; page bundles
    (compressed raster + text layer) shuffle once into the group assembly."""
    from pyspark.sql import functions as F

    cfg = cfg or ExtractConfig()
    extents = df.select("group", "image_index", "image") \
        .mapInPandas(_extent_kernel, schema=EXTENT_SCHEMA)
    canvas = extents.groupBy("group").agg(
        F.max("width").alias("canvas_w"), F.max("height").alias("canvas_h"))
    with_canvas = df.join(F.broadcast(canvas), "group")
    bundles = with_canvas.select("group", "image_index", "image", "canvas_w", "canvas_h") \
        .mapInPandas(make_normalize_ocr_kernel(cfg), schema=BUNDLE_SCHEMA)
    return bundles.groupBy("group").applyInPandas(_assemble_group, schema=PDF_SCHEMA)
