"""Multimodal column handling — opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata
extracted by Arrow-batched ``mapInPandas`` kernels.  The container has no
image/audio codec libraries, so the DECODE step is stubbed behind a
clearly-marked ``NotImplementedError`` (production would bind Pillow/
ffmpeg there); the Spark-side plumbing — schema, batch shape, partitioning,
UDF signature — is real and tested against the deterministic SPDF payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from image_pdf_ocr_suite_spark import payload as spdf

META_SCHEMA = ("url string, kind string, n_pages int, max_width int, "
               "max_height int, n_words bigint, payload_bytes bigint")


def _meta_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for url, raw in zip(pdf["url"], pdf["html"]):
            raw = bytes(raw) if raw is not None else b""
            kind = spdf.sniff(raw)
            n_pages = mw = mh = nw = 0
            if kind == "spdf" and not (len(raw) > 5 and raw[5] & spdf.FLAG_ENCRYPTED):
                try:
                    doc = spdf.decode(raw)
                    n_pages = len(doc.pages)
                    # max-extent aggregate (≈ _determine_canvas_size,
                    # /root/reference/image_pdf_ocr/ocr.py:536-558)
                    mw = max((p.width_px for p in doc.pages), default=0)
                    mh = max((p.height_px for p in doc.pages), default=0)
                    nw = sum(len(p.words) for p in doc.pages)
                except spdf.PayloadError:
                    kind = "corrupt"
            rows.append((url, kind, n_pages, mw, mh, nw, len(raw)))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "url", "kind", "n_pages", "max_width", "max_height",
                "n_words", "payload_bytes"])


def payload_metadata(df):
    """(url, html) -> typed payload metadata; real plumbing over the
    deterministic container."""
    return df.select("url", "html").mapInPandas(_meta_kernel, schema=META_SCHEMA)


def decode_image(payload: bytes) -> "object":
    """Production image decode (Pillow/libvips binding). STUB: codec
    libraries are not available in this container."""
    raise NotImplementedError(
        "image codec libraries are not available in this environment; "
        "bind Pillow/libvips here in production")


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Production video frame sampling (ffmpeg binding). STUB."""
    raise NotImplementedError(
        "video codecs are not available in this environment; bind ffmpeg "
        "here in production")
