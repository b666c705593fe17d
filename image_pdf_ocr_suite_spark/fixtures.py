"""Deterministic fixture corpus — the Common-Crawl-style ``pages`` table.

Synthesizes the input table of BASELINE.json ``input_hint`` —
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)`` —
from the driver-provided ``documents`` parquet (TESTDATA.md), fully
deterministic (crc32-keyed jitter; no wall clock, no RNG state), so the
same (doc_id, text) always yields byte-identical payloads on driver and
executors alike.

Corpus composition (FIXTURES.md F1): mostly SPDF image-PDF payloads
covering every adaptive-OCR branch (high-confidence skip; retry-and-win;
retry-and-keep-base; exact tie → base, ocr.py:71; low-legibility words that
only the preprocessed pass renders), plus edge docs — empty (0 pages →
extracted "\\n", ocr.py:751-754), encrypted (→ quarantine), corrupt, and
HTML payloads that go down the boilerplate-strip path.

Payload synthesis itself runs DISTRIBUTED (mapInPandas over the documents
scan), so benchmarks measure the pipeline, not a driver-side loop, and the
same generator scales to any SF.
"""

from __future__ import annotations

import datetime as dt
import zlib
from collections.abc import Iterator

import pandas as pd

from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.payload import Document, Page, Word

# Edge-case assignment: doc_id % EDGE_MOD selects special payload kinds.
EDGE_MOD = 29
EMPTY_AT, ENCRYPTED_AT, CORRUPT_AT, HTML_AT = 5, 11, 17, 23

FIXTURE_PASSWORD = "s3cret"

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _jit(*keys) -> int:
    """Deterministic jitter in [0, 2^32) from a composite key (crc32 —
    stable across processes, unlike Python's randomized hash())."""
    return zlib.crc32(":".join(str(k) for k in keys).encode())


def _tokens(text: str, max_tokens: int = 60) -> list[str]:
    toks = text.split()
    return toks[:max_tokens] if toks else ["empty"]


def _conf_profile(doc_id: int, page_no: int) -> tuple[float, float, bool]:
    """(base_level, pre_level, exact_tie) — chosen so the corpus exercises
    every branch of ocr.py:48-79."""
    mode = (doc_id * 7 + page_no) % 10
    if mode <= 3:
        return 80.0, 40.0, False          # high base → no second pass
    if mode in (4, 5):
        return 50.0, 72.0, False          # retry, preprocessed wins
    if mode == 6:
        return 60.0, 52.0, False          # retry, base kept (pre worse)
    if mode == 7:
        return 55.0, 55.0, True           # exact tie → strict-> keeps base
    if mode == 8:
        return 62.0, 62.5, False          # near-tie, pre wins by a hair
    return 25.0, 75.0, False              # base illegible → pre reveals text


def build_document(doc_id: int, text: str) -> Document:
    """Deterministic multi-page document from one documents-table row."""
    toks = _tokens(text)
    n_pages = 1 + (_jit(doc_id, "npages") % 3)          # 1-3 pages
    per_page = max(1, len(toks) // n_pages)
    pages: list[Page] = []
    for p in range(1, n_pages + 1):
        page_toks = toks[(p - 1) * per_page: p * per_page] or ["blank"]
        base_level, pre_level, tie = _conf_profile(doc_id, p)
        words: list[Word] = []
        for i, tok in enumerate(page_toks):
            if tie:
                cb = cp = base_level
            else:
                j = _jit(doc_id, p, i) % 11 - 5          # [-5, +5]
                cb = min(100.0, max(0.0, base_level + j))
                cp = min(100.0, max(0.0, pre_level + j))
            # sprinkle structural variety: None-text and empty-text words
            wtext: str | None = tok
            r = _jit(doc_id, p, i, "edge") % 23
            if r == 0:
                wtext = None                              # NaN text row (ocr.py:131)
            elif r == 1:
                wtext = "  "                              # strips to empty (ocr.py:495-497)
            line = i // 6
            words.append(Word(
                block=1 + line // 4, par=1, line=1 + line % 4, word=1 + i % 6,
                left=float(10 + (i % 6) * 18), top=float(12 + line * 14),
                width=float(14 + (_jit(doc_id, p, i, "w") % 5)), height=10.0,
                conf_base=cb, conf_pre=cp, text=wtext,
            ))
        pages.append(Page(width_px=128, height_px=12 + 14 * (1 + (len(page_toks) - 1) // 6),
                          words=words, ink=40 + doc_id % 60))
    return Document(pages=pages)


def build_html(doc_id: int, text: str) -> bytes:
    """HTML payload with known boilerplate and known main content, for the
    DOM text-density strip path (north_rule addition, SURVEY §2.6)."""
    toks = _tokens(text, 120)
    paras = [" ".join(toks[i:i + 20]) for i in range(0, len(toks), 20)]
    main = "\n".join(f"<p>{p}</p>" for p in paras)
    nav = "".join(f'<a href="/{i}">nav item {i}</a> ' for i in range(8))
    ads = "".join(f'<div class="ad"><a href="/ad{i}">buy {i}</a></div>' for i in range(4))
    html = (
        "<html><head><title>t</title></head><body>"
        f"<div id='nav'>{nav}</div>"
        f"<div id='main'><article>{main}</article></div>"
        f"{ads}"
        "<div id='footer'><a href='/tos'>terms</a> <a href='/pp'>privacy</a></div>"
        "</body></html>"
    )
    return html.encode("utf-8")


def main_content_paragraphs(doc_id: int, text: str) -> list[str]:
    """Ground-truth main content of build_html (golden for the strip test)."""
    toks = _tokens(text, 120)
    return [" ".join(toks[i:i + 20]) for i in range(0, len(toks), 20)]


def make_payload(doc_id: int, text: str) -> bytes:
    """Dispatch one documents row to its payload kind (deterministic)."""
    m = doc_id % EDGE_MOD
    if m == EMPTY_AT:
        return spdf.encode(Document(pages=[]))
    if m == ENCRYPTED_AT:
        return spdf.encode(build_document(doc_id, text), password=FIXTURE_PASSWORD)
    if m == CORRUPT_AT:
        return spdf.MAGIC + bytes([spdf.VERSION, 0]) + b"\x00garbage\xff" * 3
    if m == HTML_AT:
        return build_html(doc_id, text)
    return spdf.encode(build_document(doc_id, text))


def url_for(doc_id: int) -> str:
    return f"https://example.com/doc/{doc_id:08d}"


_EPOCH = dt.datetime(2024, 1, 1)


def _rows_to_pages(pdf: pd.DataFrame, giant_doc_id: int, giant_pages: int) -> pd.DataFrame:
    payloads, urls, tss = [], [], []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        doc_id = int(doc_id)
        text = text or ""
        if giant_pages and doc_id == giant_doc_id:
            # "giant scanned lecture PDF" skew fixture (north_star):
            # repeat the text to fill many pages.
            doc = build_document(doc_id, text)
            page = doc.pages[0]
            payloads.append(spdf.encode(Document(pages=[page] * giant_pages)))
        else:
            payloads.append(make_payload(doc_id, text))
        urls.append(url_for(doc_id))
        tss.append(_EPOCH + dt.timedelta(minutes=doc_id))
    return pd.DataFrame({
        "url": urls,
        "warc_ts": tss,
        "html": payloads,
        "text": pdf["text"],
        "lang": pdf["lang"] if "lang" in pdf.columns else "ja",
    })


def build_pages_df(spark, sf_dir: str, limit: int | None = None,
                   giant_doc_id: int = -1, giant_pages: int = 0,
                   n_partitions: int | None = None):
    """Distributed pages-table synthesis: documents parquet -> (url, warc_ts,
    html, text, lang).  Column-pruned scan (doc_id, text, lang only).
    The documents parquet is a single file, so spread synthesis across the
    cluster explicitly (defaultParallelism) before the generator kernel."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang")
    if limit is not None:
        docs = docs.where(f"doc_id < {int(limit)}")
    docs = docs.repartition(n_partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _rows_to_pages(pdf, giant_doc_id, giant_pages)

    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)


IMAGES_SCHEMA = "group string, image_index int, image binary"


def build_images_df(spark, sf_dir: str, limit: int | None = 80, n_groups: int = 8):
    """Images table for the P3 flow: one single-page payload per document
    row, grouped deterministically (group = doc_id % n_groups)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if limit is not None:
        docs = docs.where(f"doc_id < {int(limit)}")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                page = build_document(doc_id, text or "").pages[0]
                rows.append((f"grp{doc_id % n_groups}", doc_id,
                             spdf.encode(spdf.Document(pages=[page]))))
            if rows:
                yield pd.DataFrame(rows, columns=["group", "image_index", "image"])

    return docs.mapInPandas(gen, schema=IMAGES_SCHEMA)


# ---------------------------------------------------------------------------
# Multimodal fixture columns — deterministic BMP/PGM/WAV payloads whose
# feature values have CLOSED FORMS in doc_id, so the multimodal kernels
# (analytics/multimodal.py) get real SQL oracles: solid-color rasters make
# mean luminance a literal expression; constant-amplitude PCM makes
# RMS/peak exact rationals (k/2^15 and (v-128)/2^7 are dyadic — exact in
# float64 on both engines).
# ---------------------------------------------------------------------------

MEDIA_DIM = 16          # 16x16 rasters: 256 px (any count works — the
                        # oracle rounds the accumulated mean at 1e-4)
WAV_RATE_MONO, WAV_RATE_STEREO = 8000, 16000
WAV_FRAMES_MONO, WAV_FRAMES_STEREO = 1024, 512


def bmp_solid(width: int, height: int, r: int, g: int, b: int,
              bpp: int = 24) -> bytes:
    """Uncompressed BI_RGB BMP (bottom-up, BGR(A)) filled with one color."""
    import struct
    nch = bpp // 8
    px = bytes([b, g, r]) if nch == 3 else bytes([b, g, r, 255])
    stride = ((nch * width + 3) // 4) * 4
    row = px * width + b"\x00" * (stride - nch * width)
    data = row * height
    off = 14 + 40
    return (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp,
                          0, len(data), 2835, 2835, 0, 0)
            + data)


def pgm_solid(width: int, height: int, gray: int) -> bytes:
    return b"P5 %d %d 255\n" % (width, height) + bytes([gray]) * (width * height)


def png_solid(width: int, height: int, *channels: int,
              interlaced: bool = False) -> bytes:
    """8-bit PNG filled with one color — gray (color type 0) for one
    channel value, RGB (type 2) for three; optionally Adam7-interlaced
    (solid color → every pass is the same color, decode is exact either
    way, so both variants share one oracle row).  Filter-0 scanlines,
    stdlib zlib, CRC-correct chunks."""
    import struct
    import zlib
    color = 0 if len(channels) == 1 else 2
    px = bytes(channels)
    if not interlaced:
        raw = (b"\x00" + px * width) * height
    else:
        from image_pdf_ocr_suite_spark.analytics.multimodal import ADAM7
        raw = b""
        for x0, y0, dx, dy in ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                raw += (b"\x00" + px * pw) * ph

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0,
                       1 if interlaced else 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def wav_const(rate: int, frames: int, channels: int, bits: int,
              value: int, audio_fmt: int = 1) -> bytes:
    """RIFF/WAVE with every sample equal to ``value`` (PCM16 int or PCM8
    byte) — constant amplitude, so RMS == peak == |amplitude| exactly."""
    import struct
    if bits == 16:
        data = struct.pack("<h", value) * (frames * channels)
    else:
        data = bytes([value]) * (frames * channels)
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", audio_fmt, channels, rate,
                      rate * block, block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def jpeg_solid_gray(width: int, height: int, gray: int,
                    progressive: bool = False) -> bytes:
    """Real JPEG (baseline or progressive), solid gray: with flat q=1
    quant tables a constant block quantizes to a DC-only spectrum
    reproduced EXACTLY by the float IDCT — solid grays round-trip
    losslessly in BOTH coding modes, giving the SQL oracle one closed
    form over genuine entropy-coded streams of either kind."""
    import numpy as np

    from image_pdf_ocr_suite_spark.analytics.jpeg import (
        encode_jpeg, encode_jpeg_progressive)
    arr = np.full((height, width), gray, dtype=np.uint8)
    return encode_jpeg_progressive(arr) if progressive else encode_jpeg(arr)


VIDEO_DIM = 8
VIDEO_FRAMES = 12


def svid_video(width: int, height: int, frame_values: list[int]) -> bytes:
    """SVID fixture container (multimodal.sample_frames): solid gray
    frames — closed-form per-frame mean luminance for the SQL oracle."""
    import struct
    head = (b"SVID" + bytes([1])
            + struct.pack("<HHH", width, height, len(frame_values)))
    return head + b"".join(bytes([v]) * (width * height)
                           for v in frame_values)


def video_payload_for(doc_id: int) -> bytes | None:
    """doc_id % 4 → video payload kind (oracle mirrors this dispatch):
    0-1 SVID with 12 solid frames (frame f's gray = (doc_id*7 + f*11)
    % 256), 2 MP4 magic (codec seam → err row), 3 null."""
    m = doc_id % 4
    if m <= 1:
        vals = [(doc_id * 7 + f * 11) % 256 for f in range(VIDEO_FRAMES)]
        return svid_video(VIDEO_DIM, VIDEO_DIM, vals)
    if m == 2:
        return b"\x00\x00\x00\x20ftypmp42" + bytes(16)   # seam -> err row
    return None


def image_payload_for(doc_id: int) -> bytes | None:
    """doc_id % 8 → image payload kind (oracle mirrors this dispatch):
    0-1 BMP24, 2 BMP32, 3 PNG-RGB, 4 PGM, 5 PNG-gray, 6 real JPEG gray
    (doc_id % 16 == 6 → baseline, == 14 → PROGRESSIVE — same decoded
    pixels, same oracle row), 7 split on doc_id % 16: 7 → null, 15 →
    WebP magic (codec seam → err row)."""
    m = doc_id % 8
    r, g, b = doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256
    gray = (doc_id * 31) % 256
    if m <= 1:
        return bmp_solid(MEDIA_DIM, MEDIA_DIM, r, g, b, bpp=24)
    if m == 2:
        return bmp_solid(MEDIA_DIM, MEDIA_DIM, r, g, b, bpp=32)
    if m == 3:
        return png_solid(MEDIA_DIM, MEDIA_DIM, r, g, b)
    if m == 4:
        return pgm_solid(MEDIA_DIM, MEDIA_DIM, gray)
    if m == 5:
        # doc_id % 16 == 13 -> Adam7-interlaced variant, same decoded
        # pixels, same oracle row
        return png_solid(MEDIA_DIM, MEDIA_DIM, gray,
                         interlaced=doc_id % 16 == 13)
    if m == 6:
        return jpeg_solid_gray(MEDIA_DIM, MEDIA_DIM, gray,
                               progressive=doc_id % 16 == 14)
    if doc_id % 16 == 15:
        return b"RIFF\x00\x00\x00\x00WEBP" + bytes(16)  # seam -> err row
    return None


def wav_sine(rate: int, frames: int, bin_k: int,
             amplitude: int = 16000) -> bytes:
    """PCM16 mono WAV carrying one pure tone at FFT bin ``bin_k``
    (an exact number of cycles over ``frames``) — the rFFT argmax is
    exactly ``bin_k``: quantization noise is ~0.5 LSB against a
    half-scale peak, ~90 dB below it."""
    import struct

    import numpy as np
    n = np.arange(frames)
    samples = np.round(amplitude
                       * np.sin(2.0 * np.pi * bin_k * n / frames))
    data = samples.astype("<i2").tobytes()
    block = 2
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * block, block, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def tone_payload_for(doc_id: int) -> bytes | None:
    """doc_id % 4 → tone payload kind (oracle mirrors this dispatch):
    0-1 pure sine at bin (doc_id % 37) + 1, 2 float-WAV (codec seam →
    err row), 3 null."""
    m = doc_id % 4
    if m <= 1:
        return wav_sine(WAV_RATE_MONO, WAV_FRAMES_MONO,
                        (doc_id % 37) + 1)
    if m == 2:
        return wav_const(WAV_RATE_MONO, 64, 1, 32, 0, audio_fmt=3)
    return None


def audio_payload_for(doc_id: int) -> bytes | None:
    """doc_id % 6 → audio payload kind: 0-1 PCM16 mono, 2 PCM16 stereo,
    3 PCM8 mono, 4 float WAV (codec seam), 5 null."""
    m = doc_id % 6
    k = (doc_id % 1000) + 1
    v = (doc_id % 200) + 10
    if m <= 1:
        return wav_const(WAV_RATE_MONO, WAV_FRAMES_MONO, 1, 16, k)
    if m == 2:
        return wav_const(WAV_RATE_STEREO, WAV_FRAMES_STEREO, 2, 16, k)
    if m == 3:
        return wav_const(WAV_RATE_MONO, WAV_FRAMES_MONO, 1, 8, v)
    if m == 4:
        return wav_const(WAV_RATE_MONO, 64, 1, 32, 0, audio_fmt=3)
    return None


def build_media_df(spark, sf_dir: str, media: str, limit: int = 200):
    """Distributed media-column synthesis from the documents table:
    (id, image|audio binary) rows for the multimodal feature kernels."""
    assert media in ("image", "audio", "video", "tone")
    fn = {"image": image_payload_for, "audio": audio_payload_for,
          "video": video_payload_for, "tone": tone_payload_for}[media]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if limit is not None:
        docs = docs.where(f"doc_id < {int(limit)}")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                ids = [int(d) for d in pdf["doc_id"]]
                yield pd.DataFrame({"id": [str(d) for d in ids],
                                    media: [fn(d) for d in ids]})

    return docs.mapInPandas(gen, schema=f"id string, {media} binary")


def build_pages_pdf(doc_rows: list[tuple[int, str, str]]) -> pd.DataFrame:
    """Driver-side variant for small unit-test corpora:
    rows of (doc_id, text, lang)."""
    pdf = pd.DataFrame(doc_rows, columns=["doc_id", "text", "lang"])
    return _rows_to_pages(pdf, -1, 0)


def adversarial_html_cases() -> list[tuple[str, str, str]]:
    """(name, html, expected_main_text) — adversarial structures the
    density stripper must classify correctly (r4 VERDICT item 7):
    link-heavy tables, comment bombs, inline <script> JSON, nested
    boilerplate, malformed markup, entity references.  Expectations are
    GROUND TRUTH (what the block/density rules mandate for the authored
    content), not parser output — tests/test_analytics.py drives both
    this oracle and the Spark kernel path over them.  These cases are
    deliberately NOT part of the driver corpus: build_html's output is
    frozen under the byte-identity invariant (CLAUDE.md)."""
    main_a = "this is the genuine long main content paragraph alpha here"
    main_b = "and a second genuine paragraph beta with enough characters"
    json_bomb = '{"items": [' + ", ".join(
        f'{{"id": {i}, "blurb": "filler text value {i}"}}'
        for i in range(30)) + "]}"
    comment_bomb = "<!-- " + "hidden boilerplate words " * 40 + "-->"
    nav_cells = "".join(f'<tr><td><a href="/s{i}">section {i}</a></td></tr>'
                        for i in range(12))
    return [
        ("table_nav_heavy",
         f"<html><body><table>{nav_cells}</table>"
         f"<p>{main_a}</p></body></html>",
         main_a),
        ("comment_heavy",
         f"<html><body>{comment_bomb}<p>{main_a}</p>"
         f"{comment_bomb}{comment_bomb}</body></html>",
         main_a),
        ("inline_script_json",
         f"<html><body><script>{json_bomb}</script>"
         f"<style>p {{ color: red }}</style>"
         f"<p>{main_a}</p>"
         f"<script type='application/ld+json'>{json_bomb}</script>"
         "</body></html>",
         main_a),
        ("nested_boilerplate",
         f"<html><body><div><p>{main_a}</p>"
         '<nav><a href="/1">one link</a> <a href="/2">two link</a> '
         '<a href="/3">three link</a></nav>'
         f"<p>{main_b}</p></div>"
         '<footer><a href="/tos">terms of service</a></footer>'
         "</body></html>",
         main_a + "\n" + main_b),
        ("malformed_unclosed",
         # unclosed <p> at EOF and a stray </div>: the unclosed block's
         # text must flush, the stray endtag must not crash
         f"</div><html><body><p>{main_a}",
         main_a),
        ("entity_refs",
         "<html><body><p>salt &amp; pepper &lt;tags&gt; cost "
         "&quot;twenty&quot; &#8364; in the market today</p></body></html>",
         'salt & pepper <tags> cost "twenty" € in the market today'),
    ]


def dhash_gray_rows(doc_id: int):
    """Deterministic 72x64 gray raster for the perceptual-hash queries:
    documents in the same group (doc_id // 4) share an 8px-cell base
    pattern; the variant (doc_id % 4) brightens ``variant`` cells by 96
    (mod 256) — measured within-group dHash Hamming <= 2 and, on the
    32-id test slice, cross-group >= 13, so max_hamming=3 banding
    finds the planted groups there (at 200 ids a few modular pattern
    aliases also come within range; the exhaustive oracles count
    them identically).  Shared by the Spark fixture payload and the
    oracle's Python replay."""
    import numpy as np

    group, variant = doc_id // 4, doc_id % 4
    w, h = 72, 64
    xc = (np.arange(w) // 8) * 17
    yc = (np.arange(h) // 8) * 29
    img = (np.add.outer(yc, xc) * (group + 3)) % 256
    for k in range(variant):
        cx, cy = k % 8, k // 8
        img[cy * 8:(cy + 1) * 8, cx * 8:(cx + 1) * 8] = \
            (img[cy * 8:(cy + 1) * 8, cx * 8:(cx + 1) * 8] + 96) % 256
    return img.astype(np.uint8)


def dhash_image_payload_for(doc_id: int) -> bytes | None:
    """doc_id → gradient image payload for the dHash queries: PGM gray
    by default; every third group encodes the SAME raster as P6 RGB
    with R=G=B (integer ITU-601 luma of (v,v,v) is exactly v, so the
    hash is format-stable — asserted in test_round5g); doc_id % 31 == 30
    → null payload (err-row contract)."""
    if doc_id % 31 == 30:
        return None
    rows = dhash_gray_rows(doc_id)
    h, w = rows.shape
    if (doc_id // 4) % 3 == 1:
        rgb = rows.repeat(3).tobytes()
        return b"P6 %d %d 255\n" % (w, h) + rgb
    return b"P5 %d %d 255\n" % (w, h) + rows.tobytes()


def dhash_video_frames(vid: int):
    """Deterministic 6-frame 72x64 raster list for the video near-dup
    queries.  Videos in the same trio (vid // 3) share the base
    patterns of frames 0-4 except the variant's own slot (vid % 3),
    which is replaced by a variant-unique pattern — so any two trio
    members share exactly 3 patterned frames.  Frame 5 is all-zero for
    EVERY video: the boilerplate "black frame" whose dHash the
    frequency cap in video_near_dup_pairs must drop.  Shared by the
    Spark fixture payload and the oracle's Python replay."""
    import numpy as np

    g, v = vid // 3, vid % 3
    frames = []
    for f in range(5):
        key = 16 * g + (8 + v if f == v else f)
        frames.append(dhash_gray_rows(key))
    frames.append(np.zeros((64, 72), dtype=np.uint8))
    return frames


def dhash_video_payload_for(vid: int) -> bytes | None:
    """vid → SVID payload carrying dhash_video_frames(vid);
    vid % 17 == 13 → null payload (err-row contract)."""
    import struct

    if vid % 17 == 13:
        return None
    frames = dhash_video_frames(vid)
    h, w = frames[0].shape
    head = (b"SVID" + bytes([1]) + struct.pack("<HHH", w, h, len(frames)))
    return head + b"".join(f.tobytes() for f in frames)
