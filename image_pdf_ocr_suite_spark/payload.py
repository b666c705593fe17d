"""SPDF — the fixture-internal synthetic image-PDF payload container.

The sandbox has no PyMuPDF/Pillow/tesseract, so the repo defines its own
deterministic, self-describing byte format standing in for an image-PDF
(FIXTURES.md F2).  A payload carries an ordered list of pages; each page
carries the geometry + ground-truth word boxes (Tesseract-TSV shape, see
/root/reference/image_pdf_ocr/ocr.py:82-87) that the deterministic OCR
backend reports, plus explicit base/preprocessed confidence values so the
adaptive-OCR decision (ocr.py:48-79) is exactly controllable from fixtures.

Wire format::

    b"SPDF" | version:u8 (=1) | flags:u8 | zlib(json-utf8 body)

flags bit0: encrypted.  An encrypted payload's body is XOR-obfuscated with a
key derived from the password — enough to make "wrong password" detectable
(a decrypt that doesn't round-trip the magic check fails), mirroring the
reference's password-removal semantics (ocr.py:198-241) without real crypto.

Raising taxonomy mirrors the reference error classes (ocr.py:22-31):
``PayloadError`` ≈ OCRConversionError ("PDFファイルを開けませんでした"),
``EncryptedPayloadError`` ≈ PDFPasswordRemovalError.
"""

from __future__ import annotations

import json
import zlib
from dataclasses import dataclass, field

MAGIC = b"SPDF"
VERSION = 1
FLAG_ENCRYPTED = 0x01
FLAG_STORED = 0x02  # body is raw JSON (no zlib) — for short-lived payloads


class PayloadError(ValueError):
    """Corrupt / unreadable payload (≈ reference OCRConversionError)."""


class EncryptedPayloadError(PayloadError):
    """Encrypted payload without / with wrong password
    (≈ reference PDFPasswordRemovalError, ocr.py:227-233)."""


class EmptyDocumentError(PayloadError):
    """Valid document with zero pages — peek_dims has no page-0 geometry
    to report, but the payload itself is NOT corrupt (decode() returns an
    empty Document for it).  Subclasses PayloadError so quarantine paths
    that catch the base class keep working."""


@dataclass
class Word:
    """One ground-truth word box in Tesseract TSV shape (ocr.py:82-87).

    ``conf_base`` / ``conf_pre`` are the confidences the deterministic OCR
    backend reports on the base raster vs. the preprocessed (×1.5 upscaled,
    binarized) raster; ``text`` may be None (Tesseract emits NaN text rows —
    exercised by the fillna("") at ocr.py:131).
    """

    block: int
    par: int
    line: int
    word: int
    left: float
    top: float
    width: float
    height: float
    conf_base: float
    conf_pre: float
    text: str | None

    def to_json(self) -> list:
        return [self.block, self.par, self.line, self.word, self.left, self.top,
                self.width, self.height, self.conf_base, self.conf_pre, self.text]

    @staticmethod
    def from_json(v: list) -> "Word":
        return Word(*v)


@dataclass
class Page:
    """One page: raster geometry at 300 dpi (ocr.py:482) + ground truth."""

    width_px: int
    height_px: int
    words: list[Word] = field(default_factory=list)
    # deterministic shade used when synthesizing the raster (0..255 ink level)
    ink: int = 40

    def to_json(self) -> dict:
        return {"w": self.width_px, "h": self.height_px, "ink": self.ink,
                "words": [w.to_json() for w in self.words]}

    @staticmethod
    def from_json(d: dict) -> "Page":
        return Page(d["w"], d["h"], [Word.from_json(w) for w in d["words"]], d.get("ink", 40))


@dataclass
class Document:
    pages: list[Page] = field(default_factory=list)


def _xor(data: bytes, password: str) -> bytes:
    key = zlib.crc32(password.encode("utf-8")).to_bytes(4, "big")
    return bytes(b ^ key[i % 4] for i, b in enumerate(data))


def encode(doc: Document, password: str | None = None, level: int = 6) -> bytes:
    """``level=0`` stores the body uncompressed (FLAG_STORED) — right for
    payloads that live only across one shuffle hop, where zlib CPU costs
    more than the bytes saved."""
    body = json.dumps(
        {"pages": [p.to_json() for p in doc.pages]},
        ensure_ascii=False, separators=(",", ":"), sort_keys=True,
    ).encode("utf-8")
    flags = 0
    if level > 0:
        body = zlib.compress(body, level=level)
    else:
        flags |= FLAG_STORED
    if password is not None:
        body = _xor(body, password)
        flags |= FLAG_ENCRYPTED
    return MAGIC + bytes([VERSION, flags]) + body


def sniff(payload: bytes) -> str:
    """Classify a raw payload: 'spdf' | 'html' | 'unknown'.

    Dispatch rule for the Common-Crawl-style input table (FIXTURES.md F1):
    SPDF containers go down the OCR path, HTML bytes down the DOM
    text-density boilerplate-strip path.
    """
    if payload is None:
        return "unknown"
    if payload[:4] == MAGIC:
        return "spdf"
    head = payload[:256].lstrip()
    if head[:1] == b"<" or b"<html" in head.lower():
        return "html"
    return "unknown"


def decode(payload: bytes, password: str | None = None) -> Document:
    if payload is None or len(payload) < 6 or payload[:4] != MAGIC:
        raise PayloadError("not an SPDF payload")
    version, flags = payload[4], payload[5]
    if version != VERSION:
        raise PayloadError(f"unsupported SPDF version {version}")
    body = payload[6:]
    if flags & FLAG_ENCRYPTED:
        if not password:
            raise EncryptedPayloadError("payload is encrypted and no password was given")
        body = _xor(body, password)
    try:
        if flags & FLAG_STORED:
            obj = json.loads(body.decode("utf-8"))
        else:
            obj = json.loads(zlib.decompress(body).decode("utf-8"))
    except Exception as exc:
        if flags & FLAG_ENCRYPTED:
            raise EncryptedPayloadError("wrong password") from exc
        raise PayloadError(f"corrupt SPDF body: {exc}") from exc
    return Document(pages=[Page.from_json(p) for p in obj["pages"]])


_DIMS_RE = None  # compiled lazily; see peek_dims


def peek_dims(payload: bytes, password: str | None = None) -> tuple[int, int]:
    """``(width_px, height_px)`` of page 0 WITHOUT decoding the document.

    The body is ``json.dumps(..., sort_keys=True)``, so a page object
    serializes ``{"h":H,"ink":I,"w":W,"words":[...]}`` — the geometry keys
    sort ahead of the word-box bulk.  A bounded partial zlib decompress
    (``decompressobj().decompress(body, 160)``) therefore yields the dims
    while touching only the head of the stream: no full inflate, no JSON
    parse of the words.  This is the single-decode path for P3's
    max-extent pass (the full ``decode`` used to run twice per image).

    Raises the same taxonomy as :func:`decode` — ``PayloadError`` for
    non-SPDF/corrupt input, ``EncryptedPayloadError`` for missing/wrong
    password (including the stored+encrypted path, verified against the
    JSON head), ``EmptyDocumentError`` for a valid zero-page document.
    """
    global _DIMS_RE
    if _DIMS_RE is None:
        import re
        _DIMS_RE = re.compile(rb'^\{"pages":\[\{"h":(\d+),"ink":(\d+),"w":(\d+),')
    if payload is None or len(payload) < 6 or payload[:4] != MAGIC:
        raise PayloadError("not an SPDF payload")
    version, flags = payload[4], payload[5]
    if version != VERSION:
        raise PayloadError(f"unsupported SPDF version {version}")
    body = payload[6:]
    if flags & FLAG_ENCRYPTED:
        if not password:
            raise EncryptedPayloadError("payload is encrypted and no password was given")
        body = _xor(body, password)
    if flags & FLAG_STORED:
        head = body[:160]
        # the stored path has no zlib round-trip to catch a wrong XOR
        # password — verify the decrypted head is a pages object so the
        # taxonomy matches decode() (ADVICE r4)
        if (flags & FLAG_ENCRYPTED) and not head.startswith(b'{"pages"'):
            raise EncryptedPayloadError("wrong password")
    else:
        try:
            head = zlib.decompressobj().decompress(body, 160)
        except Exception as exc:
            if flags & FLAG_ENCRYPTED:
                raise EncryptedPayloadError("wrong password") from exc
            raise PayloadError(f"corrupt SPDF body: {exc}") from exc
    m = _DIMS_RE.match(head)
    if m is None:
        # a zero-page document ({"pages":[]}) is VALID for decode(); keep
        # peek_dims' taxonomy aligned — it has no page 0, which is a
        # caller-level condition, not payload corruption (ADVICE r4)
        if head.startswith(b'{"pages":[]'):
            raise EmptyDocumentError("document has no pages")
        raise PayloadError("SPDF body has no page-0 geometry header")
    return int(m.group(3)), int(m.group(1))


def remove_password(payload: bytes, password: str) -> bytes:
    """Re-encode without encryption (≈ remove_pdf_password, ocr.py:198-241).

    Mirrors the reference's error cases: not-encrypted input, empty password,
    wrong password.
    """
    if payload[:4] != MAGIC:
        raise PayloadError("not an SPDF payload")
    if not (payload[5] & FLAG_ENCRYPTED):
        raise EncryptedPayloadError("payload is not encrypted")  # ocr.py:221-223
    if not password:
        raise EncryptedPayloadError("password must not be empty")  # ocr.py:216-218
    return encode(decode(payload, password))


def split_pages(payload: bytes) -> list[bytes]:
    """Split a (decryptable) document payload into standalone single-page
    payloads — the unit of work for the page-exploded scale path (one giant
    scanned doc must not pin one task; SURVEY §4 skew handling)."""
    doc = decode(payload)
    # stored (uncompressed): page payloads live only across one shuffle hop
    # — shuffle-level lz4 already covers the wire, zlib here is pure waste
    return [encode(Document(pages=[p]), level=0) for p in doc.pages]
