import pytest

from image_pdf_ocr_suite_spark import payload as spdf
from image_pdf_ocr_suite_spark.payload import Document, Page, Word


def _doc():
    return Document(pages=[
        Page(100, 60, [Word(1, 1, 1, 1, 10, 12, 15, 10, 80.0, 40.0, "hello"),
                       Word(1, 1, 1, 2, 30, 12, 15, 10, 82.0, 41.0, "world")]),
        Page(100, 30, [Word(1, 1, 1, 1, 10, 12, 15, 10, 90.0, 50.0, None)]),
    ])


def test_roundtrip():
    doc = _doc()
    out = spdf.decode(spdf.encode(doc))
    assert len(out.pages) == 2
    assert out.pages[0].words[1].text == "world"
    assert out.pages[1].words[0].text is None
    assert out.pages[0].words[0].conf_base == 80.0


def test_encode_deterministic():
    assert spdf.encode(_doc()) == spdf.encode(_doc())


def test_sniff():
    assert spdf.sniff(spdf.encode(_doc())) == "spdf"
    assert spdf.sniff(b"<html><body>x</body></html>") == "html"
    assert spdf.sniff(b"  <!doctype html><html>") == "html"
    assert spdf.sniff(b"\x00\x01\x02junk") == "unknown"


def test_encrypted_roundtrip_and_errors():
    doc = _doc()
    enc = spdf.encode(doc, password="pw")
    assert enc[5] & spdf.FLAG_ENCRYPTED
    with pytest.raises(spdf.EncryptedPayloadError):
        spdf.decode(enc)
    with pytest.raises(spdf.EncryptedPayloadError):
        spdf.decode(enc, password="wrong")
    assert len(spdf.decode(enc, password="pw").pages) == 2


def test_remove_password():
    doc = _doc()
    enc = spdf.encode(doc, password="pw")
    plain = spdf.remove_password(enc, "pw")
    assert not (plain[5] & spdf.FLAG_ENCRYPTED)
    assert len(spdf.decode(plain).pages) == 2
    # reference error cases (ocr.py:216-223)
    with pytest.raises(spdf.EncryptedPayloadError):
        spdf.remove_password(spdf.encode(doc), "pw")      # not encrypted
    with pytest.raises(spdf.EncryptedPayloadError):
        spdf.remove_password(enc, "")                      # empty password


def test_corrupt():
    with pytest.raises(spdf.PayloadError):
        spdf.decode(b"SPDF" + bytes([1, 0]) + b"nonsense")
    with pytest.raises(spdf.PayloadError):
        spdf.decode(b"whatever")


def test_split_pages():
    doc = _doc()
    parts = spdf.split_pages(spdf.encode(doc))
    assert len(parts) == 2
    p0 = spdf.decode(parts[0])
    assert len(p0.pages) == 1 and p0.pages[0].words[0].text == "hello"


def test_peek_dims_matches_decode():
    doc = _doc()
    for kwargs in ({}, {"level": 0}):
        payload = spdf.encode(doc, **kwargs)
        ref = spdf.decode(payload).pages[0]
        assert spdf.peek_dims(payload) == (ref.width_px, ref.height_px)
    # big words array: the peek must not need the full stream
    big = Document(pages=[Page(12345, 678, [
        Word(1, 1, i // 10, i % 10, 10.0 * i, 12, 15, 10, 80.0, 40.0,
             f"w{i}") for i in range(5000)])])
    payload = spdf.encode(big)
    assert spdf.peek_dims(payload) == (12345, 678)


def test_peek_dims_error_taxonomy():
    doc = _doc()
    enc = spdf.encode(doc, password="pw")
    assert spdf.peek_dims(enc, password="pw") == (100, 60)
    with pytest.raises(spdf.EncryptedPayloadError):
        spdf.peek_dims(enc)
    with pytest.raises(spdf.EncryptedPayloadError):
        spdf.peek_dims(enc, password="wrong")
    with pytest.raises(spdf.PayloadError):
        spdf.peek_dims(b"whatever")
    with pytest.raises(spdf.PayloadError):
        spdf.peek_dims(b"SPDF" + bytes([1, 0]) + b"nonsense")
    # zero-page document is VALID for decode() — peek_dims surfaces the
    # dedicated subclass, not generic corruption (ADVICE r4)
    with pytest.raises(spdf.EmptyDocumentError):
        spdf.peek_dims(spdf.encode(Document(pages=[])))
    with pytest.raises(spdf.EmptyDocumentError):
        spdf.peek_dims(spdf.encode(Document(pages=[]), level=0))
    # stored+encrypted with a wrong password must be EncryptedPayloadError
    # even though the stored path has no zlib round-trip (ADVICE r4)
    stored_enc = spdf.encode(doc, password="pw", level=0)
    assert spdf.peek_dims(stored_enc, password="pw") == (100, 60)
    with pytest.raises(spdf.EncryptedPayloadError):
        spdf.peek_dims(stored_enc, password="wrong")
