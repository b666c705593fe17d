"""Charset detection ladder (kernels/charset.py): BOM > meta >
strict-UTF-8 > deterministic heuristic, and the Spark decode kernel."""

import codecs

from image_pdf_ocr_suite_spark.kernels import charset


def test_bom_wins_and_is_stripped():
    data = codecs.BOM_UTF8 + "a".encode("utf-8")
    assert charset.detect_charset(data) == ("utf-8", "bom")
    text, enc, src, rep = charset.decode_bytes(data)
    assert (text, enc, src, rep) == ("a", "utf-8", "bom", False)
    data = codecs.BOM_UTF16_LE + "hi".encode("utf-16-le")
    assert charset.decode_bytes(data)[:3] == ("hi", "utf-16-le", "bom")
    data = codecs.BOM_UTF16_BE + "hi".encode("utf-16-be")
    assert charset.decode_bytes(data)[:3] == ("hi", "utf-16-be", "bom")


def test_meta_labels_and_aliases():
    sjis = "<meta charset=Shift_JIS><p>こんにちは</p>".encode("shift_jis")
    text, enc, src, rep = charset.decode_bytes(sjis)
    assert (enc, src, rep) == ("shift_jis", "meta", False)
    assert "こんにちは" in text
    # http-equiv form + alias normalization + quoting
    euc = ('<meta http-equiv="Content-Type" '
           'content="text/html; charset=x-euc-jp"><p>日本</p>').encode("euc_jp")
    assert charset.decode_bytes(euc)[1:3] == ("euc_jp", "meta")
    # unknown label falls through the ladder (here: valid UTF-8)
    unk = '<meta charset=klingon><p>x</p>'.encode("utf-8")
    assert charset.decode_bytes(unk)[1:3] == ("utf-8", "valid-utf8")
    # WHATWG: a meta tag claiming UTF-16 is read as UTF-8
    lie = '<meta charset=utf-16><p>x</p>'.encode("utf-8")
    assert charset.decode_bytes(lie)[1:3] == ("utf-8", "meta")


def test_meta_scan_is_bounded_to_1024_bytes():
    pad = b"<!--" + b"x" * 1100 + b"-->"
    data = pad + '<meta charset=latin-1>café'.encode("utf-8")
    # the meta sits past the scan window -> valid-utf8 decides
    assert charset.decode_bytes(data)[1:3] == ("utf-8", "valid-utf8")


def test_heuristic_ladder_order_is_deterministic():
    # valid shift_jis, invalid utf-8, no meta
    sjis = "<p>日本語テキスト</p>".encode("shift_jis")
    assert charset.decode_bytes(sjis)[1:3] == ("shift_jis", "heuristic")
    # invalid utf-8 AND invalid sjis/euc -> latin-1 backstop
    lat = b"caf\xe9 au lait"
    text, enc, src, rep = charset.decode_bytes(lat)
    assert (text, enc, src, rep) == ("café au lait", "latin-1",
                                     "heuristic", False)


def test_lying_meta_replaces_never_raises():
    # claims sjis but carries bytes invalid in sjis
    data = b"<meta charset=sjis>\xff\xfe\xff"
    text, enc, src, rep = charset.decode_bytes(data)
    assert (enc, src, rep) == ("shift_jis", "meta", True)
    assert "�" in text


def test_empty_and_none():
    assert charset.decode_bytes(None) == ("", "utf-8", "valid-utf8", False)
    assert charset.decode_bytes(b"") == ("", "utf-8", "valid-utf8", False)


def test_spark_decode_kernel(spark):
    rows = [
        (0, "<meta charset=utf-8><p>a é</p>".encode("utf-8")),
        (1, "<meta charset=Shift_JIS><p>こんにちは</p>".encode("shift_jis")),
        (2, codecs.BOM_UTF16_LE + "<p>u16</p>".encode("utf-16-le")),
        (3, b"caf\xe9"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r["doc_id"]: r for r in charset.decode_html(df).collect()}
    assert got[0]["encoding"] == "utf-8"
    assert got[1]["text"] == "<meta charset=Shift_JIS><p>こんにちは</p>"
    assert got[2]["text"] == "<p>u16</p>"
    assert got[2]["charset_source"] == "bom"
    assert got[3]["text"] == "café"
    assert got[4]["text"] == ""
    assert not any(r["had_replacement"] for r in got.values())
