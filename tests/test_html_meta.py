"""Head-metadata extraction (kernels/html.py _MetaParser)."""

from image_pdf_ocr_suite_spark.kernels import html


def test_full_field_set():
    doc = ('<html lang="en-US"><head><title> My  Page \n Title </title>'
           '<meta name="Description" content=" the summary ">'
           '<link rel="canonical stylesheet" href="https://x/c">'
           '<meta property="og:title" content="OG title">'
           '<meta property="og:image" content="https://x/i.png">'
           '</head><body><p>hi</p></body></html>')
    got = html.extract_page_meta(doc)
    assert got["title"] == "My Page Title"          # whitespace collapsed
    assert got["description"] == "the summary"       # case-insensitive name
    assert got["canonical"] == "https://x/c"         # rel token list
    assert got["html_lang"] == "en-US"
    assert got["og_title"] == "OG title"
    assert got["og_image"] == "https://x/i.png"
    assert "og_type" not in got


def test_first_occurrence_wins_and_unclosed_title():
    doc = ("<title>first</title><title>second</title>"
           "<meta name=description content=a>"
           "<meta name=description content=b>")
    got = html.extract_page_meta(doc)
    assert got["title"] == "first" and got["description"] == "a"
    assert html.extract_page_meta("<head><title>dangling")[
        "title"] == "dangling"


def test_empty_and_bodyless():
    assert html.extract_page_meta("") == {}
    assert html.extract_page_meta("<p>no head</p>") == {}


def test_spark_extract_metadata_charset_aware(spark):
    sjis = ('<meta charset=Shift_JIS><html lang="ja">'
            '<head><title>日本語の題名</title></head>').encode("shift_jis")
    plain = b"<title>ok</title>"
    df = spark.createDataFrame([("u1", sjis), ("u2", plain), ("u3", None)],
                               "url string, html binary")
    got = {r["url"]: r for r in html.extract_metadata(df).collect()}
    assert got["u1"]["title"] == "日本語の題名"
    assert got["u1"]["html_lang"] == "ja"
    assert got["u2"]["title"] == "ok"
    assert got["u2"]["description"] is None
    assert got["u3"]["title"] is None
