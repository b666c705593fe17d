"""JSON-LD structured-data extraction (kernels/jsonld.py)."""
from image_pdf_ocr_suite_spark.kernels import jsonld as J


PAGE = """<html><head>
<script type="application/ld+json">
{"@type":"NewsArticle","headline":"H1","datePublished":"2026-01-02"}
</script>
<script type=" Application/LD+JSON ">[
 {"@type":["Product","Thing"],"name":"P"},
 {"@type":"Organization","name":"O","url":"https://o.example"}]
</script>
<script type="application/ld+json">{"@graph":[
 {"@type":"WebSite","name":"W"}, "junk"]}</script>
<script type="application/ld+json">{broken</script>
<template><script type="application/ld+json">{"@type":"Ghost"}</script>
</template>
<noscript><script type="application/ld+json">{"@type":"NoScript"}</script>
</noscript>
<script type="text/javascript">var x = {"@type":"NotLd"};</script>
</head><body><p>body</p></body></html>"""


def test_items_typed_fields():
    rows = J.jsonld_items(PAGE)
    assert rows == [
        (0, 0, "NewsArticle", "H1", "2026-01-02", None, None),
        (1, 0, "Product", "P", None, None, None),
        (1, 1, "Organization", "O", None, "https://o.example", None),
        (2, 0, "WebSite", "W", None, None, None),
        (2, 1, None, None, None, None, "item"),
        (3, 0, None, None, None, None, "json"),
    ]


def test_inert_and_non_ld_blocks_ignored():
    # template/noscript content and non-LD scripts produced no rows
    types = {r[2] for r in J.jsonld_items(PAGE)}
    assert "Ghost" not in types and "NoScript" not in types
    assert J.jsonld_items("<p>no scripts at all</p>") == []
    # name falls back to headline only when name is absent
    got = J.jsonld_items('<script type="application/ld+json">'
                         '{"@type":"Article","name":"N","headline":"H"}'
                         '</script>')
    assert got == [(0, 0, "Article", "N", None, None, None)]
    # non-string field values treated as absent, not coerced
    got = J.jsonld_items('<script type="application/ld+json">'
                         '{"@type":"E","name":{"x":1},"url":["a"]}'
                         '</script>')
    assert got == [(0, 0, "E", None, None, None, None)]


def test_blank_blocks_skipped_not_err():
    # whitespace-only / self-closed blocks: absent content, not 'json'
    assert J.jsonld_items('<script type="application/ld+json">  \n'
                          '</script>') == []
    got = J.jsonld_items('<script type="application/ld+json"/>'
                         '<script type="application/ld+json">'
                         '{"@type":"T"}</script>')
    assert got == [(1, 0, "T", None, None, None, None)]


def test_unclosed_markup_never_raises():
    assert J.jsonld_items('<script type="application/ld+json">{"@type"') \
        == []  # block never closed -> never collected
    assert J.jsonld_items("<template><script type='application/ld+json'>"
                          '{"@type":"T"}</script>') == []


def test_spark_extract_jsonld(spark):
    import pyspark.sql.functions as F

    pages = spark.createDataFrame(
        [("u1", PAGE.encode()), ("u2", b"<p>nothing</p>"), ("u3", None)],
        "url string, html binary")
    out = J.extract_jsonld(pages).orderBy("blk_idx", "item_idx").collect()
    assert {r.url for r in out} == {"u1"}
    assert len(out) == 6
    assert out[0].item_type == "NewsArticle"
    assert out[0].date_published == "2026-01-02"
    assert [r.err for r in out].count("json") == 1
    # plan: map-only, column-pruned scan, no exchange
    plan = J.extract_jsonld(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
