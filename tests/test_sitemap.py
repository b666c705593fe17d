"""Sitemap XML kernel (kernels/sitemap.py): protocol fixtures, the
index form, namespace tolerance, and the err-row contract."""

from image_pdf_ocr_suite_spark.kernels import sitemap

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url><loc>https://x/a</loc><lastmod>2026-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://x/b</loc></url>
  <url><priority>0.3</priority></url>  <!-- no loc: dropped -->
</urlset>"""

INDEX = f"""<sitemapindex {NS}>
  <sitemap><loc>https://x/s1.xml</loc><lastmod>2026-02-03</lastmod></sitemap>
</sitemapindex>"""


def test_urlset_entries_in_order():
    entries, err = sitemap.parse_sitemap(URLSET)
    assert err is None
    assert [e["loc"] for e in entries] == ["https://x/a", "https://x/b"]
    assert entries[0]["lastmod"] == "2026-01-02"
    assert entries[0]["changefreq"] == "daily"
    assert entries[0]["priority"] == "0.8"
    assert "lastmod" not in entries[1]


def test_sitemapindex_and_no_namespace():
    entries, err = sitemap.parse_sitemap(INDEX)
    assert err is None and entries[0]["kind"] == "sitemap"
    bare, err = sitemap.parse_sitemap(
        "<urlset><url><loc>/u</loc></url></urlset>")
    assert err is None and bare[0]["loc"] == "/u"


def test_malformed_and_wrong_root():
    entries, err = sitemap.parse_sitemap("<urlset><url></urlset>")
    assert entries == [] and "xml parse error" in err
    entries, err = sitemap.parse_sitemap("<rss></rss>")
    assert entries == [] and "unexpected root" in err


def test_spark_kernel_rows_and_err_contract(spark):
    df = spark.createDataFrame(
        [(1, URLSET), (2, INDEX), (3, "<oops"), (4, None)],
        "doc_id long, sitemap string")
    got = sitemap.sitemap_entries(df).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert [r["loc"] for r in sorted(by_id[1], key=lambda r: r["seq"])] \
        == ["https://x/a", "https://x/b"]
    assert by_id[1][0]["priority"] == 0.8
    assert by_id[2][0]["kind"] == "sitemap"
    assert by_id[3][0]["err"].startswith("xml parse error")
    assert by_id[4][0]["err"] == "empty sitemap document"
    assert len(got) == 5
