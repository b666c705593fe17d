"""RSS/Atom feed kernel (kernels/feed.py): both syndication dialects,
the Atom link-rel selection rule, published/updated fallback, and the
err-row contract shared with the sitemap/WARC parsers."""

from image_pdf_ocr_suite_spark.kernels import feed

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Chan</title><link>https://site/</link>
  <item><title>First</title><link>https://site/1</link>
        <pubDate>Mon, 05 Jan 2026 00:00:00 GMT</pubDate>
        <guid>tag:1</guid></item>
  <item><title>Second</title><link>https://site/2</link></item>
  <item><title>no link: dropped</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Feed</title>
  <entry><title>A1</title>
         <link rel="self" href="https://self/x"/>
         <link href="https://site/a1"/>
         <published>2026-02-01T00:00:00Z</published>
         <updated>2026-02-09T00:00:00Z</updated>
         <id>urn:a1</id></entry>
  <entry><title>A2</title>
         <link rel="alternate" href="https://site/a2"/>
         <updated>2026-02-02T00:00:00Z</updated></entry>
</feed>"""


def test_rss_items_in_order():
    entries, err = feed.parse_feed(RSS)
    assert err is None
    assert [e["link"] for e in entries] == ["https://site/1",
                                            "https://site/2"]
    assert entries[0]["kind"] == "rss"
    assert entries[0]["published"] == "Mon, 05 Jan 2026 00:00:00 GMT"
    assert entries[0]["entry_id"] == "tag:1"
    assert entries[1]["published"] is None


def test_atom_link_rel_and_published_fallback():
    entries, err = feed.parse_feed(ATOM)
    assert err is None
    # rel="self" skipped; bare href and rel="alternate" both accepted
    assert [e["link"] for e in entries] == ["https://site/a1",
                                            "https://site/a2"]
    assert entries[0]["published"] == "2026-02-01T00:00:00Z"  # not updated
    assert entries[1]["published"] == "2026-02-02T00:00:00Z"  # fallback
    assert entries[0]["entry_id"] == "urn:a1"
    assert entries[1]["entry_id"] is None


def test_malformed_and_unexpected_roots():
    entries, err = feed.parse_feed("<rss><channel><item><title>x")
    assert entries == [] and err.startswith("xml parse error")
    entries, err = feed.parse_feed("<html></html>")
    assert entries == [] and err.startswith("unexpected root")
    entries, err = feed.parse_feed("<rss version='2.0'></rss>")
    assert entries == [] and err == "rss document has no channel element"


def test_spark_kernel_err_rows(spark):
    df = spark.createDataFrame(
        [(1, RSS), (2, "<broken"), (3, None)],
        "doc_id long, feed string")
    rows = {(r["doc_id"], r["seq"]): r
            for r in feed.feed_entries(df).collect()}
    assert rows[(1, 0)]["link"] == "https://site/1"
    assert rows[(1, 1)]["kind"] == "rss"
    assert rows[(2, 0)]["err"].startswith("xml parse error")
    assert rows[(3, 0)]["err"] == "empty feed document"
