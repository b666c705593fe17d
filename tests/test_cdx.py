"""CDX/SURT index layer (kernels/cdx.py): key canonicalization rules,
CDXJ line determinism, and the contiguity property the reversed-host
key exists for."""

import json

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.kernels import cdx


def _keys(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in
            df.select(cdx.surt_key_expr("url")).collect()]


def test_surt_canonicalization_rules(spark):
    got = _keys(spark, [
        "https://www.Example.COM:443/A/b?z=1&a=2#frag",
        "http://example.com:80/",
        "http://sub.example.com/x",
        "example.com/bare",            # schemeless input
        "https://example.com",         # empty path -> '/'
        "https://example.com/p?b=2&a=1&a=0",
    ])
    assert got == [
        "com,example)/a/b?a=2&z=1",
        "com,example)/",
        "com,example,sub)/x",
        "com,example)/bare",
        "com,example)/",
        "com,example)/p?a=0&a=1&b=2",
    ]


def test_surt_groups_domain_captures_contiguously(spark):
    # the point of SURT: one registered domain's captures sort together,
    # other TLDs do not interleave
    keys = sorted(_keys(spark, [
        "https://a.example.org/1", "https://z.example.org/2",
        "https://example.org/3", "https://example.net/4",
    ]))
    org = [k for k in keys if k.startswith("org,example")]
    assert keys.index(org[0]) + len(org) - 1 == keys.index(org[-1])
    assert org == ["org,example)/3", "org,example,a)/1",
                   "org,example,z)/2"]


def test_cdx_line_deterministic_and_parseable(spark):
    df = spark.createDataFrame(
        [("https://www.site.jp/p?b=1&a=2", "2026-03-01 12:34:56",
          bytearray("こんにちは".encode("utf-8")))],
        "url string, warc_ts string, html binary")
    df = df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    row = df.select(cdx.cdx_line_expr("url", "warc_ts", "html")).head()[0]
    key, ts, meta = row.split(" ", 2)
    assert key == "jp,site)/p?a=2&b=1"
    assert ts == "20260301123456"
    parsed = json.loads(meta)
    assert parsed["url"] == "https://www.site.jp/p?b=1&a=2"
    assert parsed["length"] == len("こんにちは".encode("utf-8"))
    assert len(parsed["digest"]) == 32
    # byte determinism: field order pinned by the struct
    assert meta.index('"url"') < meta.index('"digest"') < meta.index(
        '"length"')


def test_cdx_lookup_range_correct_and_pruned(spark, tmp_path):
    # 40 hosts across 4 TLD-ish groups; example.com and its subdomains
    # must come back complete, siblings (example2.com, example-x.com)
    # must not leak into the range
    rows = []
    for i in range(40):
        host = ["example.com", "a.example.com", "example2.com",
                "example-x.com", "other.net"][i % 5]
        rows.append((f"https://{host}/p{i}", "2026-01-01 00:00:00",
                     bytearray(f"<p>{i}</p>".encode())))
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary") \
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    path = str(tmp_path / "cdx")
    cdx.write_cdx_index(df, path, n_shards=8)

    got = cdx.cdx_lookup(spark, path, "example.com")
    keys = [r["surt"] for r in got.collect()]
    assert len(keys) == 16                       # 8 exact + 8 subdomain
    assert all(k.startswith("com,example)") or
               k.startswith("com,example,") for k in keys)

    # both range bounds reach the parquet scan as pushed filters
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(surt" in plan and "LessThan(surt" in plan


def test_surt_prefix_range_bounds():
    lo, hi = cdx.surt_prefix_range("Example.COM")
    assert (lo, hi) == ("com,example", "com,example-")
    assert lo <= "com,example)/x" < hi
    assert lo <= "com,example,sub)/x" < hi
    assert not (lo <= "com,example2)/x" < hi)
    assert not (lo <= "com,example-x)/x" < hi)
    assert not (lo <= "com,exampl)/x" < hi)


def test_cdx_index_shape(spark):
    df = spark.createDataFrame(
        [("https://h/x", "2026-01-01 00:00:00", bytearray(b"<p>x</p>"))],
        "url string, warc_ts string, html binary") \
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    out = cdx.cdx_index(df).collect()
    assert out[0]["surt"] == "h)/x"
    assert out[0]["ts"] == "20260101000000"
    assert out[0]["line"].startswith("h)/x 20260101000000 {")
