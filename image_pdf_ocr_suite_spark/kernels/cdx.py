"""CDX capture-index layer: SURT keys and CDXJ index lines — the
lookup-side of the Common-Crawl source surface (next to WARC ingest,
tableio/warc.py).  Crawl archives are addressed through a CDX index
whose primary key is the SURT (Sort-friendly URI Reordering Transform)
of the capture URL: reversing the host labels makes one domain's
captures lexicographically contiguous, so a sorted, range-partitioned
index prunes a domain lookup to one partition — the property this
module exists to provide at 10^12-document scale.

Everything here is PURE CATALYST (string expressions — no Python
worker, no shuffle):

- ``surt_key_expr``: canonicalized SURT key.  Canonicalization rules
  (documented subset of the public urlcanon "semantic" profile):
  fragment dropped, scheme dropped, host lowercased with a leading
  ``www.`` label stripped and a default-port suffix removed, path +
  query lowercased, query parameters sorted.  Key shape:
  ``com,example)/path?a=1&b=2``.
- ``cdx_line_expr``: one CDXJ line per capture —
  ``<surt> <yyyyMMddHHmmss> <json>`` with the JSON field order pinned
  by the struct (url, digest, length), so index bytes are
  deterministic and a rebuilt index is byte-identical.

Scale note: a CDX index table written ``sortWithinPartitions(surt)``
and range-partitioned on the key IS the classic CDX shard layout; a
domain lookup becomes one partition scan with a tight key range — no
full-index pass.

Reference scope note: the reference suite has no crawl layer; this is
part of the task-mandated Common-Crawl source surface, built
Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _host_and_rest(url: Column) -> tuple[Column, Column]:
    """(hostport-lowered, path+query) after fragment/scheme removal."""
    base = F.regexp_replace(url, "#.*$", "")
    no_scheme = F.regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(no_scheme, "^([^/?]*)", 1))
    rest = F.lower(F.regexp_extract(no_scheme, "^[^/?]*(.*)$", 1))
    return hostport, rest


def surt_key_expr(url_col) -> Column:
    """SURT key of a URL column (string expression, no Python).

    ``https://www.Example.COM:443/A/b?z=1&a=2#frag`` →
    ``com,example)/a/b?a=2&z=1``."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    hostport, rest = _host_and_rest(url)
    host = F.regexp_replace(hostport, ":(80|443)$", "")
    host = F.regexp_replace(host, "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev, F.lit(")"), path,
        F.when(query == "", F.lit(""))
         .otherwise(F.concat(F.lit("?"), sorted_q)))


def cdx_line_expr(url_col, ts_col, body_col) -> Column:
    """One CDXJ index line per capture: SURT key, 14-digit timestamp,
    JSON payload (url, md5 digest of the body, octet length) — field
    order pinned by the struct so index bytes are deterministic."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    body = F.col(body_col) if isinstance(body_col, str) else body_col
    ts = F.date_format(F.col(ts_col) if isinstance(ts_col, str) else ts_col,
                       "yyyyMMddHHmmss")
    meta = F.to_json(F.struct(
        url.alias("url"),
        F.md5(body).alias("digest"),
        F.octet_length(body).alias("length")))
    return F.concat(surt_key_expr(url), F.lit(" "), ts, F.lit(" "), meta)


def cdx_index(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts",
              body_col: str = "html") -> DataFrame:
    """CDX index rows ``(surt, ts, line)`` for a pages table — the
    write side of the index.  Map-only projection; the caller persists
    it ``repartitionByRange(surt).sortWithinPartitions(surt, ts)`` for
    the range-pruned lookup layout (one partition per key range)."""
    return pages.select(
        surt_key_expr(url_col).alias("surt"),
        F.date_format(ts_col, "yyyyMMddHHmmss").alias("ts"),
        cdx_line_expr(url_col, ts_col, body_col).alias("line"))


def write_cdx_index(pages: DataFrame, path: str, n_shards: int = 16,
                    url_col: str = "url", ts_col: str = "warc_ts",
                    body_col: str = "html") -> None:
    """Persist the classic CDX shard layout: rows range-partitioned on
    the SURT key and sorted (surt, ts) within each shard, so one
    parquet file holds one contiguous key range with tight min/max
    statistics.  A domain lookup then reads the one or two shards whose
    range overlaps the domain prefix — everything else prunes on
    row-group stats (see ``cdx_lookup``)."""
    (cdx_index(pages, url_col, ts_col, body_col)
     .repartitionByRange(n_shards, "surt")
     .sortWithinPartitions("surt", "ts")
     .write.mode("overwrite").parquet(path))


def surt_prefix_range(domain: str) -> tuple[str, str]:
    """Half-open SURT key range covering one registered domain and all
    its subdomains: ``example.com`` → ``['com,example', 'com,example-')``.
    Every key of the domain continues the reversed-label prefix with
    ``')'`` (0x29, exact host) or ``','`` (0x2C, subdomain); the upper
    bound appends ``'-'`` (0x2D, the smallest character above both), so
    the range admits exactly those keys — hostname labels are
    ``[a-z0-9-]``, so a longer sibling label (``example2``,
    ``example-x``) sorts at or above the bound and is excluded."""
    rev = ",".join(reversed(domain.lower().lstrip(".").split(".")))
    return rev, rev + "-"


def cdx_lookup(spark, path: str, domain: str) -> DataFrame:
    """All captures of ``domain`` (and subdomains) from a persisted CDX
    layout — a key-range scan: both bounds reach the parquet reader as
    PushedFilters, and the sorted range-partitioned layout turns them
    into shard + row-group pruning (plan-asserted in test_cdx.py).  No
    shuffle; output arrives (surt, ts)-sorted within each file."""
    lo, hi = surt_prefix_range(domain)
    return (spark.read.parquet(path)
            .where((F.col("surt") >= lo) & (F.col("surt") < hi)))
