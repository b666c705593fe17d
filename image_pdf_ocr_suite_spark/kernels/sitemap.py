"""Sitemap XML parsing (sitemaps.org protocol): the third leg of the
Common-Crawl source surface next to WARC (tableio/warc.py) and
robots.txt (kernels/robots.py — whose parser already surfaces the
``Sitemap:`` directive this kernel consumes).

``sitemap_entries`` is a map-only Arrow kernel turning a sitemap XML
column into one row per ``<url>``/``<sitemap>`` element:

    (id, seq, kind, loc, lastmod, changefreq, priority, err)

- ``kind`` is ``'url'`` for ``<urlset>`` children and ``'sitemap'``
  for ``<sitemapindex>`` children (index files chain to sub-sitemaps;
  the caller recurses by re-feeding fetched children).
- Namespaces are matched by LOCAL tag name (the protocol requires
  ``xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"`` but real
  files carry variant/absent namespaces).
- Malformed XML or an unexpected root never fails a task: the document
  yields exactly one row with ``err`` set and everything else null —
  the same quarantine-not-crash contract as the WARC parser.
- ``lastmod`` stays a string (W3C datetime, timezone-variant);
  ``priority`` parses to double where float-valid, else null.

Reference scope note: the reference suite has no crawl layer; this is
part of the task-mandated Common-Crawl source surface, built
Spark-first.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator, Optional

from pyspark.sql import DataFrame

_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(xml_text: str) -> tuple[list[dict], Optional[str]]:
    """``([entry, ...], err)``: entries in document order, or an error
    string for malformed XML / an unexpected root element."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:
        return [], f"xml parse error: {exc}"
    root_tag = _local(root.tag)
    if root_tag == "urlset":
        child_tag, kind = "url", "url"
    elif root_tag == "sitemapindex":
        child_tag, kind = "sitemap", "sitemap"
    else:
        return [], f"unexpected root element: {root_tag}"
    out: list[dict] = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        entry: dict = {"kind": kind}
        for sub in el:
            name = _local(sub.tag)
            if name in _FIELDS:
                entry[name] = (sub.text or "").strip() or None
        if entry.get("loc"):
            out.append(entry)
    return out, None


def _priority_or_null(value: Optional[str]) -> Optional[float]:
    if value is None:
        return None
    try:
        return float(value)
    except ValueError:
        return None


def sitemap_entries(df: DataFrame, xml_col: str = "sitemap",
                    id_col: str = "doc_id") -> DataFrame:
    """One row per sitemap entry (or one err row per bad document).
    Map-only Arrow kernel; no shuffle."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, xml_text in zip(pdf[id_col], pdf[xml_col]):
                if not isinstance(xml_text, str) or not xml_text:
                    rows.append((i, 0, None, None, None, None, None,
                                 "empty sitemap document"))
                    continue
                entries, err = parse_sitemap(xml_text)
                if err is not None:
                    rows.append((i, 0, None, None, None, None, None, err))
                    continue
                for seq, e in enumerate(entries):
                    rows.append((
                        i, seq, e["kind"], e.get("loc"),
                        e.get("lastmod"), e.get("changefreq"),
                        _priority_or_null(e.get("priority")), None))
            yield pd.DataFrame(
                rows, columns=[id_col, "seq", "kind", "loc", "lastmod",
                               "changefreq", "priority", "err"])

    return df.select(id_col, xml_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, seq int, kind string, loc string, "
                f"lastmod string, changefreq string, priority double, "
                f"err string"))
