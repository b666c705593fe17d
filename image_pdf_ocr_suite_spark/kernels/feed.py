"""RSS/Atom feed parsing: the syndication leg of the crawl-discovery
surface next to sitemaps (kernels/sitemap.py) — crawlers discover fresh
URLs from feeds exactly like from sitemaps, and a Common-Crawl-style
ingest treats both as URL sources with freshness metadata.

``feed_entries`` is a map-only Arrow kernel turning a feed XML column
into one row per ``<item>`` (RSS 2.0) / ``<entry>`` (Atom):

    (id, seq, kind, title, link, published, entry_id, err)

- ``kind`` is ``'rss'`` or ``'atom'`` from the root element.
- Elements are matched by LOCAL tag name (Atom requires the
  ``http://www.w3.org/2005/Atom`` namespace, RSS 2.0 none; real feeds
  carry variants, same policy as the sitemap kernel).
- RSS: ``link`` is element text, ``published`` is ``<pubDate>``,
  ``entry_id`` is ``<guid>``.  Atom: ``link`` is the ``href`` attr of
  the first ``<link>`` whose ``rel`` is absent or ``alternate``,
  ``published`` prefers ``<published>`` over ``<updated>``,
  ``entry_id`` is ``<id>``.
- Malformed XML or an unexpected root yields exactly one row with
  ``err`` set — the quarantine-not-crash contract shared with the WARC
  and sitemap parsers.

Reference scope note: the reference suite has no crawl layer; this is
part of the task-mandated Common-Crawl source surface, built
Spark-first.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator, Optional

from pyspark.sql import DataFrame


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _child_text(el, name: str) -> Optional[str]:
    for sub in el:
        if _local(sub.tag) == name:
            return (sub.text or "").strip() or None
    return None


def _atom_link(el) -> Optional[str]:
    for sub in el:
        if _local(sub.tag) != "link":
            continue
        rel = (sub.get("rel") or "alternate").lower()
        if rel == "alternate" and sub.get("href"):
            return sub.get("href").strip() or None
    return None


def parse_feed(xml_text: str) -> tuple[list[dict], Optional[str]]:
    """``([entry, ...], err)``: entries in document order, or an error
    string for malformed XML / an unexpected root element."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:
        return [], f"xml parse error: {exc}"
    root_tag = _local(root.tag)
    out: list[dict] = []
    if root_tag == "rss":
        channel = next((c for c in root if _local(c.tag) == "channel"),
                       None)
        if channel is None:
            return [], "rss document has no channel element"
        for el in channel:
            if _local(el.tag) != "item":
                continue
            out.append({
                "kind": "rss",
                "title": _child_text(el, "title"),
                "link": _child_text(el, "link"),
                "published": _child_text(el, "pubdate"),
                "entry_id": _child_text(el, "guid"),
            })
    elif root_tag == "feed":
        for el in root:
            if _local(el.tag) != "entry":
                continue
            out.append({
                "kind": "atom",
                "title": _child_text(el, "title"),
                "link": _atom_link(el),
                "published": (_child_text(el, "published")
                              or _child_text(el, "updated")),
                "entry_id": _child_text(el, "id"),
            })
    else:
        return [], f"unexpected root element: {root_tag}"
    return [e for e in out if e.get("link")], None


def feed_entries(df: DataFrame, xml_col: str = "feed",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per feed entry (or one err row per bad document).
    Map-only Arrow kernel; no shuffle."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, xml_text in zip(pdf[id_col], pdf[xml_col]):
                if not isinstance(xml_text, str) or not xml_text:
                    rows.append((i, 0, None, None, None, None, None,
                                 "empty feed document"))
                    continue
                entries, err = parse_feed(xml_text)
                if err is not None:
                    rows.append((i, 0, None, None, None, None, None, err))
                    continue
                for seq, e in enumerate(entries):
                    rows.append((i, seq, e["kind"], e.get("title"),
                                 e.get("link"), e.get("published"),
                                 e.get("entry_id"), None))
            yield pd.DataFrame(
                rows, columns=[id_col, "seq", "kind", "title", "link",
                               "published", "entry_id", "err"])

    return df.select(id_col, xml_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, seq int, kind string, title string, "
                f"link string, published string, entry_id string, "
                f"err string"))
