"""robots.txt crawl-policy layer (RFC 9309 subset): a parsing kernel
and a Catalyst longest-match allow/deny probe.

A Common-Crawl-style ingest needs the crawl-policy side of the source
surface next to the WARC layer (tableio/warc.py): which paths of a host
a polite fetcher may use.  Two pieces:

- ``robots_rules``: mapInPandas kernel turning a robots.txt text column
  into one row per directive ``(id, agent, rule, value, rule_order)``.
  Handles comments, case-insensitive field names, multiple consecutive
  ``User-agent`` lines sharing one group, rules before any group
  (ignored per spec), and ``Sitemap``/``Crawl-delay`` directives.
- ``robots_allowed``: pure-Catalyst probe of ``(id, path)`` rows
  against the rules of one agent (its group exact-match, falling back
  to the ``*`` group): the MOST-SPECIFIC matching pattern wins (most
  octets, RFC 9309 §2.2.2) and ``allow`` beats ``disallow`` on a
  length tie (Google's documented rule); unmatched paths default to
  allowed.  The full §2.2.3 wildcard grammar is interpreted: ``*``
  matches any octet sequence and a trailing ``$`` anchors the pattern
  at the path end — wildcard patterns are translated to anchored Java
  regexes inside Catalyst (regexp_replace chain, no Python per row)
  while literal patterns keep the cheaper ``startswith`` predicate.
  The probe is a rules join + one window over (id, path) — rules
  tables are tiny per host, so at corpus scale this broadcasts.

Reference scope note: the reference suite has no crawl layer — this is
part of the task-mandated Common-Crawl source surface, built
Spark-first.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window, functions as F

_GROUP_FIELDS = ("allow", "disallow", "crawl-delay")


def parse_robots(txt: str) -> list[tuple[str, str, str]]:
    """``(agent, rule, value)`` tuples in file order.  ``sitemap`` rows
    carry agent ``'*'`` (the directive is group-independent per spec)."""
    out: list[tuple[str, str, str]] = []
    agents: list[str] = []
    group_open = False          # consecutive user-agent lines share a group
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if group_open:
                agents = []
                group_open = False
            agents.append(value.lower())
        elif field == "sitemap":
            out.append(("*", "sitemap", value))
        elif field in _GROUP_FIELDS:
            group_open = True
            if field == "disallow" and value == "":
                continue        # empty Disallow = nothing disallowed
            for a in agents:    # rules before any group are dropped
                out.append((a, field, value))
    return out


def robots_rules(df: DataFrame, robots_col: str = "robots",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per directive: ``(id, agent, rule, value, rule_order)``.
    Map-only Arrow kernel; null/empty files yield no rows."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col], pdf[robots_col]):
                if not isinstance(t, str) or not t:
                    continue
                for order, (agent, rule, value) in enumerate(
                        parse_robots(t)):
                    rows.append((i, agent, rule, value, order))
            yield pd.DataFrame(
                rows, columns=[id_col, "agent", "rule", "value",
                               "rule_order"])

    return df.select(id_col, robots_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, agent string, rule string, "
                f"value string, rule_order int"))


def robots_allowed(rules: DataFrame, paths: DataFrame,
                   agent: str = "*", id_col: str = "doc_id",
                   path_col: str = "path") -> DataFrame:
    """``(id, path, allowed)`` for every input path: the most-specific
    (longest-pattern) matching allow/disallow rule wins, allow beats
    disallow on a length tie, no match ⇒ allowed.  ``*`` in a pattern
    matches any octet sequence; a trailing ``$`` anchors at path end
    (RFC 9309 §2.2.3).

    Agent resolution: the agent's own exact group if it has any rules
    for a document, else that document's ``*`` group."""
    agent = agent.lower()
    r = rules.where(F.col("rule").isin("allow", "disallow"))
    own = r.where(F.col("agent") == agent)
    star = r.where(F.col("agent") == "*")
    if agent != "*":
        has_own = own.select(id_col).distinct() \
            .withColumn("__own", F.lit(True))
        star = star.join(has_own, id_col, "left_anti")
        r = own.unionByName(star)
    else:
        r = star
    # Wildcard patterns become anchored regexes built INSIDE Catalyst;
    # literal patterns keep the cheaper startswith predicate.
    anchored = F.col("value").endswith("$")
    r = r.withColumn(
        "__rx", F.regexp_replace(
            "value", r"([.\\+?(){}\[\]|^$])", r"\\$1"))
    r = r.withColumn("__rx", F.regexp_replace("__rx", r"\*", ".*"))
    r = r.withColumn(
        "__rx", F.when(
            anchored,
            F.concat(F.expr("substring(__rx, 1, length(__rx) - 2)"),
                     F.lit("$"))).otherwise(F.col("__rx")))
    r = r.withColumn("__rx", F.concat(F.lit("^"), F.col("__rx")))
    r = r.withColumn("__wild", F.col("value").contains("*") | anchored)
    m = paths.join(
        r, (paths[id_col] == r[id_col])
        & F.when(F.col("__wild"), F.expr(f"rlike({path_col}, __rx)"))
        .otherwise(paths[path_col].startswith(r["value"]))) \
        .select(paths[id_col], F.col(path_col), F.col("rule"),
                F.length("value").alias("__l"))
    w = Window.partitionBy(id_col, path_col) \
        .orderBy(F.desc("__l"), F.asc("rule"))
    best = (m.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(F.col(id_col), F.col(path_col),
                    (F.col("rule") == "allow").alias("__allowed")))
    return (paths.join(best, [id_col, path_col], "left")
            .select(F.col(id_col), F.col(path_col),
                    F.coalesce(F.col("__allowed"), F.lit(True))
                    .alias("allowed")))


def frontier_schedule(rules: DataFrame, paths: DataFrame,
                      agent: str = "*", id_col: str = "doc_id",
                      path_col: str = "path",
                      default_delay_s: float = 1.0) -> DataFrame:
    """Politeness-paced fetch plan: robots-allowed paths per host,
    FIFO-ordered (lexicographic — deterministic), each spaced by the
    host's ``Crawl-delay`` (the agent's own group's value if it has
    one, else the ``*`` group's, else ``default_delay_s``):

        (id, path, seq, delay_s, fetch_offset_s)

    ``fetch_offset_s = seq * delay_s`` is the earliest polite fetch
    time relative to the host's first fetch.  Scale shape: one shuffle
    keyed on the host id — politeness serializes per host by
    definition, so per-host work is inherently sequential and the only
    skew source is a giant host's own URL list (bounded by the
    frontier batch, not the corpus)."""
    agent = agent.lower()
    ok = robots_allowed(rules, paths, agent, id_col, path_col) \
        .where(F.col("allowed")).select(id_col, path_col)
    cd = rules.where((F.col("rule") == "crawl-delay")
                     & F.col("agent").isin(agent, "*"))
    wd = Window.partitionBy(id_col).orderBy(
        F.desc(F.col("agent") == agent), F.asc("rule_order"))
    delays = (cd.withColumn("__rn", F.row_number().over(wd))
              .where(F.col("__rn") == 1)
              .select(F.col(id_col),
                      F.coalesce(F.col("value").cast("double"),
                                 F.lit(float(default_delay_s)))
                      .alias("delay_s")))
    ws = Window.partitionBy(id_col).orderBy(path_col)
    return (ok.join(delays, id_col, "left")
            .withColumn("delay_s", F.coalesce(
                "delay_s", F.lit(float(default_delay_s))))
            .withColumn("seq", F.row_number().over(ws) - F.lit(1))
            .select(F.col(id_col), F.col(path_col), F.col("seq"),
                    F.col("delay_s"),
                    (F.col("seq") * F.col("delay_s"))
                    .alias("fetch_offset_s")))
