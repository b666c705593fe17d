"""robots.txt layer (kernels/robots.py): parser fixtures and the
longest-match allow/deny probe semantics."""

from pyspark.sql import functions as F

from image_pdf_ocr_suite_spark.kernels import robots


FIXTURE = """
# global group
User-Agent: *
Disallow: /tmp
ALLOW: /tmp/ok       # case-insensitive field names
Crawl-delay: 4

User-agent: alpha
User-agent: beta     # two agents share one group
Disallow: /a

Sitemap: https://x/s.xml
Disallow: /orphan
"""


def test_parse_groups_and_directives():
    rules = robots.parse_robots(FIXTURE)
    assert ("*", "disallow", "/tmp") in rules
    assert ("*", "allow", "/tmp/ok") in rules
    assert ("*", "crawl-delay", "4") in rules
    assert ("alpha", "disallow", "/a") in rules
    assert ("beta", "disallow", "/a") in rules
    assert ("*", "sitemap", "https://x/s.xml") in rules
    # the trailing Disallow belongs to the alpha/beta group, and the
    # leading comment/blank lines produce nothing
    assert ("alpha", "disallow", "/orphan") in rules
    assert ("*", "disallow", "/orphan") not in rules


def test_rules_before_any_group_are_dropped_and_empty_disallow():
    rules = robots.parse_robots(
        "Disallow: /early\nUser-agent: *\nDisallow:\nAllow: /x")
    assert rules == [("*", "allow", "/x")]


def _probe(spark, txt, paths, agent="*"):
    df = spark.createDataFrame([(1, txt)], "doc_id long, robots string")
    rules = robots.robots_rules(df)
    pdf = spark.createDataFrame([(1, p) for p in paths],
                                "doc_id long, path string")
    out = robots.robots_allowed(rules, pdf, agent=agent)
    return {r["path"]: r["allowed"] for r in out.collect()}


def test_longest_match_and_tie_break(spark):
    txt = ("User-agent: *\nDisallow: /shop\nAllow: /shop/sale\n"
           "Disallow: /shop/sale\n")        # tie: allow wins
    got = _probe(spark, txt, ["/shop/x", "/shop/sale/y", "/elsewhere"])
    assert got["/shop/x"] is False           # disallowed prefix
    assert got["/shop/sale/y"] is True       # longer allow + tie rule
    assert got["/elsewhere"] is True         # unmatched default


def test_prefix_is_not_path_boundary(spark):
    got = _probe(spark, "User-agent: *\nDisallow: /p3\n",
                 ["/p3rivate", "/p3/x", "/p"])
    assert got["/p3rivate"] is False
    assert got["/p3/x"] is False
    assert got["/p"] is True


def test_agent_group_overrides_star(spark):
    txt = ("User-agent: *\nDisallow: /everyone\n"
           "User-agent: fetcher\nDisallow: /only-fetcher\n")
    star = _probe(spark, txt, ["/everyone/x", "/only-fetcher/x"])
    fetch = _probe(spark, txt, ["/everyone/x", "/only-fetcher/x"],
                   agent="fetcher")
    assert star == {"/everyone/x": False, "/only-fetcher/x": True}
    # fetcher has its OWN group -> the * group no longer applies
    assert fetch == {"/everyone/x": True, "/only-fetcher/x": False}


def test_agent_without_own_group_falls_back_to_star(spark):
    txt = "User-agent: *\nDisallow: /x\n"
    got = _probe(spark, txt, ["/x/1", "/y"], agent="newbot")
    assert got == {"/x/1": False, "/y": True}


def test_wildcard_star_and_end_anchor(spark):
    txt = ("User-agent: *\n"
           "Disallow: /dl/*.exe$\n"       # anchored wildcard (len 10)
           "Allow: /dl/ok*\n")            # open wildcard (len 7)
    got = _probe(spark, txt, [
        "/dl/x.exe",        # anchored disallow hits
        "/dl/x.exe.txt",    # $ prevents the match
        "/dl/okx.exe",      # both match: disallow is LONGER -> denied
        "/dl/oky",          # only the allow matches
        "/dl/other",        # nothing matches
    ])
    assert got == {"/dl/x.exe": False, "/dl/x.exe.txt": True,
                   "/dl/okx.exe": False, "/dl/oky": True,
                   "/dl/other": True}


def test_frontier_schedule_pacing_and_delay_resolution(spark):
    txt = ("User-agent: *\nDisallow: /x\nCrawl-delay: 2\n"
           "User-agent: fetcher\nCrawl-delay: 5\nDisallow: /y\n")
    df = spark.createDataFrame([(1, txt), (2, "User-agent: *\nAllow: /\n")],
                               "doc_id long, robots string")
    rules = robots.robots_rules(df)
    paths = spark.createDataFrame(
        [(1, "/c"), (1, "/a"), (1, "/x/blocked"), (1, "/b"),
         (2, "/only")],
        "doc_id long, path string")
    out = {(r["doc_id"], r["path"]):
           (r["seq"], r["delay_s"], r["fetch_offset_s"])
           for r in robots.frontier_schedule(rules, paths).collect()}
    # blocked path never scheduled; FIFO is lexicographic; * delay = 2
    assert (1, "/x/blocked") not in out
    assert out[(1, "/a")] == (0, 2.0, 0.0)
    assert out[(1, "/b")] == (1, 2.0, 2.0)
    assert out[(1, "/c")] == (2, 2.0, 4.0)
    # host with no crawl-delay falls back to the default (1.0)
    assert out[(2, "/only")] == (0, 1.0, 0.0)
    # the fetcher agent resolves ITS group's delay (5) and its rules
    fetch = {(r["doc_id"], r["path"]): r["fetch_offset_s"]
             for r in robots.frontier_schedule(
                 rules, paths, agent="fetcher").collect()}
    assert fetch[(1, "/x/blocked")] == 15.0  # /x allowed; seq 3 x delay 5
    assert (1, "/y") not in fetch


def test_wildcard_mid_pattern_and_regex_metachars(spark):
    # '.' and '+' in patterns are literal octets, never regex syntax
    txt = ("User-agent: *\n"
           "Disallow: /a/*/sec\n"
           "Disallow: /f.g+h\n")
    got = _probe(spark, txt, [
        "/a/x/sec", "/a/x/y/sec2",   # '*' spans octets incl. '/'
        "/a/sec",                    # '*' cannot absorb the '/sec' slash
        "/f.g+h/x",                  # literal dot & plus
        "/fXgYh",                    # must NOT match as regex
    ])
    assert got == {"/a/x/sec": False, "/a/x/y/sec2": False,
                   "/a/sec": True, "/f.g+h/x": False, "/fXgYh": True}
