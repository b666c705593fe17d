"""Fast HTML tokenizer (kernels/html.py _scan_fast) == stdlib parser.

The fast path accepts a strict well-formed subset and reruns the stdlib
parser otherwise; these tests pin byte-equality of extract_main_text
across both implementations on hand-picked edge constructs AND a
hypothesis fuzzer over html-ish fragment soup (no Spark session —
pure-kernel, fast).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from image_pdf_ocr_suite_spark.kernels.html import (
    _DensityParser, _scan_fast, extract_main_text)

LONG = "this text is comfortably longer than the minimum block length"

EDGES = [
    "<p>%s</p>" % LONG,
    "<p>entities &amp; &lt;x&gt; &#65;&#x42; &copy &unknown; %s</p>" % LONG,
    "<P CLASS='X'>%s</P>" % LONG,
    "<p>%s" % LONG,                                   # unclosed at EOF
    "<script>var a = '<p>no</p>';</script><p>%s</p>" % LONG,
    "<script>no close %s" % LONG,                     # cdata to EOF
    "<style>p{}</style><p>%s</p>" % LONG,
    "<script/><p>%s</p>" % LONG,                      # self-closing: no cdata
    "<!-- c --><p>%s</p>" % LONG,
    "<!-- c -- ><p>%s</p>" % LONG,                    # _commentclose '--\\s*>'
    "<!-- no close <p>%s</p>" % LONG,
    "<!DOCTYPE html><p>%s</p>" % LONG,
    "<!bogus decl><p>%s</p>" % LONG,
    "<![CDATA[x]]><p>%s</p>" % LONG,                  # marked section
    "<?pi '<p>x</p>' ?><p>%s</p>" % LONG,
    "<p>bare < five < six %s</p>" % LONG,
    "<p>tail lt %s <</p>" % LONG,
    "<p title='a>b'>quoted gt %s</p>" % LONG,
    '<p title="a>b">quoted gt %s</p>' % LONG,
    "<p class=unq data-flag>%s</p>" % LONG,
    "<p =>weird attr %s</p>" % LONG,
    "<p / >slash space %s</p>" % LONG,
    "<p>end spaced %s</ p>" % LONG,
    "<p>numeric end %s</123>" % LONG,
    "<p>trunc tag %s <div" % LONG,
    "<p>trunc entity %s &am" % LONG,
    "<p>ampersand & alone %s</p>" % LONG,
    "<div><ul><li><a href='/'>nav</a></li></ul>%s</div>" % LONG,
    "<td>%s</td>" % LONG,
    "",
    "no tags at all %s" % LONG,
    "<p>日本語テキスト、十分な長さがあるので保持される。%s</p>" % LONG,
]


def test_edge_constructs_equal():
    for h in EDGES:
        assert extract_main_text(h, impl="fast") \
            == extract_main_text(h, impl="stdlib"), h[:80]


def test_fast_path_actually_fast_path():
    # common well-formed doc must NOT fall back
    p = _DensityParser()
    assert _scan_fast("<html><body><p>%s</p></body></html>" % LONG, p)
    # marked section must fall back
    p = _DensityParser()
    assert not _scan_fast("<![CDATA[x]]><p>%s</p>" % LONG, p)


_FRAG = st.one_of(
    st.sampled_from([
        "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
        "<br/>", "<span title='a>b'>", "</span>", "<script>", "</script>",
        "<script>", "</ScRiPt >", "<style>", "</style>", "<!-- x -->",
        "<!--", "-->", "<!DOCTYPE html>", "<![IGNORE[x]]>", "<?pi?>",
        "<", ">", "&", "&amp;", "&#65;", "&am", "&#", "</", "</>",
        "</ p>", "<p class=u>", "<p =>", "<td>", "</td>", "<li>", "</li>",
        "<div/>", "< p>", "<1tag>", "\n", " ", "<p", "=x>", "'", '"',
    ]),
    st.text(
        alphabet=st.characters(codec="utf-8",
                               exclude_characters="\x00"),
        min_size=0, max_size=30),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_FRAG, min_size=0, max_size=24))
def test_fuzz_fast_equals_stdlib(frags):
    h = "".join(frags)
    assert extract_main_text(h, impl="fast") \
        == extract_main_text(h, impl="stdlib")
