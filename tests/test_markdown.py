"""HTML → Markdown serialization (kernels/markdown.py): hand-pinned
hostile cases, the synthesis round-trip, and a hypothesis differential
property against an independent block-assembly model."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from image_pdf_ocr_suite_spark.kernels.markdown import (
    build_markdown_html, html_to_markdown)


def md(page: str) -> str:
    return html_to_markdown(page)[0]


# ---------------------------------------------------------------------------
# pinned serialization rules
# ---------------------------------------------------------------------------

def test_heading_levels_and_transparency():
    assert md("<h1>Top</h1>") == "# Top"
    assert md("<h6><span>deep <b>bold</b></span></h6>") == \
        "###### deep **bold**"
    assert md("<h2>  </h2>") == ""            # ws-only heading skipped


def test_paragraph_inline_wrapping():
    assert md('<p>a <i>b</i> <code>c d</code> <a href="/x">lnk</a></p>') == \
        "a *b* `c d` [lnk](/x)"
    assert md('<p><img src="/i.png" alt="alt text"></p>') == \
        "![alt text](/i.png)"
    assert md("<p>x &amp; y &lt;z&gt;</p>") == "x & y <z>"


def test_whole_inline_collapse():
    # the collapse runs over the ASSEMBLED inline string, so marker
    # glue participates like character data does
    assert md("<p>a <b>\tx</b> b</p>") == "a ** x** b"
    assert md("<p>a <b> </b> b</p>") == "a ** ** b"


def test_lists_nesting_and_implicit_close():
    page = "<ul><li>a<ul><li>sub</li></ul><li>b</li></ul>"
    assert md(page) == "- a\n  - sub\n- b"
    assert md("<ol><li>x</li><li> </li><li>y</li></ol>") == "1. x\n2. y"


def test_transparent_block_boundaries_are_word_boundaries():
    # block tags inside <li>/<blockquote> are transparent but must not
    # fuse adjacent words (review fix)
    assert md("<ul><li><p>one</p><p>two</p></li></ul>") == "- one two"
    assert md("<blockquote><p>a</p><p>b</p></blockquote>") == "> a b"
    assert md("<ul><li>a<div>b</div>c</li></ul>") == "- a b c"


def test_pre_inside_list_keeps_document_order():
    got = md("<ul><li>a<pre>code</pre></li><li>b</li></ul>")
    assert got == "- a\n```\ncode\n```\n- b"


def test_blockquote_and_pre_raw():
    assert md("<blockquote>quoted  text</blockquote>") == "> quoted text"
    got = md("<pre><code>def f():\n    return  1\n</code></pre>")
    assert got == "```\ndef f():\n    return  1\n```"
    # <p> inside blockquote is transparent; <br> in pre is a newline;
    # an unclosed <pre> still flushes at EOF
    assert md("<blockquote><p>a</p> b</blockquote>") == "> a b"
    assert md("<pre>x<br>y</pre>") == "```\nx\ny\n```"
    assert md("<pre>tail code") == "```\ntail code\n```"


def test_skip_tags_gate_all_handlers():
    # <noscript>/<template> CONTENT arrives as markup (round-5k rule):
    # block/inline handlers inside must not fire either
    page = ("<noscript><p>hidden</p><ul><li>no</li></ul></noscript>"
            "<template><h1>tpl</h1></template>"
            "<script># fake md\n</script><style>p{}</style>"
            "<p>real</p>")
    assert md(page) == "real"


def test_bare_text_becomes_paragraph():
    assert md("<div>loose text<h1>H</h1>tail</div>") == \
        "loose text\n\n# H\n\ntail"


def test_hostile_markup_never_raises():
    for page in ["<p>a", "</ul></li></b>", "<a>x", "<li>orphan</li>",
                 "<pre>unclosed", "<b><i>cross</b></i>",
                 "<a href='u'><p>block in anchor</p></a>", ""]:
        m, n = html_to_markdown(page)
        assert isinstance(m, str) and n >= 0


def test_anchor_cross_buffer_degrades_to_empty_suffix():
    # anchor opened in one buffer, closed in another: no crash, the
    # bracket is closed with an empty href marker
    m = md("<p><a href='/u'>x</p><p>y</a> z</p>")
    assert "[x" in m and "z" in m


# ---------------------------------------------------------------------------
# synthesis round-trip (the driver query's exact shape)
# ---------------------------------------------------------------------------

def test_synthesis_round_trip_examples():
    got = md(build_markdown_html(0, "key agg row scan slow fast part hash"))
    assert got.splitlines()[0] == "# key"
    assert "- slow\n  - key\n- fast" in got   # tok(8) wraps to tok(0)
    assert "> Quote: agg" in got
    assert got.endswith("Footer 0")
    got3 = md(build_markdown_html(3, "a b c d e f g h i j"))
    assert "1. " in got3 and "2. " in got3      # odd doc: ordered list


# ---------------------------------------------------------------------------
# hypothesis differential: random block docs vs an independent model
# ---------------------------------------------------------------------------

token = st.text(alphabet="ab*_[]&<'\" \t", min_size=1, max_size=6)
words = st.lists(token, min_size=1, max_size=4)


def _c(s: str) -> str:
    return " ".join(s.split())


@st.composite
def block(draw):
    """(html, expected_markdown_block_or_None) — expected assembled
    directly, independent of the parser."""
    import html as _h
    kind = draw(st.sampled_from(["h", "p", "ul", "ol", "bq", "pre"]))
    ws = draw(words)
    esc = [_h.escape(w) for w in ws]
    if kind == "h":
        lvl = draw(st.integers(1, 6))
        txt = _c(" ".join(ws))
        return (f"<h{lvl}>{' '.join(esc)}</h{lvl}>",
                ("#" * lvl + " " + txt) if txt else None)
    if kind == "p":
        txt = _c(" ".join(ws))
        return (f"<p>{' '.join(esc)}</p>", txt if txt else None)
    if kind == "bq":
        txt = _c(" ".join(ws))
        return (f"<blockquote>{' '.join(esc)}</blockquote>",
                ("> " + txt) if txt else None)
    if kind == "pre":
        raw = "\n".join(ws)
        body = raw.strip("\n")
        return (f"<pre>{_h.escape(raw)}</pre>",
                f"```\n{body}\n```" if body.strip() else None)
    marker_ordered = kind == "ol"
    lines, n = [], 0
    for w, e in zip(ws, esc):
        t = _c(w)
        if not t:
            continue
        n += 1
        lines.append(f"{n}. {t}" if marker_ordered else f"- {t}")
    html = f"<{kind}>" + "".join(f"<li>{e}</li>" for e in esc) + f"</{kind}>"
    return (html, "\n".join(lines) if lines else None)


@settings(max_examples=300, deadline=None)
@given(blocks=st.lists(block(), min_size=0, max_size=6))
def test_differential_block_assembly(blocks):
    page = "<html><body>" + "".join(h for h, _ in blocks) + "</body></html>"
    expected = [e for _, e in blocks if e is not None]
    got_md, got_n = html_to_markdown(page)
    assert got_md == "\n\n".join(expected)
    assert got_n == len(expected)
