"""Line-number parity (send_event LineNum, htmerl_sax_utf8.erl:3437-3447).

The reference counts every consumed '\\n' exactly once — batch runs via
find_stop/count_newlines (:3589-3607) and per-char states via the ?i macro
(38 sites) — and delivers the line_num current at each user fold call.
Consequences pinned here:

* #chars tokens are emitted BEFORE the run's newlines are counted
  (:158-161), but the characters SAX event only fires at the buffer FLUSH
  (maybe_pop_text), so its line is the flush point's line.
* start/end element events carry the line AFTER the whole tag was consumed
  (newlines inside tags count: ?i sites + quoted-value find_stop).
* Q30: '&' directly followed by '\\n' advances line_num by 2 — the
  character_reference state counts it (?i, :1681-1682) without consuming,
  and the return state re-scans and counts it again.
"""
import htmpark


def ev_lines(html, **kw):
    pairs, tb = htmpark.parse_events(html, with_lines=True, **kw)
    return pairs, tb


def line_of(pairs, pred):
    for ev, ln in pairs:
        if pred(ev):
            return ln
    raise AssertionError(f"no event matched in {pairs}")


def is_start(name):
    return lambda ev: isinstance(ev, tuple) and ev[0] == "startElement" and ev[2] == name


def is_end(name):
    return lambda ev: isinstance(ev, tuple) and ev[0] == "endElement" and ev[2] == name


def is_chars(text):
    return lambda ev: isinstance(ev, tuple) and ev[0] == "characters" and ev[1] == text


def test_basic_multiline_text():
    pairs, _ = ev_lines(b"<p>a\nb</p>\n<p>c</p>")
    assert line_of(pairs, lambda e: e == "startDocument") == 1
    assert line_of(pairs, is_start("p")) == 1
    # 'a\nb' collapses to 'a b'; flushed at </p> after its newline counted
    assert line_of(pairs, is_chars("a b")) == 2
    assert line_of(pairs, is_end("p")) == 2
    # inter-paragraph '\n' -> empty chars event (Q3), flushed at 2nd <p>
    assert line_of(pairs, is_chars("")) == 3
    assert line_of(pairs, is_chars("c")) == 3
    assert line_of(pairs, lambda e: e == "endDocument") == 3


def test_newlines_inside_tag_count():
    pairs, _ = ev_lines(b'<div\nclass="x\ny">t</div>')
    assert line_of(pairs, is_start("div")) == 3  # ws \n + quoted-value \n
    assert line_of(pairs, is_chars("t")) == 3
    # single-quoted value forces the slow tag machine: same accounting
    pairs2, _ = ev_lines(b"<div\nclass='x\ny'>t</div>")
    assert line_of(pairs2, is_start("div")) == 3


def test_charref_newline_double_count_q30():
    # '&' directly before '\n': line advances by 2 (counted in
    # character_reference AND again by the re-scanning data state)
    pairs, _ = ev_lines(b"<p>a &\nb</p>")
    assert line_of(pairs, is_end("p")) == 3  # 1 newline, counted twice
    # control: no '&' -> the same newline counts once
    ctrl, _ = ev_lines(b"<p>a \nb</p>")
    assert line_of(ctrl, is_end("p")) == 2
    # '&' then entity then newline: normal single count
    ent, _ = ev_lines(b"<p>a &amp;\nb</p>")
    assert line_of(ent, is_end("p")) == 2


def test_rcdata_and_script_runs():
    pairs, _ = ev_lines(b"<title>a\nb</title>")
    assert line_of(pairs, is_start("title")) == 1
    assert line_of(pairs, is_chars("a b")) == 2  # flushed at </title>
    assert line_of(pairs, is_end("title")) == 2

    sc, _ = ev_lines(b"<script>a\nb</script>")
    assert line_of(sc, is_start("script")) == 1
    assert line_of(sc, is_chars("a b")) == 2
    assert line_of(sc, is_end("script")) == 2


def test_comment_and_doctype_lines():
    pairs, _ = ev_lines(b"<!--a\nb-->\n<p>x</p>")
    assert line_of(pairs, lambda e: isinstance(e, tuple) and e[0] == "comment") == 2
    assert line_of(pairs, is_start("p")) == 3

    dt, _ = ev_lines(b"<!DOCTYPE\nhtml>\n<p>x</p>")
    assert line_of(dt, lambda e: isinstance(e, tuple) and e[0] == "startDTD") == 2
    assert line_of(dt, is_start("p")) == 3


def test_trailing_newlines_reach_end_document():
    pairs, _ = ev_lines(b"<p>a</p>\n\n")
    assert line_of(pairs, lambda e: e == "endDocument") == 3


def test_pre_preserves_text_and_lines():
    pairs, _ = ev_lines(b"<pre>a\nb\nc</pre>")
    assert line_of(pairs, is_chars("a\nb\nc")) == 3
    assert line_of(pairs, is_end("pre")) == 3


def test_bogus_comment_counts_newlines():
    pairs, _ = ev_lines(b"</?x\ny>\n<p>t</p>")
    # '</?' -> bogus comment consuming through '>' incl. its newline
    assert line_of(pairs, lambda e: isinstance(e, tuple) and e[0] == "comment") == 2
    assert line_of(pairs, is_start("p")) == 3


def test_default_parse_events_shape_unchanged():
    evs, _ = htmpark.parse_events(b"<p>x</p>")
    assert evs[0] == "startDocument"
    assert all(not (isinstance(e, tuple) and isinstance(e[-1], int) and e[0] == "characters")
               or True for e in evs)  # plain events, no line tuples
    pairs, _ = htmpark.parse_events(b"<p>x</p>", with_lines=True)
    assert all(isinstance(p, tuple) and isinstance(p[1], int) for p in pairs)
    assert [p[0] for p in pairs] == evs


def test_node_table_lines():
    pre = b"<html>\n<head><title></title></head>\n<body>\n<p>"
    post = b"</p>\n</body>\n</html>"
    rows, tb = htmpark.parse_nodes(pre + b"Doc text here" + post)
    assert tb.finished
    got = [(r[0], r[2], r[3], r[9]) for r in rows]
    assert got == [
        (0, "element", "html", 1),
        (1, "text", "", 2),
        (2, "element", "head", 2),
        (3, "element", "title", 2),
        (4, "text", "", 3),
        (5, "element", "body", 3),
        (6, "text", "", 4),
        (7, "element", "p", 4),
        (8, "text", "", 4),
        (9, "text", "", 5),
        (10, "text", "", 6),
    ]
    assert rows[8][6] == "Doc text here"


def test_sax_fold_default_equals_parse_events():
    html = b"<p>a\nb</p><ul><li>x<li>y</ul>"
    events, _ = htmpark.parse_events(html)
    folded, tb = htmpark.sax(html)
    assert folded == events
    assert tb.finished


def test_sax_fold_linenum_argument():
    """An htmerl event_fun that logs LineNum ports directly: same 3-arg
    signature, same values."""
    def fun(ev, line, acc):
        if isinstance(ev, tuple) and ev[0] == "startElement":
            acc.append((ev[2], line))
        return acc

    acc, _ = htmpark.sax(b"<div>\n<p>x</p>\n<p>y</p>\n</div>",
                         event_fun=fun, user_state=[])
    assert acc == [("html", 1), ("head", 1), ("body", 1), ("div", 1),
                   ("p", 2), ("p", 3)]


def test_line_invariants_property():
    """For inputs without '&' (no Q30) every event line is monotonic and the
    final endDocument line equals 1 + #newlines (all consumed newlines count
    exactly once)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="a<>/pdiv \n\"'=!-", max_size=120))
    def check(s):
        pairs, tb = htmpark.parse_events(s.encode(), with_lines=True)
        lines = [ln for _, ln in pairs]
        assert all(b >= a for a, b in zip(lines, lines[1:]))
        if tb.finished:  # D5 stub paths never dispatch eof
            assert pairs[-1][0] == "endDocument"
            assert pairs[-1][1] == 1 + s.count("\n")

    check()


def test_script_escaped_newlines():
    # escaped-script state newlines go through per-char ?i emission
    pairs, _ = ev_lines(b"<script>x<!--a\nb--></script>")
    assert line_of(pairs, is_chars("x<!--a b-->")) == 2
    assert line_of(pairs, is_end("script")) == 2


def test_plaintext_and_cdata_and_rawtext_runs():
    pairs, _ = ev_lines(b"<p></p><plaintext>a\nb")
    assert line_of(pairs, is_chars("a b")) == 2
    assert line_of(pairs, lambda e: e == "endDocument") == 2

    cd, _ = ev_lines(b"<p><![CDATA[a\nb]]>c</p>")  # Q14: CDATA unconditional
    assert line_of(cd, is_chars("a bc")) == 2

    st, _ = ev_lines(b"<style>a\nb</style>")
    assert line_of(st, is_chars("a b")) == 2


def test_doctype_identifier_newline_and_lazy_start_document():
    """Newlines inside quoted DOCTYPE identifiers count (?i clauses), and
    startDocument is sent LAZILY at the first token dispatch with the line
    current at that moment (reference initial mode, :1916-1929)."""
    pairs, _ = ev_lines(b'<!DOCTYPE html PUBLIC "p\nq">\n<p>x</p>')
    assert line_of(pairs, lambda e: e == "startDocument") == 2
    assert line_of(pairs, lambda e: isinstance(e, tuple) and e[0] == "startDTD") == 2
    assert line_of(pairs, is_start("p")) == 3


def test_attr_value_charref_newline_q30():
    # Q30 also fires inside quoted attribute values
    pairs, _ = ev_lines(b'<div class="x &\ny">t</div>')
    assert line_of(pairs, is_start("div")) == 3


def test_rcdata_end_tag_with_ws_newline():
    pairs, _ = ev_lines(b"<title>a</title\n>done")
    assert line_of(pairs, is_end("title")) == 2
    assert line_of(pairs, is_chars("done")) == 2


def test_bogus_comment_eof_unfinished_line():
    # D5: comment emitted without eof; its line includes consumed newlines
    pairs, tb = ev_lines(b"<!xa\nb")
    assert not tb.finished
    assert pairs[-1][0] == ("comment", "xa\nb")
    assert pairs[-1][1] == 2


def test_crlf_normalized_before_counting():
    # Q1: \r\n and \r normalize to \n before tokenizing; counting follows
    pairs, _ = ev_lines(b"<p>a\r\nb\rc</p>")
    assert line_of(pairs, is_end("p")) == 3
