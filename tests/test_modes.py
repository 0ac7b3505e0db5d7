"""Insertion-mode depth probes (htmerl_sax_utf8.erl:1911-3260) beyond the
quirk ledger: table family, select, template, ruby, foreign content, and
reference-specific non-behaviors (no implied </p> on block start, etc.)."""
import htmpark as hp

H = "http://www.w3.org/1999/xhtml"
M = "http://www.w3.org/1998/Math/MathML"


def ev(frag, **kw):
    events, tb = hp.parse_events(frag, **kw)
    return events


def el_seq(frag):
    return [(e[0].replace("Element", ""), e[2])
            for e in ev(frag) if e[0].endswith("Element")]


def txt(frag, **kw):
    t, _ = hp.extract_text(frag, **kw)
    return t


def test_no_implied_p_close_on_block_start():
    # the spec closes <p> before <div>; the reference just nests (:2221-2270)
    seq = el_seq(b"<body><p>a<div>b</div>c</p>")
    assert seq.index(("start", "div")) < seq.index(("end", "p"))
    assert txt(b"<body><p>a<div>b</div>c</p>") == "abc"


def test_caption_closes_into_table():
    frag = b"<table><caption>cap<td>x</table>after"
    # <td> in in_caption pops caption (is_open) then re-dispatches in_table
    seq = el_seq(frag)
    assert ("start", "caption") in seq and ("end", "caption") in seq
    i_cap_end = seq.index(("end", "caption"))
    assert seq.index(("start", "tbody")) > i_cap_end
    assert txt(frag) == "capxafter"


def test_colgroup_col_void_and_exit():
    frag = b"<table><colgroup><col span=2><col></colgroup><tr><td>a</table>"
    seq = el_seq(frag)
    assert seq.count(("start", "col")) == 2
    assert seq.count(("end", "col")) == 2  # void-added (:2733-2735)
    assert txt(frag) == "a"


def test_col_implies_colgroup():
    seq = el_seq(b"<table><col><tr><td>a</table>")
    assert seq.index(("start", "colgroup")) < seq.index(("start", "col"))


def test_td_implies_tbody_tr():
    seq = el_seq(b"<table><td>a</table>")
    assert [n for k, n in seq if k == "start"][:4] == ["html", "head", "body", "table"]
    names = [n for k, n in seq if k == "start"]
    assert names[4:7] == ["tbody", "tr", "td"]


def test_tr_closes_tr():
    frag = b"<table><tr><td>a<tr><td>b</table>"
    seq = el_seq(frag)
    assert seq.count(("start", "tr")) == 2
    # first tr closed before second opens (in_row :2864-2880 via in_cell)
    first_end = seq.index(("end", "tr"))
    second_start = [i for i, x in enumerate(seq) if x == ("start", "tr")][1]
    assert first_end < second_start


def test_nested_table_start_closes_outer():
    # <table> inside in_table pops the open table and the token itself is
    # DROPPED — not re-added (:2588-2595); the following rows land in an
    # implied tbody with no enclosing table
    frag = b"<table><tr><td>a</td></tr><table><tr><td>b</table>"
    seq = el_seq(frag)
    assert seq.count(("start", "table")) == 1
    assert seq.count(("end", "table")) == 1
    # second <tr> lands in in_table_body directly: no second tbody implied
    assert seq.count(("start", "tbody")) == 1
    t, meta = hp.extract_text(frag)
    assert t == "ab"
    # eof arrives in in_cell -> reference finishes then crashes on the mode
    # restore (deviation D4): we keep the document + flag it
    assert meta["crashed_after_finish"]


def test_select_option_optgroup():
    frag = (b"<select><option>one<option>two<optgroup label=g>"
            b"<option>three</optgroup></select>after")
    seq = el_seq(frag)
    assert seq.count(("start", "option")) == 3
    assert seq.count(("end", "option")) == 3
    assert txt(frag) == "onetwothreeafter"


def test_select_nul_and_nested_select_closes():  # Q21, :3072-3082
    # NUL inside a text RUN arrives as a #chars batch which bypasses
    # dispatch entirely (Q4), so in_select's NUL-drop clause (:2999-3000,
    # which matches only single #char tokens) never sees it: the NUL
    # SURVIVES in the text.  The clause is effectively dead code — every
    # single-#char source (charrefs, rcdata, plaintext) masks NUL to U+FFFD
    # before emission.
    assert txt(b"<select>a\x00b<select>c") == "a\x00bc"
    seq = el_seq(b"<select>a<select>b")
    assert seq.count(("start", "select")) == 1
    assert seq.count(("end", "select")) == 1


def test_select_input_closes_select():
    seq = el_seq(b"<body><select><option>a<input>b</body>")
    # input in in_select pops the select (:3083-3096); the input token
    # itself is DISCARDED (not re-dispatched)
    assert ("start", "input") not in seq
    assert seq.index(("end", "select")) < len(seq)


def test_template_in_head_content_flows_to_body_modes():
    frag = b"<head><template><tr><td>x</td></tr></template></head>y"
    events = ev(frag)
    assert ("characters", "x") in events
    seq = el_seq(frag)
    assert ("start", "template") in seq and ("end", "template") in seq


def test_template_eof_with_open_template_finishes():
    t, meta = hp.extract_text(b"<template><p>x")
    assert meta["finished"]
    assert t == "x"


def test_template_eof_without_template_unfinished():
    # in_template + eof + template not open -> swallowed (D5, :3205-3208)
    # (mode in_template with no open template is not reachable from clean
    # input; covered via the stub-mode flag instead)
    t, meta = hp.extract_text(b"<frameset>")
    assert not meta["finished"]


def test_math_namespace_and_attr_adjust():
    frag = b'<body><math definitionurl="u"><mi>x</mi>t</math>u</body>'
    events = ev(frag)
    math = next(e for e in events if e[0] == "startElement" and e[2] == "math")
    assert math[1] == M
    assert math[4] == [(M, "", "definitionURL", "u")]
    mi = next(e for e in events if e[0] == "startElement" and e[2] == "mi")
    assert mi[1] == M  # unknown tag inherits the mathml namespace
    assert txt(frag) == "xtu"


def test_xlink_attr_in_svg():
    frag = b'<body><svg><a xlink:href="h">t</a></svg></body>'
    events = ev(frag)
    a = next(e for e in events if e[0] == "startElement" and e[2] == "a")
    assert a[4] == [("http://www.w3.org/1999/xlink", "xlink", "href", "h")]
    # NOTE: <a> is in the reference's in_body formatting list, so inside svg
    # it is still added as an HTML element (the clause fires before the
    # namespace check, :2251)
    assert a[1] == H


def test_html_end_tag_inside_svg_pops_by_namespace():
    # </p> inside svg looks up ('svg','p') which is not open -> ignored
    frag = b"<body><svg><p></p>t</svg>u</body>"
    seq = el_seq(frag)
    # <p> is a known html tag -> added as HTML element (stack 'p'),
    # </p> catch-all uses svg ns -> ('svg','p') not open -> ignored (Q-note)
    assert ("start", "p") in seq
    assert txt(frag) == "tu"


def test_ruby_implied_end_tags():
    frag = b"<body><ruby>base<rt>anno<rt>anno2</ruby>x</body>"
    seq = el_seq(frag)
    assert seq.count(("start", "rt")) == 2
    assert seq.count(("end", "rt")) == 2
    assert txt(frag) == "baseannoanno2x"


def test_plaintext_tokenizer_switch():
    # everything after <plaintext> is literal text (:3618-3619)
    assert txt(b"<body>a<plaintext></plaintext><b>c") == "a</plaintext><b>c"


def test_frameset_in_body_ignored():
    # frameset start in in_body is ignored (:2164-2169), doc finishes
    t, meta = hp.extract_text(b"<body>x<frameset>y")
    assert meta["finished"]
    assert t == "xy"


def test_after_body_text_reenters_body():
    frag = b"<body>a</body>b"
    t, meta = hp.extract_text(frag)
    assert t == "ab"
    # non-ws after </body> re-dispatches into in_body (:3237-3238)
    events = ev(frag)
    chars = [e[1] for e in events if e[0] == "characters"]
    assert chars == ["a", "b"]


def test_preserve_ws_textarea():
    assert txt(b"<body><pre>a  b</pre><textarea>c  d</textarea></body>",
               preserve_ws=True) == "a  bc  d"
    assert txt(b"<body><textarea>c  d</textarea></body>") == "c d"  # Q24
