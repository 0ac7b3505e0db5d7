"""Coverage-driven tree-construction probes: branches the main suites miss.

Single #char tokens (from charrefs) are the lever for reaching per-char
dispatch clauses that batched #chars runs bypass (Q4).
"""
import htmpark as hp


def ev(frag, **kw):
    events, tb = hp.parse_events(frag, **kw)
    return events


def txt(frag, **kw):
    t, _ = hp.extract_text(frag, **kw)
    return t


def chars(frag):
    return [e[1] for e in ev(frag) if e[0] == "characters"]


def comments(frag):
    return [e[1] for e in ev(frag) if e[0] == "comment"]


def seq(frag):
    return [(e[0].replace("Element", ""), e[2]) for e in ev(frag) if e[0].endswith("Element")]


# ---- initial / before_html / before_head ----

def test_ws_char_dropped_in_initial_and_before_html():
    # &#32; yields a single #char ' ' that DOES reach dispatch (unlike runs)
    assert txt(b"&#32;<!DOCTYPE html>&#32;<html><body>x") == "x"
    assert ("characters", "") not in ev(b"&#32;<!DOCTYPE html>&#32;<html><body>x")


def test_doctype_and_comment_in_before_html():
    events = ev(b"<!DOCTYPE html><!DOCTYPE other><!--c--><html><body>x")
    assert [e for e in events if isinstance(e, tuple) and e[0] == "startDTD"] == [
        ("startDTD", "html", "", "")]  # second doctype dropped
    assert ("comment", "c") in events


def test_before_head_end_tag_implies_head():
    s = seq(b"<html></body>x")
    assert ("start", "head") in s  # </body> walked the imply chain


def test_before_head_ws_char_buffered_and_comment():
    events = ev(b"<html>&#32;<!--c--><head></head><body>x")
    assert ("comment", "c") in events
    # the buffered ws flushes as an empty characters event at <head> (Q3)
    assert ("characters", "") in events


def test_html_start_in_before_head_redispatch():
    assert txt(b"<html><html><body>x") == "x"


# ---- in_head / after_head ----

def test_in_head_ws_char_and_comment_and_doctype():
    frag = b"<head>&#32;<!--c--><!DOCTYPE html></head><body>x"
    assert ("comment", "c") in ev(frag)
    assert txt(frag) == "x"


def test_in_head_second_head_ignored():
    s = seq(b"<head><head><title>t</title></head><body>x")
    assert s.count(("start", "head")) == 1


def test_after_head_ws_comment_and_head_elements():
    frag = b'<head></head>&#32;<!--c--><link href="x"><body>t'
    events = ev(frag)
    assert ("comment", "c") in events
    assert ("start", "link") in [(e[0].replace("Element", ""), e[2])
                                 for e in events if e[0].endswith("Element")]
    assert txt(frag) == "t"


def test_after_head_html_redispatch_and_template_end():
    assert txt(b"<head></head><html></template><body>x") == "x"


def test_after_head_second_head_ignored():
    s = seq(b"<head></head><head><body>x")
    assert s.count(("start", "head")) == 1


# ---- in_body leftovers ----

def test_meta_in_body_redirects_to_head_handler():
    frag = b'<body>a<meta charset="u">b'
    s = seq(frag)
    assert ("start", "meta") in s and ("end", "meta") in s
    assert txt(frag) == "ab"


def test_ruby_tags_without_ruby_open():
    frag = b"<body><rb>a<rp>b<rt>c<rtc>d"
    assert txt(frag) == "abcd"
    s = seq(frag)
    assert s.count(("start", "rb")) == 1 and s.count(("start", "rtc")) == 1


def test_stray_cell_tags_in_body_dropped():
    frag = b"<body><td>x<th>y<tr>z"
    s = seq(frag)
    assert ("start", "td") not in s and ("start", "tr") not in s
    assert txt(frag) == "xyz"


def test_orphan_end_style_template_in_body():
    assert txt(b"<body></style>x</template>y") == "xy"


# ---- table family ----

def test_char_in_table_goes_to_in_table_text():
    # &#65; emits a single #char in in_table with a tableish current node
    frag = b"<table>&#65;<tr><td>b</table>c"
    assert chars(frag)[:1] == ["A"]  # flushed inside the table, no fostering
    assert txt(frag) == "Abc"


def test_char_in_table_with_foreign_current():
    frag = b"<table><svg>&#65;</svg></table>b"
    assert txt(frag) == "Ab"


def test_style_and_template_handling_in_table():
    frag = b"<table><style>s{}</style></template><tr><td>a</table>"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "style")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "style")
    assert [e for e in events[i:j] if e[0] == "characters"] == [("characters", "s{}")]
    assert txt(frag) == "a"


def test_caption_closed_by_end_table():
    frag = b"<table><caption>a</table>c"
    s = seq(frag)
    assert ("end", "caption") in s and ("end", "table") in s
    assert txt(frag) == "ac"


def test_caption_stray_end_tags_ignored():
    assert txt(b"<table><caption>a</td></tr>b</table>c") == "abc"


def test_colgroup_ws_comment_and_stray_col_end():
    frag = b"<table><colgroup>&#32;<!--c--></col><col span=1></colgroup><tr><td>a</table>"
    assert ("comment", "c") in ev(frag)
    assert txt(frag) == "a"


def test_tbody_implied_close_on_caption():
    frag = b"<table><tbody><tr><td>a</td></tr><caption>b</caption></table>c"
    s = seq(frag)
    assert s.index(("end", "tbody")) < s.index(("start", "caption"))
    assert txt(frag) == "abc"


def test_end_table_from_tbody():
    frag = b"<table><tbody></table>a"
    s = seq(frag)
    assert ("end", "tbody") in s and ("end", "table") in s
    assert txt(frag) == "a"


def test_tbody_stray_end_tags():
    assert txt(b"<table><tbody></td></th></tr2>a<tr><td>b</table>") == "ab"


def test_in_row_end_tbody_and_end_table():
    frag = b"<table><tr><td>a</td></tr><tr></tbody><tr><td>b</table>"
    assert txt(frag) == "ab"
    frag2 = b"<table><tr></table>z"
    s = seq(frag2)
    assert ("end", "tr") in s and ("end", "table") in s
    assert txt(frag2) == "z"


def test_in_cell_stray_body_end():
    assert txt(b"<table><tr><td>a</body>b</table>c") == "abc"


def test_in_cell_end_table_closes_cell():
    frag = b"<table><tr><td>a</table>b"
    s = seq(frag)
    assert s.index(("end", "td")) < s.index(("end", "table"))
    assert txt(frag) == "ab"


# ---- select ----

def test_select_char_via_charref_and_comment():
    frag = b"<select>&#65;<!--c--><option>b</select>d"
    assert ("comment", "c") in ev(frag)
    assert txt(frag) == "Abd"


def test_select_optgroup_closes_optgroup():
    frag = b"<select><optgroup><optgroup><option>a</select>b"
    s = seq(frag)
    assert s.count(("start", "optgroup")) == 2
    assert txt(frag) == "ab"


def test_select_end_optgroup_with_open_option():
    frag = b"<select><optgroup><option>a</optgroup>b</select>c"
    s = seq(frag)
    # </optgroup> pops option then optgroup
    assert s.index(("end", "option")) < s.index(("end", "optgroup"))
    assert txt(frag) == "abc"


def test_select_script_never_closes():
    # <script> in in_select redirects to in_head (text mode + tokenizer
    # switch) but the mode is FORCED back to in_select (:3097-3102), so the
    # later </script> token finds no clause in in_select and is ignored:
    # the script element swallows everything up to </select> — 'a' is
    # inside the unclosed script and excluded from extraction.
    frag = b"<select><script>s</script></template><option>a</select>b"
    assert txt(frag) == "b"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "script")
    inner = [e[2] for e in events[i:j] if e[0] == "startElement"]
    assert "option" in inner  # the option really nests under script


def test_select_stray_tokens_ignored():
    frag = b"<select><div>a</div><option>b</select>c"
    s = seq(frag)
    assert ("start", "div") not in s  # parse error: ignored (:3108-3110)
    assert txt(frag) == "abc"


# ---- template ----

def test_template_char_comment_head_tags_and_cells():
    frag = (b"<head><template>a<!--c--><link href=x><td>z</td></template>"
            b"</head>b")
    events = ev(frag)
    assert ("comment", "c") in events
    assert txt(frag) == "azb"
    s = seq(frag)
    assert ("start", "td") in s


def test_template_end_tag_ignored_inside():
    # </div> inside template ignored; after </template> the mode is FORCED
    # back to in_template (:3180-3182) with no open template left, so eof is
    # swallowed (:3205-3208, D5): 'y' never flushes, doc unfinished.
    t, meta = hp.extract_text(b"<template></div>x</template>y")
    assert t == "x"
    assert meta["finished"] is False


# ---- after_body / after_after_body ----

def test_after_body_ws_char_and_comment():
    frag = b"<body>a</body>&#32;<!--c-->"
    assert ("comment", "c") in ev(frag)
    assert txt(frag) == "a"


def test_after_body_start_tag_reenters_body():
    frag = b"<body>a</body><div>b</div>"
    assert txt(frag) == "ab"


def test_after_body_html_start_redispatch():
    assert txt(b"<body>a</body><html>") == "a"


def test_after_after_body_comment_and_reentry():
    frag = b"<body>a</body></html><!--c-->b"
    assert ("comment", "c") in ev(frag)
    assert txt(frag) == "ab"


def test_str_input_with_crlf():
    t, meta = hp.extract_text("<pre>a\r\nb</pre>")
    assert t == "a\nb" and meta["finished"]


def test_xml_lang_attr_adjustment():
    e = next(x for x in ev(b'<body><svg xml:lang="en">t</svg>')
             if x[0] == "startElement" and x[2] == "svg")
    assert e[4] == [("http://www.w3.org/XML/1998/namespace", "xml", "lang", "en")]


def test_math_self_closing():
    events = ev(b"<body><math/>t")
    M = "http://www.w3.org/1998/Math/MathML"
    assert ("startElement", M, "math", ("", "math"), []) in events
    assert ("endElement", M, "math", ("", "math")) in events
    assert txt(b"<body><math/>t") == "t"


def test_rb_with_ruby_open_implied_ends():
    frag = b"<body><ruby><rb>a<rb>b</ruby>c"
    s = seq(frag)
    assert s.count(("start", "rb")) == 2
    assert s.count(("end", "rb")) == 2  # implied end before the second rb
    assert txt(frag) == "abc"


def test_caption_tokens_when_caption_not_open():
    # in_caption mode with caption already popped is unreachable from clean
    # input; the is_open(False) arms instead fire via stray caption ends
    assert txt(b"<table></caption><tr><td>a</table>") == "a"


def test_in_row_stray_cell_end_tags():
    assert txt(b"<table><tr></td></th>a<td>b</table>") == "ab"


def test_caption_inside_row_cascades_closes():
    # <caption> in in_row pops tr (:2864-2880), re-dispatches in
    # in_table_body which pops tbody (:2797-2813), then in_table adds it
    frag = b"<table><tbody><tr><caption>x<td>a</table>"
    s = seq(frag)
    i_cap = s.index(("start", "caption"))
    assert s.index(("end", "tr")) < i_cap
    assert s.index(("end", "tbody")) < i_cap
    assert txt(frag) == "xa"


def test_select_end_option_when_not_current():
    assert txt(b"<select></option><option>a</select>b") == "ab"


def test_select_end_select_not_open():
    # unreachable from in_select (select always open there); stray </select>
    # in body is the nearest arm
    assert txt(b"<body></select>x") == "x"
