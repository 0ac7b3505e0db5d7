"""Per-state tokenizer probes (htmerl_sax_utf8.erl:143-1904)."""
import htmpark as hp

H = "http://www.w3.org/1999/xhtml"


def ev(frag, **kw):
    events, tb = hp.parse_events(frag, **kw)
    return events


def txt(frag, **kw):
    t, _ = hp.extract_text(frag, **kw)
    return t


def comments(frag):
    return [e[1] for e in ev(frag) if e[0] == "comment"]


def el(frag, name):
    for e in ev(frag):
        if e[0] == "startElement" and e[2] == name:
            return e
    return None


# ---- comments (:1125-1249) ----

def test_comment_basic():
    assert comments(b"<body><!--hello--></body>") == ["hello"]


def test_comment_empty_variants():
    assert comments(b"<body><!----></body>") == [""]
    assert comments(b"<body><!---></body>") == [""]    # comment_start_dash '>'
    assert comments(b"<body><!--->x") == [""]           # ditto then text
    assert comments(b"<body><!-->x") == [""]            # comment_start '>'


def test_comment_dashes_inside():
    assert comments(b"<body><!-- a - b -- c --></body>") == [" a - b -- c "]
    assert comments(b"<body><!----- x----></body>") == ["--- x--"]


def test_comment_bang_close():
    assert comments(b"<body><!--x--!></body>") == ["x"]
    assert comments(b"<body><!--x--!y--></body>") == ["x--!y"]


def test_comment_nested_lt():
    assert comments(b"<body><!--a<!b--></body>") == ["a<!b"]
    assert comments(b"<body><!--a<<b--></body>") == ["a<<b"]


def test_comment_nul_quirk():
    # NUL -> FFFD then transition to less_than_sign (:1151-1153): an
    # immediately following '-' is treated as comment content, not end-dash
    assert comments(b"<body><!--a\x00-x--></body>") == ["a�-x"]


def test_comment_eof_emits_comment_and_finishes():
    events = ev(b"<body>t<!--never closed")
    assert ("comment", "never closed") in events
    assert events[-1] == "endDocument"


def test_bogus_comment_end_tag():
    assert comments(b"<body></#foo></body>") == ["#foo"]


def test_bogus_comment_at_eof_unfinished():  # D5
    t, meta = hp.extract_text(b"<body>x<?php")
    assert meta["finished"] is False


# ---- DOCTYPE states (:1252-1641) ----

def dtd(frag):
    for e in ev(frag):
        if isinstance(e, tuple) and e[0] == "startDTD":
            return e
    return None


def test_doctype_simple_and_case():
    assert dtd(b"<!DOCTYPE html>") == ("startDTD", "html", "", "")
    assert dtd(b"<!doctype HTML>") == ("startDTD", "html", "", "")
    assert dtd(b"<!DoCtYpE hTmL>") == ("startDTD", "html", "", "")


def test_doctype_public_system():
    d = dtd(b'<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" "http://x/d.dtd">')
    assert d == ("startDTD", "html", "-//W3C//DTD HTML 4.01//EN", "http://x/d.dtd")
    d = dtd(b"<!DOCTYPE html SYSTEM 'about:legacy-compat'>")
    assert d == ("startDTD", "html", "", "about:legacy-compat")


def test_doctype_public_only():
    d = dtd(b'<!DOCTYPE html PUBLIC "pub">')
    assert d == ("startDTD", "html", "pub", "")


def test_doctype_bogus_tail_ignored():
    d = dtd(b"<!DOCTYPE html garbage here>")
    assert d == ("startDTD", "html", "", "")


def test_doctype_missing_name():
    assert dtd(b"<!DOCTYPE>") == ("startDTD", "", "", "")


# ---- CDATA (:1644-1678) ----

def test_cdata_brackets():
    assert txt(b"<body><![CDATA[a]b]]c]]>d</body>") == "a]b]]cd"
    assert txt(b"<body><![CDATA[x]]]>y</body>") == "x]y"


# ---- rawtext / rcdata / script (:164-227, 349-869) ----

def test_style_rawtext_no_markup_no_charrefs():
    events = ev(b"<head><style>a <b> &amp; c</style></head>")
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "style")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "style")
    inner = [e for e in events[i + 1 : j] if e[0] == "characters"]
    assert inner == [("characters", "a <b> &amp; c")]


def test_textarea_rcdata_decodes_charrefs():
    assert txt(b"<body><textarea>&amp; x</textarea></body>") == "& x"


def test_rcdata_case_insensitive_end_tag():
    assert txt(b"<body><textarea>a</TEXTAREA>b</body>") == "ab"


def test_rcdata_wrong_end_tag_is_text():
    assert txt(b"<body><textarea>a</div>b</textarea></body>") == "a</div>b"


def test_script_escaped_states():
    # <!-- inside script: '</script>' inside the escape still ends (single
    # escape), and the '-->' machinery emits chars faithfully
    frag = b"<body><script>a<!--b--></script>c</body>"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "script")
    inner = "".join(e[1] for e in events[i + 1 : j] if e[0] == "characters")
    assert inner == "a<!--b-->"
    assert txt(frag) == "c"


def test_script_double_escaped():
    # <!--<script> ... --> : inner </script> does NOT end the element
    frag = b"<body><script>x<!--<script>y</script>z--></script>w</body>"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "script")
    inner = "".join(e[1] for e in events[i + 1 : j] if e[0] == "characters")
    # reference quirk: unlike the WHATWG spec, the terminator char after the
    # '(t)pircs' buffer match is consumed WITHOUT being emitted
    # (:741-746 double_escape_start, :843-848 double_escape_end), so the
    # '>' of the inner '<script>' and '</script>' vanish from the text.
    assert inner == "x<!--<scripty</scriptz-->"
    assert txt(frag) == "w"


def test_script_end_tag_partial_match_is_chars():
    frag = b"<body><script>a</scr>b</script>c</body>"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "script")
    inner = "".join(e[1] for e in events[i + 1 : j] if e[0] == "characters")
    assert inner == "a</scr>b"


def test_plaintext_swallows_rest():
    assert txt(b"<body><plaintext>a<b>c</plaintext>d") == "a<b>c</plaintext>d"


# ---- tags & attributes (:249-1084) ----

def test_unquoted_attr_value():
    e = el(b"<p a=b>t</p>", "p")
    assert e[4] == [("", "", "a", "b")]


def test_single_quoted_attr_value():
    e = el(b"<p a='b c'>t</p>", "p")
    assert e[4] == [("", "", "a", "b c")]


def test_valueless_attrs():
    e = el(b"<p disabled hidden>t</p>", "p")
    assert [(x[2], x[3]) for x in e[4]] == [("disabled", ""), ("hidden", "")]


def test_unquoted_special_chars_kept():
    e = el(b"<p a=b'c<d`e>t</p>", "p")
    assert e[4] == [("", "", "a", "b'c<d`e")]


def test_attr_value_newline_preserved():
    e = el(b'<p a="l1\nl2">t</p>', "p")
    assert e[4] == [("", "", "a", "l1\nl2")]


def test_self_closing_unknown_tag():
    events = ev(b"<body><widget/>t</body>")
    assert ("startElement", H, "widget", ("", "widget"), []) in events
    assert ("endElement", H, "widget", ("", "widget")) in events
    assert txt(b"<body><widget/>t</body>") == "t"


def test_void_elements_forced_closing():
    events = ev(b"<body><br><img src=x></body>")
    names = [(e[0], e[2]) for e in events if e[0].endswith("Element")]
    assert ("endElement", "br") in names and ("endElement", "img") in names


def test_lt_before_nontag_is_text():
    assert txt(b"<p>1 < 2</p>") == "1 < 2"
    assert txt(b"<p>a<3</p>") == "a<3"


def test_end_tag_open_gt_dropped():
    assert txt(b"<p>a</>b</p>") == "ab"


def test_nul_in_tag_name():
    e = el(b"<di\x00v>t</di\x00v>", "di�v")
    assert e is not None


def test_crlf_normalization():  # Q1
    assert txt(b"<pre>a\r\nb\rc</pre>") == "a\nb\nc"
    e = el(b'<p a="x\r\ny">t</p>', "p")
    assert e[4] == [("", "", "a", "x\ny")]
