"""Coverage-driven tokenizer probes: eof paths, NUL paths, rcdata/script
end-tag variants, doctype identifier exits — branches the main suites miss."""
import htmpark as hp


def ev(frag, **kw):
    events, tb = hp.parse_events(frag, **kw)
    return events


def x(frag, **kw):
    """extract + meta"""
    return hp.extract_text(frag, **kw)


def txt(frag, **kw):
    return x(frag, **kw)[0]


def el(frag, name):
    for e in ev(frag):
        if e[0] == "startElement" and e[2] == name:
            return e
    return None


def dtd(frag):
    for e in ev(frag):
        if isinstance(e, tuple) and e[0] == "startDTD":
            return e
    return None


# ---- rcdata / rawtext / script data-function edges ----

def test_rcdata_eof_and_nul():
    t, meta = x(b"<body><textarea>abc")
    assert t == "abc" and meta["finished"]
    assert txt(b"<body><textarea>a\x00b</textarea>c") == "a�bc"


def test_rcdata_end_tag_open_non_letter():
    assert txt(b"<body><textarea>a</ x</textarea>b") == "a</ xb"


def test_rcdata_end_tag_with_ws_and_selfclosing():
    assert txt(b"<body><textarea>a</textarea >b") == "ab"
    t, meta = x(b"<body><textarea>a</textarea/>b")
    assert t == "ab"
    assert meta["tok_errors"] >= 1  # self-closing END tag: D2 policy


def test_rawtext_nul():
    events = ev(b"<head><style>a\x00b</style></head>")
    inner = [e[1] for e in events if e[0] == "characters"]
    assert inner == ["a�b"]


def test_plaintext_nul_and_eof():
    assert txt(b"<body><plaintext>\x00abc") == "�abc"


def test_script_nul():
    frag = b"<body><script>a\x00</script>x"
    events = ev(frag)
    inner = [e[1] for e in events if e[0] == "characters"]
    assert inner == ["a�", "x"]


def test_script_partial_end_tag_at_eof():
    t, meta = x(b"<body>t<script>a</scr")
    assert meta["finished"]  # '</scr' re-lexed as chars, then eof
    assert t == "t"  # script content excluded


def test_script_escaped_end_tag_match():
    frag = b"<body><script>x<!--y</script>z"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "script")
    inner = "".join(e[1] for e in events[i:j] if e[0] == "characters")
    assert inner == "x<!--y"
    assert txt(frag) == "z"


def test_script_escaped_end_tag_uppercase():
    frag = b"<body><script>a<!--b</SCRIPT>c"
    events = ev(frag)
    assert ("endElement", "http://www.w3.org/1999/xhtml", "script",
            ("", "script")) in events
    assert txt(frag) == "c"


def test_script_escaped_end_tag_mismatch():
    frag = b"<body><script>x<!--</sc >a--></script>w"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "script")
    inner = "".join(e[1] for e in events[i:j] if e[0] == "characters")
    assert inner == "x<!--</sc >a-->"
    assert txt(frag) == "w"


def test_script_double_escaped_nul_dash_gt():
    frag = b"<body><script>u<!--<script>-\x00>w--></script>i"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "script")
    inner = "".join(e[1] for e in events[i:j] if e[0] == "characters")
    # '>' after the inner '<script' buffer match is swallowed (Q26)
    assert inner == "u<!--<script-�>w-->"
    assert txt(frag) == "i"


def test_script_double_escape_end_with_ws_terminator():
    frag = b"<body><script>q<!--<script>a</script x-->b</script>c"
    events = ev(frag)
    i = next(k for k, e in enumerate(events) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(events) if e[0] == "endElement" and e[2] == "script")
    inner = "".join(e[1] for e in events[i:j] if e[0] == "characters")
    assert inner == "q<!--<scripta</scriptx-->b"
    assert txt(frag) == "c"


# ---- charref edges ----

def test_amp_before_lt_and_at_eof():
    assert txt(b"<body><p>a&<b>c") == "ac"  # stale empty buffer; <b> real tag
    t, meta = x(b"<body><p>z&")
    assert t == "z" and meta["finished"]


def test_hex_charref_too_long():
    assert txt(b"<body><p>&#xFFFFFFFFF;</p>") == "�FFFFFFFFF;"


# ---- tag machine eof / NUL edges (reference drops tokens at eof) ----

def test_tag_name_eof_drops_token():
    t, meta = x(b"<body>a<di")
    assert t == "a" and meta["finished"]


def test_end_tag_open_eof_emits_lt_slash():
    assert txt(b"<body><p>a</") == "a</"


def test_before_attr_name_eof():
    t, meta = x(b"<body>a<p ")
    assert t == "a" and meta["finished"]


def test_attr_name_eof_and_nul():
    t, meta = x(b"<body>a<p cla")
    assert t == "a" and meta["finished"]
    e = el(b"<body><p a\x00b=c>t</p>", "p")
    assert e[4] == [("", "", "a�b", "c")]


def test_after_attr_name_eof_and_selfclosing():
    t, meta = x(b"<body>a<p q ")
    assert t == "a" and meta["finished"]
    events = ev(b"<body><p q/>t")
    e = el(b"<body><p q/>t", "p")
    assert e[4] == [("", "", "q", "")]
    assert ("endElement", "http://www.w3.org/1999/xhtml", "p", ("", "p")) in events


def test_before_attr_value_ws_skip():
    e = el(b'<body><p a=  "v">t</p>', "p")
    assert e[4] == [("", "", "a", "v")]


def test_attr_value_dq_eof_and_nul():
    t, meta = x(b'<body>a<p q="x')
    assert t == "a" and meta["finished"]
    e = el(b'<body><p a="x\x00y">t</p>', "p")
    assert e[4] == [("", "", "a", "x�y")]


def test_attr_value_unquoted_eof_and_nul():
    t, meta = x(b"<body>a<p q=v")
    assert t == "a" and meta["finished"]
    e = el(b"<body><p a=v\x00w>t</p>", "p")
    assert e[4] == [("", "", "a", "v�w")]


def test_after_quoted_value_variants():
    t, meta = x(b'<body>a<p q="1"')
    assert t == "a" and meta["finished"]
    e = el(b'<body><p a="1"/>t', "p")
    assert e[4] == [("", "", "a", "1")]
    e = el(b'<body><p a="1"b="2">t</p>', "p")  # no-consume reentry
    assert [(q[2], q[3]) for q in e[4]] == [("a", "1"), ("b", "2")]


def test_self_closing_eof_and_default():
    t, meta = x(b"<body>a<p/")
    assert t == "a" and meta["finished"]
    e = el(b"<body><p / x>t</p>", "p")
    assert [(q[2], q[3]) for q in e[4]] == [("x", "")]


def test_tag_name_with_dash_slow_path():
    e = el(b"<body><my-tag a=1>t</my-tag>", "my-tag")
    assert e is not None and e[4] == [("", "", "a", "1")]


# ---- bogus comment / comment machine edges ----

def test_bogus_comment_nul():
    events = ev(b"<body></#a\x00b>t")
    assert ("comment", "#a�b") in events


def test_markup_decl_fallthrough():
    assert [e[1] for e in ev(b"<body><!x>t") if e[0] == "comment"] == ["x"]


def test_comment_start_eof_variants():
    events = ev(b"<body>t<!--")
    assert ("comment", "") in events and events[-1] == "endDocument"
    events = ev(b"<body>t<!---")
    assert ("comment", "") in events
    events = ev(b"<body>t<!--a-")
    assert ("comment", "a") in events
    events = ev(b"<body>t<!--a--!")
    assert ("comment", "a") in events


def test_comment_lt_bang_single_dash():
    assert [e[1] for e in ev(b"<body><!--a<!-b-->t") if e[0] == "comment"] == ["a<!-b"]


# ---- doctype identifier exits ----

def test_doctype_eof_variants():
    assert dtd(b"<!DOCTYPE") == ("startDTD", "", "", "")
    assert dtd(b"<!DOCTYPE ") == ("startDTD", "", "", "")
    assert dtd(b"<!DOCTYPE ht") == ("startDTD", "ht", "", "")
    assert dtd(b"<!DOCTYPE html ") == ("startDTD", "html", "", "")
    assert dtd(b"<!DOCTYPE html PUBLIC") == ("startDTD", "html", "", "")
    assert dtd(b'<!DOCTYPE html PUBLIC "p') == ("startDTD", "html", "", "")


def test_doctype_eof_public_partial():
    assert dtd(b'<!DOCTYPE html PUBLIC "p" ') == ("startDTD", "html", "p", "")


def test_doctype_nul_in_name_and_ids():
    assert dtd(b"<!DOCTYPE \x00x>") == ("startDTD", "�x", "", "")
    assert dtd(b"<!DOCTYPE h\x00t>") == ("startDTD", "h�t", "", "")
    assert dtd(b'<!DOCTYPE html PUBLIC "a\x00b">') == ("startDTD", "html", "a�b", "")
    assert dtd(b"<!DOCTYPE html SYSTEM 'a\x00b'>") == ("startDTD", "html", "", "a�b")


def test_doctype_gt_inside_public_id():
    # '>' inside the quoted public id aborts the token (quirks) and re-lexes
    assert dtd(b'<!DOCTYPE html PUBLIC "a>b">') == ("startDTD", "html", "a", "")


def test_doctype_bogus_after_system_id():
    assert dtd(b'<!DOCTYPE html SYSTEM "s" junk>') == ("startDTD", "html", "", "s")


def test_doctype_public_then_system_with_between_ws():
    assert dtd(b'<!DOCTYPE html PUBLIC "p"  \t "s">') == ("startDTD", "html", "p", "s")


def test_doctype_no_space_before_name():
    assert dtd(b"<!DOCTYPEhtml>") == ("startDTD", "html", "", "")


def test_doctype_public_keyword_then_gt():
    assert dtd(b"<!DOCTYPE html PUBLIC>") == ("startDTD", "html", "", "")
