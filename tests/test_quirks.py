"""Quirk-ledger probes P1-P28 (FIXTURES.md §3 / SURVEY.md §5 Q1-Q25).

Each probe pins a reference behavior that DEFINES byte parity — several look
like bugs (Q5/Q6/Q7 especially) but must not be "fixed".
Where FIXTURES.md's hand-derivation disagreed with a closer code reading,
the test asserts the code truth and notes the delta.
"""
import htmpark as hp

H = "http://www.w3.org/1999/xhtml"
SVG = "http://www.w3.org/2000/svg"


def text_of(frag, **kw):
    t, meta = hp.extract_text(frag, **kw)
    assert meta["finished"], meta
    return t


def events_of(frag, **kw):
    ev, tb = hp.parse_events(frag, **kw)
    return ev


def chars_of(frag, **kw):
    return [e[1] for e in events_of(frag, **kw) if e[0] == "characters"]


def first_el(frag, name):
    for e in events_of(frag):
        if e[0] == "startElement" and e[2] == name:
            return e
    raise AssertionError(f"no <{name}> in events")


def test_p1_stale_temp_buffer_replay():  # Q5
    assert text_of(b"<p>&lt; a & b</p>") == "< a < b"


def test_p2_bare_amp_at_start_vanishes():  # Q5
    assert text_of(b"<p>& x</p>") == "x"
    assert chars_of(b"<p>& x</p>") == [" x"] or chars_of(b"<p>& x</p>") == ["x"]


def test_p3_entity_first_match_order():  # Q6
    assert text_of(b"<p>&notin;</p>") == "\xacin;"


def test_p4_numeric_charref_needs_semicolon():  # Q7
    assert text_of(b"<p>&#65 x</p>") == "�65 x"


def test_p4b_numeric_too_many_digits():
    assert text_of(b"<p>&#12345678;</p>") == "�12345678;"


def test_p5_numeric_happy_path():
    assert text_of(b"<p>&#x41;&#196;</p>") == "A\xc4"


def test_p5b_win1252_remap_and_masks():
    assert text_of(b"<p>&#x80;</p>") == "€"   # 0x80 -> euro
    assert text_of(b"<p>&#x0;</p>") == "�"     # NUL -> FFFD
    assert text_of(b"<p>&#xD800;</p>") == "�"  # surrogate
    assert text_of(b"<p>&#x10FFFF;</p>") == "�"  # >= 0x10FFFF (note: >=)


def test_p6_formfeed_survives_collapse():  # Q2
    assert text_of(b"<div>a\x0c b</div>") == "a\x0c b"


def test_p7_ws_only_buffer_emits_empty_characters():  # Q3
    assert ("characters", "") in events_of(b"<div>  \n </div>")
    assert text_of(b"<div>  \n </div>") == ""


def test_p8_no_adoption_agency():  # Q12
    frag = b"<b><i>x</b>y</i>"
    assert text_of(frag) == "xy"
    # </b> closes i then b; later </i> ignored
    seq = [(e[0], e[2]) for e in events_of(frag) if e[0].endswith("Element")]
    i_ends = [x for x in seq if x == ("endElement", "i")]
    assert len(i_ends) == 1


def test_p9_title_is_not_rcdata():  # Q13
    assert text_of(b"<title>a<b>c</b></title>d") == "acd"
    # the <b> really became an element (not text)
    assert first_el(b"<title>a<b>c</b></title>d", "b")


def test_p10_textarea_rcdata_with_collapse():  # Q24
    assert text_of(b"<textarea>a < b</textarea>") == "a < b"


def test_p11_script_data_and_text_exclusion():
    frag = b"<script>a<b</script>x"
    assert text_of(frag) == "x"
    # script text node exists in the event stream under <script>
    ev = events_of(frag)
    i = next(k for k, e in enumerate(ev) if e[0] == "startElement" and e[2] == "script")
    j = next(k for k, e in enumerate(ev) if e[0] == "endElement" and e[2] == "script")
    inner = [e for e in ev[i + 1 : j] if e[0] == "characters"]
    assert inner == [("characters", "a<b")]


def test_p12_pre_preserves_whitespace():
    assert text_of(b"<pre> a\n  b </pre>") == " a\n  b "


def test_p13_invalid_attribute_name():  # Q9
    el = first_el(b"<x = y>z</x>", "x")
    # '=' creates an attr literally named INVALID; 'y' becomes a second
    # empty-valued attr (after_attribute_name default, :954-957)
    names = [a[2] for a in el[4]]
    assert names == ["INVALID", "y"]
    assert text_of(b"<x = y>z</x>") == "z"


def test_p14_duplicate_attributes_kept():  # Q10
    el = first_el(b'<p a="1" a="2">t</p>', "p")
    assert [(a[2], a[3]) for a in el[4]] == [("a", "1"), ("a", "2")]


def test_p15_xmlns_dropped():  # Q11
    el = first_el(b'<p xmlns="u" q="1">t</p>', "p")
    assert [(a[2], a[3]) for a in el[4]] == [("q", "1")]


def test_p16_no_foster_parenting():  # Q22
    frag = b"<table><tr><td>a</td></tr>b</table>c"
    ev = events_of(frag)
    chars = [e[1] for e in ev if e[0] == "characters"]
    assert chars == ["a", "b", "c"]
    # 'b' is emitted before tbody closes (stays INSIDE the table)
    bi = ev.index(("characters", "b"))
    tbody_end = next(k for k, e in enumerate(ev) if e[0] == "endElement" and e[2] == "tbody")
    assert bi < tbody_end


def test_p17_li_closes_same_name_only():  # Q17
    assert text_of(b"<ul><li>a<li>b</ul>") == "ab"
    seq = [(e[0], e[2]) for e in events_of(b"<ul><li>a<li>b</ul>") if e[0].endswith("Element")]
    assert seq.count(("startElement", "li")) == 2
    assert seq.count(("endElement", "li")) == 2


def test_p18_heading_closes_any_heading():  # Q17
    frag = b"<h1>a<h2>b</h2>"
    assert text_of(frag) == "ab"
    seq = [(e[0], e[2]) for e in events_of(frag) if e[0].endswith("Element")]
    assert ("endElement", "h1") in seq and seq.index(("endElement", "h1")) < seq.index(("startElement", "h2"))


def test_p19_orphan_end_p_synthesizes_empty_p():  # Q18
    # needs body context: in before_html a stray </p> is dropped (:1958-1960)
    frag = b"<body>x</p>y"
    assert text_of(frag) == "xy"
    seq = [(e[0], e[2]) for e in events_of(frag) if e[0].endswith("Element")]
    assert ("startElement", "p") in seq and ("endElement", "p") in seq


def test_p20_end_br_becomes_void_br():  # Q19
    # body context: before in_body a stray </br> merely implies html/head
    # and is then dropped in after_head (:2144-2146)
    frag = b"<body>a</br>b"
    ev = events_of(frag)
    assert text_of(frag) == "ab"
    # NOTE (delta vs FIXTURES.md P20): the </br> handler does NOT flush the
    # text buffer (:2396-2403), so the characters event 'ab' comes AFTER the
    # br element — text is not split around it.
    seq = [(e[0], e[2]) for e in ev if e[0].endswith("Element")]
    assert ("startElement", "br") in seq and ("endElement", "br") in seq
    assert ev.index(("characters", "ab")) > seq.index(("startElement", "br"))


def test_p21_image_renamed_img_void():  # Q19
    el = first_el(b"<image src=s>", "img")
    assert [(a[2], a[3]) for a in el[4]] == [("src", "s")]
    ev = events_of(b"<image src=s>")
    assert ("endElement", H, "img", ("", "img")) in ev


def test_p22_cdata_in_html_content():  # Q14
    assert text_of(b"x<![CDATA[a<b]]>y") == "xa<by"


def test_p23_svg_namespace_and_attr_adjust():  # Q20
    frag = b'<svg viewbox="v"><circle r="1"/>t</svg>u'
    assert text_of(frag) == "tu"
    ev = events_of(frag)
    svg = next(e for e in ev if e[0] == "startElement" and e[2] == "svg")
    assert svg[1] == SVG
    assert svg[4] == [(SVG, "", "viewBox", "v")]
    circle = next(e for e in ev if e[0] == "startElement" and e[2] == "circle")
    assert circle[1] == SVG
    assert ("startPrefixMapping", "", SVG) in ev
    assert ("endPrefixMapping", "") in ev


def test_p24_nul_passes_through_data():  # Q4
    assert text_of(b"<p>\x00a</p>") == "\x00a"


def test_p25_frameset_swallows_eof():  # Q15 / D5
    t, meta = hp.extract_text(b"<frameset><frame></frameset>")
    assert meta["finished"] is False


def test_p26_pi_becomes_bogus_comment():
    frag = b'<?xml version="1.0"?><p>a</p>'
    ev = events_of(frag)
    assert ("comment", '?xml version="1.0"?') in ev
    assert text_of(frag) == "a"


def test_p27_comment_flush_boundaries_in_body():
    frag = b"<p>A <!-- c --> B</p>"
    ev = events_of(frag)
    assert ("comment", " c ") in ev
    assert [e[1] for e in ev if e[0] == "characters"] == ["A", "B"]


def test_p28_case_normalization():
    el = first_el(b'<P CLASS="X">t</P>', "p")
    assert el[4] == [("", "", "class", "X")]
    assert text_of(b'<P CLASS="X">t</P>') == "t"
    seq = [(e[0], e[2]) for e in events_of(b'<P CLASS="X">t</P>') if e[0].endswith("Element")]
    assert ("endElement", "p") in seq


def test_tag_name_lowercase_quirk():
    # lowercasing happens iff the terminator immediately follows an
    # uppercase letter (tag_name_1/2, :301-346): <DIV> -> div, <DIv> -> DIv
    assert first_el(b"<DIV>x</DIV>", "div")
    el = first_el(b"<DIv>x</DIv>", "DIv")
    assert el[2] == "DIv"


def test_repeated_html_body_ignored_no_attr_merge():  # Q23
    frag = b'<body><body class="x">t'
    el = first_el(frag, "body")
    assert el[4] == []  # attrs of the second <body> NOT merged
    assert text_of(frag) == "t"


def test_end_tag_with_attrs_engine_policy():  # D2
    t, meta = hp.extract_text(b"<p>a</p x=1>b")
    assert meta["tok_errors"] >= 1  # reference would crash (badrecord)
    assert meta["finished"]


def test_crash_after_finish_flag():  # D4: eof inside tbody
    t, meta = hp.extract_text(b"<table><tbody><tr><td>x")
    assert meta["finished"]
    assert meta["crashed_after_finish"]
