"""README golden fixtures (FIXTURES.md §2; reference README.md:17-171).

Expected outputs hand-derived from the reference source; they ARE the parity
contract (no Erlang runtime in this sandbox).
"""
import htmpark as hp

H = "http://www.w3.org/1999/xhtml"


def ev(html, **kw):
    events, tb = hp.parse_events(html, **kw)
    assert tb.finished
    return events


def s_el(name, attrs=()):
    return ("startElement", H, name, ("", name), list(attrs))


def e_el(name):
    return ("endElement", H, name, ("", name))


SKELETON_OPEN = [
    "startDocument",
    ("startPrefixMapping", "", H),
]


def test_g1_sax_event_list():
    # README.md:38-66 verbatim
    events = ev(b"<!DOCTYPE html><html><body>Hello</body></html>")
    assert events == [
        "startDocument",
        ("startDTD", "html", "", ""),
        "endDTD",
        ("startPrefixMapping", "", H),
        s_el("html"),
        s_el("head"),
        e_el("head"),
        s_el("body"),
        ("characters", "Hello"),
        e_el("body"),
        e_el("html"),
        ("endPrefixMapping", ""),
        "endDocument",
    ]


def test_g1_simple_tree():
    # README.md:17-31: implied <head>, namespace on every element
    tree, tb = hp.parse_simple(b"<!DOCTYPE html><html><body>Hello</body></html>")
    assert tb.finished
    assert tree["kind"] == "document" and tree["name"] == "html"
    (html,) = tree["content"]
    assert html["name"] == "html" and html["ns"] == H
    head, body = html["content"]
    assert head["name"] == "head" and head["content"] == []
    assert body["name"] == "body"
    assert body["content"] == [{"kind": "text", "value": "Hello"}]


def test_g2_xpath_fold():
    # README.md:103-133: text of html/body/p in doc order
    events = ev(
        b"<html><body><p>Check</p>nothing here<p>this <b>bold garbage</b>"
        b"</p>garbage<p>out!</p></body></html>"
    )
    path, acc = [], []
    for e in events:
        if e[0] == "startElement":
            path.append(e[2])
        elif e[0] == "endElement":
            assert path and path[-1] == e[2]
            path.pop()
        elif e[0] == "characters" and path == ["html", "body", "p"]:
            acc.append(e[1])
    assert acc == ["Check", "this", "out!"]  # 'this ' collapses to 'this'


def test_g2_characters_sequence():
    events = ev(
        b"<html><body><p>Check</p>nothing here<p>this <b>bold garbage</b>"
        b"</p>garbage<p>out!</p></body></html>"
    )
    chars = [e[1] for e in events if e[0] == "characters"]
    assert chars == ["Check", "nothing here", "this", "bold garbage", "garbage", "out!"]


def test_g3_preserve_ws():
    # README.md:135-171: raw whitespace retained, elements implied
    events = ev(b"<p>   Well,\t\n Hello!!   ", preserve_ws=True)
    assert events == SKELETON_OPEN + [
        s_el("html"),
        s_el("head"),
        e_el("head"),
        s_el("body"),
        s_el("p"),
        ("characters", "   Well,\t\n Hello!!   "),
        e_el("p"),
        e_el("body"),
        e_el("html"),
        ("endPrefixMapping", ""),
        "endDocument",
    ]


def test_g4_empty_input_full_skeleton():
    # implied-element chain on eof (htmerl_sax_utf8.erl:148-149,1927-2210)
    events = ev(b"")
    assert events == SKELETON_OPEN + [
        s_el("html"),
        s_el("head"),
        e_el("head"),
        s_el("body"),
        e_el("body"),
        e_el("html"),
        ("endPrefixMapping", ""),
        "endDocument",
    ]


def test_byte_parity_roundtrip_utf8():
    # non-ASCII text survives byte-exactly
    txt = "héllo wörld — ∑ ünïcode"
    html = f"<p>{txt}</p>".encode("utf-8")
    out, meta = hp.extract_text(html)
    assert out == txt
    assert meta["finished"]


def test_invalid_utf8_roundtrips():
    # deviation D1: invalid bytes pass through the batch path untouched
    html = b"<p>a\xff\xfeb</p>"
    out, meta = hp.extract_text(html)
    assert out.encode("utf-8", "surrogateescape") == b"a\xff\xfeb"
