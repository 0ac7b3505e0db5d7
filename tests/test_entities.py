"""Entity table semantics (htmerl_util.erl:149-2380; SURVEY.md Q6-Q8)."""
import html.entities

import htmpark as hp
from htmpark.entities import ENTITIES, ENTITY_ORDER, mask_code_ref
from htmpark.parser import match_entity


def txt(frag):
    t, meta = hp.extract_text(frag)
    return t


def test_table_is_whatwg_complete():
    assert len(ENTITIES) == 2231
    assert set(ENTITY_ORDER) == set(html.entities.html5)


def test_first_match_order_not_shadows_notin():
    assert ENTITIES["not"][0] < ENTITIES["notin;"][0]
    assert match_entity("notin;x", 0) == ("\xac", 3)


def test_legacy_prefix_shadows_longer_names():
    # any name extending a semicolon-less legacy name is shadowed
    assert match_entity("gtdot;", 0) == (">", 2)      # 'gt' beats 'gtdot;'
    assert match_entity("copysr;", 0) == ("\xa9", 4)  # 'copy' beats 'copysr;'
    assert match_entity("ltcc;", 0) == ("<", 2)       # 'lt' beats 'ltcc;'


def test_semicolon_variant_wins_when_earlier():
    # 'lt;' (idx 2) precedes 'lt' (idx 3): '&lt;' consumes the semicolon
    assert match_entity("lt;x", 0) == ("<", 3)
    assert match_entity("ltx", 0) == ("<", 2)  # legacy no-semi


def test_no_match_returns_none():
    assert match_entity("zzqqx;", 0) is None
    assert match_entity(";", 0) is None


def test_multi_codepoint_entity():
    got = match_entity("NotEqualTilde;", 0)
    assert got == ("≂̸", 14)


def test_no_attr_context_suppression():  # Q8
    ev, _ = hp.parse_events(b'<a href="a&notit">t</a>')
    el = next(e for e in ev if e[0] == "startElement" and e[2] == "a")
    assert el[4] == [("", "", "href", "a\xacit")]


def test_entity_in_attr_value_with_semicolon():
    ev, _ = hp.parse_events(b'<a href="x&amp;y=1">t</a>')
    el = next(e for e in ev if e[0] == "startElement" and e[2] == "a")
    assert el[4] == [("", "", "href", "x&y=1")]


def test_stale_buffer_replays_in_attr():  # Q5 applies to attrs too
    ev, _ = hp.parse_events(b'<a href="&lt;& ">t</a>')
    el = next(e for e in ev if e[0] == "startElement" and e[2] == "a")
    assert el[4] == [("", "", "href", "<< ")]


def test_mask_code_ref_table():
    assert mask_code_ref(0x00) == 0xFFFD
    assert mask_code_ref(0x80) == 0x20AC
    assert mask_code_ref(0x9F) == 0x0178
    assert mask_code_ref(0x81) == 0x81  # gap in the Win-1252 table: kept
    assert mask_code_ref(0xD800) == 0xFFFD
    assert mask_code_ref(0x10FFFF) == 0xFFFD  # reference uses >=
    assert mask_code_ref(0x10FFFE) == 0x10FFFE


def test_amp_without_terminator():
    assert txt(b"<p>&ampx</p>") == "&x"


def test_hex_uppercase_x():
    assert txt(b"<p>&#X41;</p>") == "A"


def test_bare_amp_hash_flushes_literally():
    # '&#' + non-digit flushes the buffered '&#' (then replays later! Q5)
    assert txt(b"<p>&#z</p>") == "&#z"
    assert txt(b"<p>&#xg</p>") == "&#xg"
    # ...and a later bare '&' replays the stale '&#'
    assert txt(b"<p>&#z & w</p>") == "&#z &# w"
