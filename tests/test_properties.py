"""Property tests: the parser must terminate and be stable on arbitrary soup."""
import string

from hypothesis import given, settings, strategies as st

import htmpark as hp

soup_alphabet = st.sampled_from(
    list(string.ascii_letters)
    + list("<>&;/=\"' \t\n\f-!?#[]")
    + ["\x00", "é", " ", "�"]
)
soup = st.text(alphabet=soup_alphabet, max_size=300)


@settings(max_examples=300, deadline=None)
@given(soup)
def test_parser_terminates_and_is_deterministic(s):
    b = s.encode("utf-8", "surrogateescape")
    t1, m1 = hp.extract_text(b)
    t2, m2 = hp.extract_text(b)
    assert t1 == t2 and m1 == m2


@settings(max_examples=200, deadline=None)
@given(soup)
def test_events_well_formed(s):
    ev, tb = hp.parse_events(s.encode("utf-8", "surrogateescape"))
    depth = 0
    for e in ev:
        if e[0] == "startElement":
            depth += 1
        elif e[0] == "endElement":
            depth -= 1
    if tb.finished:
        # when the document finished, every opened element was closed
        assert depth == 0
        assert ev[-1] == "endDocument"


@settings(max_examples=200, deadline=None)
@given(soup)
def test_node_table_invariants(s):
    rows, tb = hp.parse_nodes(s.encode("utf-8", "surrogateescape"))
    seen = set()
    for nid, pid, *_ in rows:
        assert pid < nid
        assert pid == -1 or pid in seen
        seen.add(nid)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_arbitrary_bytes_never_crash(b):
    t, meta = hp.extract_text(b)
    assert isinstance(t, str)
