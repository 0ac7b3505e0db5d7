"""Differential test: the whole-tag regex fast path must be semantically
invisible — events identical with the fast path disabled (machine-only)."""
import re
import string

import pytest
from hypothesis import given, settings, strategies as st

import htmpark
from htmpark import parser as P

_NEVER = re.compile(r"(?!x)x")


def events_both(html: bytes):
    fast, _ = htmpark.parse_events(html)
    saved = P._RE_FAST_TAG
    P._RE_FAST_TAG = _NEVER
    try:
        slow, _ = htmpark.parse_events(html)
    finally:
        P._RE_FAST_TAG = saved
    return fast, slow


# grammar mixing eligible and ineligible tag shapes
name = st.sampled_from(["div", "p", "a", "x1", "DIV", "DIv", "spAn", "h1"])
attr = st.sampled_from([
    ' a="1"', " b='2'", " c=3", ' d="x<y"', ' e="&amp;"', " f", ' G="8"',
    '  multi="v"\tws="w"', ' a="1" a="2"', " =odd", ' Z="u"', ' k-x="v"',
])
tail = st.sampled_from([">", "/>", " >", " / >", ""])
tag = st.builds(lambda n, a, t: f"<{n}{a}{t}", name, attr, tail)
text = st.text(alphabet=list(string.ascii_letters) + ["&", " ", "<"], max_size=12)
doc = st.lists(st.one_of(tag, text), max_size=12).map("".join)


@settings(max_examples=400, deadline=None)
@given(doc)
def test_fast_path_invisible(s):
    fast, slow = events_both(s.encode("utf-8"))
    assert fast == slow


@pytest.mark.parametrize("html", [
    b'<div a="1" b="2">x</div>',
    b"<div >x",
    b"<br/>",
    b'<p class="x" class="y">dup</p>',
    b'<a href="q=1&amp;r=2">charref attr</a>',  # & -> not fast path
    b"<p a='sq'>single-quote attrs</p>",
    b"<p a=unquoted>u</p>",
    b'<textarea rows="2">rc</textarea>',        # datafn switch via fast path
    b'<script type="t">s</script>x',
    b'<input value="v">',
    b'<p\ta="tab ws">t</p>',
])
def test_fast_path_cases(html):
    fast, slow = events_both(html)
    assert fast == slow
