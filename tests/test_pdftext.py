"""PDF text extraction (htmpark/pdftext.py): spec-subset parser + writer.

The north rule includes "PDF/layout parse" in the extraction surface;
the reference (zadean/htmerl) is HTML-only, so there is no quirk ledger
here — the contract is the PUBLIC PDF spec subset the module documents,
pinned by write->parse round trips and hand-built fixtures.
"""
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from htmpark.pdftext import extract_pdf_text, synthesize_pdf


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("tj_array", [False, True])
@pytest.mark.parametrize("text", [
    "hello world",
    "parens (nested (deep)) and \\ backslash and ) stray",
    "tabs\tand\nnewlines\r kept",
    "unicode é € 中文 🎉",
    "",
    "x" * 500,  # multi-chunk TJ path
])
def test_roundtrip(text, compress, tj_array):
    blob = synthesize_pdf(text, compress=compress, tj_array=tj_array)
    r = extract_pdf_text(blob)
    assert r["text"] == text
    assert r["parse_ok"] is True
    assert r["n_pages"] == 1
    assert r["stream_errors"] == 0


@settings(max_examples=60, deadline=None)
@given(st.text(), st.booleans(), st.booleans())
def test_roundtrip_property(text, compress, tj_array):
    r = extract_pdf_text(synthesize_pdf(text, compress, tj_array))
    # lone surrogates can't survive UTF-8; hypothesis text() excludes them
    assert r["text"] == text and r["parse_ok"]


def test_hand_built_operators():
    """Octal escapes, hex strings, TJ kerning numbers, comments — all in
    one uncompressed stream, per ISO 32000 7.3.4 / 9.4.3."""
    raw = (b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n"
           b"2 0 obj\n<< /Length 60 >>\nstream\n"
           b"BT % comment\n(\\101\\102) Tj <48656c6c6f> Tj [(a) -3 (b)] TJ ET"
           b"\nendstream\nendobj\n")
    r = extract_pdf_text(raw)
    assert r["text"] == "ABHelloab"
    assert r["n_text_ops"] == 3
    assert r["n_pages"] == 1


def test_line_continuation_and_unknown_escape():
    raw = (b"%PDF-1.4\n1 0 obj\n<< /Length 24 >>\nstream\n"
           b"BT (ab\\\ncd \\z) Tj ET\nendstream\nendobj\n")
    # \<newline> vanishes (continuation); \z -> z (unknown escape)
    assert extract_pdf_text(raw)["text"] == "abcd z"


def test_odd_hex_nibble_zero_padded():
    raw = (b"%PDF-1.4\n1 0 obj\n<< /Length 16 >>\nstream\n"
           b"<484950> Tj <5> Tj\nendstream\nendobj\n")
    assert extract_pdf_text(raw)["text"] == "HIPP"  # <5> -> 0x50 = 'P'


def test_length_bounds_stream_ending_in_eol_bytes():
    """Compressed payloads that END in 0x0D/0x0A must not be trimmed: the
    /Length entry, not an EOL heuristic, bounds the stream (the bug that
    corrupted 1-in-~128 Flate streams before the fix)."""
    for tail in (b"\r", b"\n", b"\r\n"):
        # brute-force a text whose compressed form ends with the tail
        for i in range(20000):
            content = b"BT (payload %d) Tj ET" % i
            z = zlib.compress(content)
            if z.endswith(tail):
                break
        else:
            pytest.skip(f"no witness for {tail!r}")
        raw = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(z)).encode()
               + b" /Filter /FlateDecode >>\nstream\n" + z
               + b"\nendstream\nendobj\n")
        r = extract_pdf_text(raw)
        assert r["parse_ok"] is True and r["text"] == f"payload {i}"


@pytest.mark.parametrize("text", [
    "video stream\nnext line " + "x" * 100,   # phantom-stream keyword
    "a line ending in stream\n(then parens)",
    "dict /Type /Page demo",                   # page marker in payload
    "about /Encrypt ion settings",             # encryption marker in payload
    "endstream inside text",
    "stream\n" * 5 + "tail",
])
@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("tj_array", [False, True])
def test_structural_keywords_in_payload_are_data(text, compress, tj_array):
    """Bytes inside stream payloads are DATA: 'stream\\n', '/Type /Page',
    and '/Encrypt' appearing in document text must not spawn phantom
    streams, inflate the page count, or trip the encryption refusal."""
    r = extract_pdf_text(synthesize_pdf(text, compress, tj_array))
    assert r["text"] == text
    assert r["parse_ok"] is True
    assert r["n_pages"] == 1


def test_indirect_length_not_misparsed():
    """'/Length 80 0 R' (indirect ref) must not backtrack-match as 8; the
    fallback endstream scan still bounds the stream."""
    raw = (b"%PDF-1.4\n1 0 obj\n<< /Length 80 0 R >>\nstream\n"
           b"BT (indirect) Tj ET\nendstream\nendobj\n")
    r = extract_pdf_text(raw)
    assert r["text"] == "indirect" and r["parse_ok"]


def test_error_contract():
    assert extract_pdf_text(b"GIF89a not a pdf")["parse_ok"] is False
    # corrupt Flate stream -> error counter, no crash
    raw = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 9 >>\n"
           b"stream\nnot-flate\nendstream\nendobj\n")
    r = extract_pdf_text(raw)
    assert r["parse_ok"] is False and r["stream_errors"] == 1
    # unsupported filter -> documented out-of-scope error
    raw2 = (b"%PDF-1.4\n1 0 obj\n<< /Filter /ASCII85Decode /Length 4 >>\n"
            b"stream\nabcd\nendstream\nendobj\n")
    r2 = extract_pdf_text(raw2)
    assert r2["parse_ok"] is False and r2["stream_errors"] == 1
    # encrypted -> refused outright
    assert extract_pdf_text(b"%PDF-1.4 /Encrypt 1 0 R")["parse_ok"] is False


def test_multistream_and_pagecount():
    page = b"<< /Type /Page /Parent 2 0 R >>"
    s1 = b"BT (one ) Tj ET"
    s2 = zlib.compress(b"BT (two) Tj ET")
    raw = (b"%PDF-1.4\n"
           b"1 0 obj\n" + page + b"\nendobj\n"
           b"2 0 obj\n" + page + b"\nendobj\n"
           b"3 0 obj\n<< /Length " + str(len(s1)).encode() + b" >>\nstream\n"
           + s1 + b"\nendstream\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(s2)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + s2
           + b"\nendstream\nendobj\n")
    r = extract_pdf_text(raw)
    assert r["text"] == "one two"
    assert r["n_pages"] == 2
    assert r["parse_ok"] is True
