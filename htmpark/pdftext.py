"""Minimal PDF text extraction — the north rule's "PDF/layout parse" leg.

Everything here derives from the PUBLIC PDF spec (ISO 32000 / PDF 1.7):
page text lives in content streams as text-showing operators — ``Tj``,
``'``, ``"`` (a literal/hex string operand) and ``TJ`` (an array of
strings interleaved with kerning numbers, which carry no text) — and
streams are optionally FlateDecode-compressed (= stdlib zlib).  No PDF
library exists in this environment, so the extractor implements exactly
the subset the spec makes cheap and unambiguous, and is HONEST about the
rest:

Handled (tested):
* literal strings ``(...)`` with nested parentheses and the escape set
  ``\\n \\r \\t \\b \\f \\( \\) \\\\ \\ooo`` plus line continuations;
* hex strings ``<...>`` (single-byte code points, odd final nibble
  zero-padded per spec);
* ``TJ`` arrays (strings concatenated in order, numbers skipped);
* FlateDecode and uncompressed streams; multiple streams concatenate in
  file order; ``/Count``-free page counting via ``/Type /Page`` objects.
* Text bytes are decoded as UTF-8 (errors='replace'): the engine's own
  writer (synthesize_pdf) emits UTF-8, making write->parse a byte-exact
  round trip; real-world simple-font Latin-1 text also survives.

Out of scope -> error counters / parse_ok=False, never a crash:
encrypted files, CID/multi-byte font encodings, object streams
(/ObjStm), LZW/ASCII85/DCT filters, xref repair.  (The reference
zadean/htmerl is HTML-only; this module exists because BASELINE.json's
north_rule includes PDF in the main-content extraction surface.)
"""

from __future__ import annotations

import re
import zlib

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}

_OPER_RE = re.compile(rb"[A-Za-z'\"*0-9]+")


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting at data[i] == '('.  Returns
    (decoded bytes, index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \d, \dd, \ddd
                oct_digits = bytearray([e])
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation: swallow EOL
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself (spec 7.3.4.2)
                out.append(e)
                i += 1
        elif c == 0x28:  # ( — balanced nesting is literal text
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a hex string starting at data[i] == '<'.  Returns
    (decoded bytes, index past '>')."""
    j = data.find(b">", i)
    if j < 0:
        j = len(data)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1:j])
    if len(digits) % 2:
        digits += b"0"  # spec: odd final nibble is zero-padded
    return bytes.fromhex(digits.decode()), j + 1


def _content_text(data: bytes) -> tuple[bytes, int]:
    """Concatenate the string operands of text-showing operators in one
    decoded content stream, in operator order.  Returns (bytes, n_ops)."""
    out = bytearray()
    pending: list[bytes] = []
    n_ops = 0
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x28:  # (
            s, i = _parse_literal(data, i)
            pending.append(s)
        elif c == 0x3C:  # < or <<
            if i + 1 < n and data[i + 1] == 0x3C:
                i += 2  # inline dict (e.g. BDC): no strings to keep
            else:
                s, i = _parse_hex(data, i)
                pending.append(s)
        elif c in (0x5B, 0x5D):  # [ ] — TJ arrays: strings accumulate
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = _OPER_RE.match(data, i)
            if m:
                tok = m.group()
                i = m.end()
                if tok in (b"Tj", b"TJ", b"'", b'"'):
                    out += b"".join(pending)
                    n_ops += 1
                    pending.clear()
                elif not re.fullmatch(rb"[0-9]+", tok):
                    # a non-numeric operator consumes its operands
                    pending.clear()
            else:
                i += 1
    return bytes(out), n_ops


# (?<!end): the 'stream' suffix of an 'endstream' keyword is not a
# stream-object opener
_STREAM_KW = re.compile(rb"(?<!end)stream\r?\n")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")


# (?!\d) stops backtracking from shortening a multi-digit indirect-ref
# number into a bogus match ('/Length 80 0 R' must not yield 8); the
# second lookahead rejects indirect refs of ANY generation number
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")


def _iter_streams(data: bytes):
    """Yield (dict_bytes, raw_stream_bytes, payload_start, extent_end) for
    every stream object, scanning SEQUENTIALLY past each stream's extent —
    a 'stream\\n' byte pattern INSIDE a stream's payload (e.g. corpus text
    that says "video stream") must never spawn a phantom stream object.
    The dictionary is located by balanced backward scan from 'stream';
    the stream extent comes from the dict's direct /Length when present
    (the spec-correct boundary — an EOL-trim heuristic would eat a real
    trailing 0x0D/0x0A byte of COMPRESSED data), else falls back to the
    next 'endstream' keyword minus one separator EOL."""
    pos = 0
    while True:
        m = _STREAM_KW.search(data, pos)
        if m is None:
            return
        start = m.end()
        # walk back to the matching '<<' of the innermost dict before it
        j = m.start()
        depth = 0
        k = j
        while k >= 1:
            pair = data[k - 1:k + 1]
            if pair == b">>":
                depth += 1
                k -= 2
            elif pair == b"<<":
                depth -= 1
                if depth <= 0:
                    break
                k -= 2
            else:
                k -= 1
        d = data[max(k - 1, 0):j]
        lm = _LENGTH_RE.search(d)
        raw = None
        end = None
        if lm:
            length = int(lm.group(1))
            tail = data[start + length:start + length + 16]
            if re.match(rb"\s*endstream", tail):
                raw = data[start:start + length]
                end = start + length
        if raw is None:
            end = data.find(b"endstream", start)
            if end < 0:
                return
            raw = data[start:end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
        # resume scanning AFTER the closing keyword, never inside it
        m2 = re.compile(rb"\s*endstream").match(data, end)
        pos = m2.end() if m2 else end + 9
        yield d, raw, start, end


def extract_pdf_text(data: bytes) -> dict:
    """Extract text from a PDF's content streams.

    Returns {"text": str, "n_pages": int, "n_text_ops": int,
    "stream_errors": int, "parse_ok": bool}.  parse_ok is False when the
    header is missing or any stream failed to decode — the same
    error-row-not-crash contract as the HTML engine.

    Structural markers (/Encrypt, /Type /Page) are matched against the
    STRUCTURE bytes only — the file with every stream payload excised —
    so document text that happens to contain '/Type /Page' or '/Encrypt'
    can never be mistaken for objects (payload bytes are data, not
    structure)."""
    ok = data[:5] == b"%PDF-"
    errors = 0
    text = bytearray()
    n_ops = 0
    streams = []
    cursor = 0
    structure = bytearray()
    for d, raw, payload_start, end in _iter_streams(data):
        streams.append((d, raw))
        structure += data[cursor:payload_start]
        cursor = end
    structure += data[cursor:]
    if ok and re.search(rb"/Encrypt\s", bytes(structure)):
        return {"text": "", "n_pages": 0, "n_text_ops": 0,
                "stream_errors": 1, "parse_ok": False}
    for d, raw in streams:
        if b"/FlateDecode" in d:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                errors += 1
                continue
        elif re.search(rb"/Filter", d):
            errors += 1  # LZW/ASCII85/DCT/... — documented out of scope
            continue
        t, k = _content_text(raw)
        text += t
        n_ops += k
    return {
        "text": text.decode("utf-8", errors="replace"),
        "n_pages": len(_PAGE_RE.findall(bytes(structure))),
        "n_text_ops": n_ops,
        "stream_errors": errors,
        "parse_ok": bool(ok) and errors == 0,
    }


# ---------------------------------------------------------------------------
# writer — deterministic minimal PDFs for the round-trip gate and tests

def _escape_literal(b: bytes) -> bytes:
    return (b.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
             .replace(b")", b"\\)"))


def synthesize_pdf(text: str, compress: bool = False,
                   tj_array: bool = False) -> bytes:
    """Build a minimal valid single-page PDF carrying ``text``.

    ``compress`` Flate-encodes the content stream; ``tj_array`` emits the
    text as a TJ array of <=48-byte chunks interleaved with kerning
    numbers (the layout-operator shape real generators produce) instead
    of one Tj.  Offsets in the xref table are byte-exact, so external
    viewers accept the file too."""
    payload = text.encode("utf-8")
    if tj_array:
        chunks = [payload[i:i + 48] for i in range(0, len(payload), 48)] or [b""]
        arr = b" -24 ".join(b"(" + _escape_literal(c) + b")" for c in chunks)
        shown = b"[" + arr + b"] TJ"
    else:
        shown = b"(" + _escape_literal(payload) + b") Tj"
    content = b"BT /F1 12 Tf 72 720 Td " + shown + b" ET"
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        (b"<< /Length " + str(len(content)).encode() + filt
         + b" >>\nstream\n" + content + b"\nendstream"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += ("%010d 00000 n \n" % off).encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)
