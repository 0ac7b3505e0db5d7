"""SAX-event sinks: the engine's analogues of the reference's user folds.

The reference exposes a single-pass fold over xmerl-style events
(/root/reference/src/htmerl.erl:33-41, README.md:68-133).  Our engine drives
the same event stream into pluggable sinks:

* EventListSink   — full event tuples, shaped like htmerl:sax/1 output
                    (htmerl_sax_utf8.erl:114-119); used by parity tests.
* SimpleTreeSink  — nested dict tree matching htmerl_simple:string/1
                    (htmerl_simple.erl:10-97); used by tree goldens.
* TextSink        — extracted-text fast path: concatenates characters events
                    outside script/style subtrees (the byte-parity surface).
* NodeTableSink   — flat Arrow-friendly DOM: one row per SAX-visible node
                    with parent pointers (FIXTURES.md §4); feeds the Spark
                    node-table output.
"""

from __future__ import annotations

from .parser import HTML_NS


class BaseSink:
    wants_lines = False  # opt-in: Parser tracks line numbers only if True

    def start_document(self): pass
    def end_document(self): pass
    def start_dtd(self, name, public, system): pass
    def end_dtd(self): pass
    def start_prefix_mapping(self, prefix, uri): pass
    def end_prefix_mapping(self, prefix): pass
    def start_element(self, uri, local, attrs): pass
    def end_element(self, uri, local): pass
    def characters(self, text): pass
    def comment(self, text): pass


class EventListSink(BaseSink):
    """Accumulates events as tuples mirroring htmerl:sax/1 exactly.

    ``with_lines=True`` additionally records the tokenizer line number of
    every event in the parallel ``lines`` list — the LineNum argument the
    reference passes to every user event_fun call (send_event,
    htmerl_sax_utf8.erl:3437-3447); an htmerl fold ``fun(Event, LineNum,
    State)`` ports as ``zip(sink.events, sink.lines)``."""

    def __init__(self, with_lines: bool = False):
        self.events = []
        self.lines = [] if with_lines else None
        self.wants_lines = with_lines
        self.tb = None  # set by Parser.parse; carries .line

    def _append(self, ev):
        self.events.append(ev)
        if self.lines is not None:
            self.lines.append(self.tb.line if self.tb is not None else 1)

    def start_document(self):
        self._append("startDocument")

    def end_document(self):
        self._append("endDocument")

    def start_dtd(self, name, public, system):
        self._append(("startDTD", name, public, system))

    def end_dtd(self):
        self._append("endDTD")

    def start_prefix_mapping(self, prefix, uri):
        self._append(("startPrefixMapping", prefix, uri))

    def end_prefix_mapping(self, prefix):
        self._append(("endPrefixMapping", prefix))

    def start_element(self, uri, local, attrs):
        self._append(("startElement", uri, local, ("", local), list(attrs)))

    def end_element(self, uri, local):
        self._append(("endElement", uri, local, ("", local)))

    def characters(self, text):
        self._append(("characters", text))

    def comment(self, text):
        self._append(("comment", text))


class FoldSink(BaseSink):
    """htmerl:sax/2 user-fold adapter (reference src/htmerl.erl:27-41,
    htmerl_sax_utf8.erl:3437-3447): every SAX event becomes
    ``state = event_fun(event, line_num, state)``, with the same xmerl-style
    event tuples as EventListSink."""

    wants_lines = True

    def __init__(self, event_fun, user_state):
        self.fun = event_fun
        self.state = user_state
        self.tb = None  # set by Parser.parse

    def _ev(self, ev):
        self.state = self.fun(ev, self.tb.line if self.tb is not None else 1,
                              self.state)

    def start_document(self):
        self._ev("startDocument")

    def end_document(self):
        self._ev("endDocument")

    def start_dtd(self, name, public, system):
        self._ev(("startDTD", name, public, system))

    def end_dtd(self):
        self._ev("endDTD")

    def start_prefix_mapping(self, prefix, uri):
        self._ev(("startPrefixMapping", prefix, uri))

    def end_prefix_mapping(self, prefix):
        self._ev(("endPrefixMapping", prefix))

    def start_element(self, uri, local, attrs):
        self._ev(("startElement", uri, local, ("", local), list(attrs)))

    def end_element(self, uri, local):
        self._ev(("endElement", uri, local, ("", local)))

    def characters(self, text):
        self._ev(("characters", text))

    def comment(self, text):
        self._ev(("comment", text))


class SimpleTreeSink(BaseSink):
    """Builds the simple-form tree (htmerl_simple.erl:21-97) as dicts.

    Document: {kind:'document', name, public, system, content:[...]}
    Element:  {kind:'element', name, ns, attrs:[(uri,prefix,local,value)],
               content:[...]}
    Text:     {kind:'text', value} / Comment: {kind:'comment', value}
    """

    def __init__(self):
        self.stack = []
        self.result = None

    def start_document(self):
        self.stack = [{"kind": "document", "name": "", "public": "",
                       "system": "", "content": []}]

    def start_dtd(self, name, public, system):
        d = self.stack[0]
        d["name"], d["public"], d["system"] = name, public, system

    def start_element(self, uri, local, attrs):
        self.stack.append({"kind": "element", "name": local, "ns": uri,
                           "attrs": list(attrs), "content": []})

    def end_element(self, uri, local):
        e = self.stack.pop()
        self.stack[-1]["content"].append(e)

    def characters(self, text):
        self.stack[-1]["content"].append({"kind": "text", "value": text})

    def comment(self, text):
        self.stack[-1]["content"].append({"kind": "comment", "value": text})

    def end_document(self):
        self.result = self.stack[0]


# tags whose subtree text is excluded from the extracted-text surface
# (FIXTURES.md P11: script/style content is parsed into the tree but must
# not contribute to the text column).
TEXT_EXCLUDE = frozenset(("script", "style"))


class TextSink(BaseSink):
    """Concatenates characters events outside script/style (byte-parity)."""

    __slots__ = ("parts", "_skip")

    def __init__(self):
        self.parts = []
        self._skip = 0

    def start_element(self, uri, local, attrs):
        if local in TEXT_EXCLUDE and uri == HTML_NS:
            self._skip += 1

    def end_element(self, uri, local):
        if local in TEXT_EXCLUDE and uri == HTML_NS:
            self._skip -= 1

    def characters(self, text):
        if not self._skip:
            self.parts.append(text)

    @property
    def text(self) -> str:
        return "".join(self.parts)


class NodeTableSink(BaseSink):
    """Flat DOM: rows (node_id, parent_id, kind, name, ns, attrs, text,
    depth, span_start, line).

    Pre-order: parent_id < node_id always (FIXTURES.md §4 invariant).  The
    nested simple-form tree is reconstructible from parent pointers, which is
    what makes the representation Arrow/columnar-friendly (no recursive
    struct types).  span_start is the char offset of the element's '<' in
    the newline-normalized decoded source (-1 for implied elements and
    non-element nodes); line is the tokenizer line number at the node's
    emitting event (send_event LineNum, htmerl_sax_utf8.erl:3437-3447) —
    for text nodes that is the FLUSH point (the token after the run), per
    the reference's deferred maybe_pop_text.
    """

    __slots__ = ("rows", "stack", "next_id", "tb")
    wants_lines = True  # class attr, outside __slots__

    def __init__(self):
        self.rows = []  # [node_id, parent_id, kind, name, ns, attrs, text, depth, span_start, line]
        self.stack = [-1]
        self.next_id = 0
        self.tb = None  # set by Parser.parse

    def _add(self, kind, name, ns, attrs, text, span=-1):
        nid = self.next_id
        self.next_id = nid + 1
        line = self.tb.line if self.tb is not None else 1
        self.rows.append((nid, self.stack[-1], kind, name, ns, attrs, text,
                          len(self.stack) - 1, span, line))
        return nid

    def start_dtd(self, name, public, system):
        self._add("doctype", name, "", [(public or "", "", "public", ""),
                                        (system or "", "", "system", "")], "")

    def start_element(self, uri, local, attrs):
        span = self.tb.last_off if self.tb is not None else -1
        nid = self._add("element", local, uri, list(attrs), "", span)
        self.stack.append(nid)

    def end_element(self, uri, local):
        if len(self.stack) > 1:
            self.stack.pop()

    def characters(self, text):
        self._add("text", "", "", [], text)

    def comment(self, text):
        self._add("comment", "", "", [], text)
