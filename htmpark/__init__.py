"""htmpark — PySpark-native HTML5 extraction engine.

A from-scratch reimplementation of the zadean/htmerl parsing pipeline
(reference read-only at /root/reference) re-expressed Spark-first: the
per-document HTML5 tokenizer + tree builder run inside vectorized
``mapInPandas`` UDFs over Arrow batches of html bytes; everything relational
(scan, repartition, metrics, checkpoint/resume) is declarative DataFrame
code optimized by Catalyst.

Public API:
    parse_events(html)          -> list of xmerl-style SAX events
    parse_simple(html)          -> nested simple-form tree (dict)
    extract_text(html)          -> (text, meta) byte-parity extracted text
    parse_nodes(html)           -> flat DOM rows (parent-pointer table)
    job.extract_pages(df, ...)  -> the distributed extraction pipeline
"""

from .parser import Parser, TreeBuilder, norm_whitespaces
from .sinks import (EventListSink, FoldSink, SimpleTreeSink, TextSink,
                    NodeTableSink)
from .serialize import encode_entities, serialize_nodes, serialize_tree

__version__ = "0.1.0"


def parse_events(html, preserve_ws: bool = False, with_lines: bool = False):
    """htmerl:sax/1 equivalent (reference src/htmerl.erl:23-24).

    ``with_lines=True`` returns (list[(event, line)], tb) — the LineNum the
    reference passes to every event_fun call (htmerl_sax_utf8.erl:3437-3447).
    """
    sink = EventListSink(with_lines=with_lines)
    tb = Parser().parse(html, sink, preserve_ws)
    if with_lines:
        return list(zip(sink.events, sink.lines)), tb
    return sink.events, tb


def sax(html, event_fun=None, user_state=None, preserve_ws: bool = False):
    """htmerl:sax/2 equivalent (reference src/htmerl.erl:27-41): folds
    ``event_fun(event, line_num, state)`` over the SAX stream — the same
    three-argument signature the reference hands every user fold
    (htmerl_sax_utf8.erl:3437-3447) — and returns (final_state, tb), the
    analogue of ``{ok, UserState, Warnings}`` (Warnings is always [] in the
    reference; warning formatting is an unreached TODO at :3585).

    With no event_fun, the default fold collects events in document order
    (the reference's default_state fun, :114-119, accumulates reversed and
    flips at endDocument — net effect identical)."""
    if event_fun is None:
        user_state = [] if user_state is None else user_state

        def event_fun(ev, _line, acc):
            acc.append(ev)
            return acc

    sink = FoldSink(event_fun, user_state)
    tb = Parser().parse(html, sink, preserve_ws)
    return sink.state, tb


def parse_simple(html, preserve_ws: bool = False):
    """htmerl:simple/1 equivalent (reference src/htmerl.erl:16-17)."""
    sink = SimpleTreeSink()
    tb = Parser().parse(html, sink, preserve_ws)
    return sink.result, tb


def extract_text(html, preserve_ws: bool = False):
    """Byte-parity extracted text: concatenated characters events outside
    script/style.  Returns (text, meta dict with error counters/flags)."""
    sink = TextSink()
    p = Parser()
    tb = p.parse(html, sink, preserve_ws)
    meta = {
        "finished": tb.finished,
        "crashed_after_finish": tb.crashed_after_finish,
        "tok_errors": p.tok_errors,
        "tree_errors": tb.tree_errors,
    }
    return sink.text, meta


def parse_nodes(html, preserve_ws: bool = False):
    """Flat DOM rows (FIXTURES.md §4)."""
    sink = NodeTableSink()
    tb = Parser().parse(html, sink, preserve_ws)
    return sink.rows, tb
