"""Flat-DOM node table + simple-tree invariants (FIXTURES.md §4)."""
import htmpark as hp


def nodes(frag, **kw):
    rows, tb = hp.parse_nodes(frag, **kw)
    return rows, tb


def test_preorder_parent_pointers():
    rows, tb = nodes(b"<!DOCTYPE html><html><body><p>a<b>c</b></p></body></html>")
    assert tb.finished
    for nid, pid, *_ in rows:
        assert pid < nid  # pre-order invariant


def test_depth_consistency():
    rows, _ = nodes(b"<body><div><p>x</p></div></body>")
    by_id = {r[0]: r for r in rows}
    for nid, pid, kind, name, ns, attrs, text, depth, span, line in rows:
        if pid >= 0:
            assert depth == by_id[pid][7] + 1


def test_reconstructed_tree_matches_simple():
    html = b"<!DOCTYPE html><html><body>Hello<p q=1>x</p><!--c--></body></html>"
    rows, _ = nodes(html)
    simple, _ = hp.parse_simple(html)

    by_parent = {}
    for r in rows:
        by_parent.setdefault(r[1], []).append(r)

    def build(r):
        nid, pid, kind, name, ns, attrs, text, depth, span, line = r
        if kind == "element":
            return {"kind": "element", "name": name, "ns": ns, "attrs": attrs,
                    "content": [build(c) for c in by_parent.get(nid, [])]}
        if kind == "text":
            return {"kind": "text", "value": text}
        if kind == "comment":
            return {"kind": "comment", "value": text}
        return None

    roots = [build(r) for r in by_parent.get(-1, []) if r[2] == "element"]
    assert roots == simple["content"]


def test_node_text_concat_equals_extracted():
    html = b"<body><p>a</p><script>skip</script><div>b<style>s{}</style>c</div></body>"
    rows, _ = nodes(html)
    text, _ = hp.extract_text(html)
    by_id = {r[0]: r for r in rows}

    def under_excluded(r):
        pid = r[1]
        while pid >= 0:
            p = by_id[pid]
            if p[2] == "element" and p[3] in ("script", "style"):
                return True
            pid = p[1]
        return False

    concat = "".join(r[6] for r in rows if r[2] == "text" and not under_excluded(r))
    assert concat == text == "abc"


def test_doctype_row():
    rows, _ = nodes(b'<!DOCTYPE html PUBLIC "p" "s"><html></html>')
    dt = [r for r in rows if r[2] == "doctype"]
    assert len(dt) == 1 and dt[0][3] == "html"


def test_g1_tree_shape_via_nodes():
    rows, _ = nodes(b"<!DOCTYPE html><html><body>Hello</body></html>")
    els = [(r[3], r[7]) for r in rows if r[2] == "element"]
    assert els == [("html", 0), ("head", 1), ("body", 1)]
    texts = [r[6] for r in rows if r[2] == "text"]
    assert texts == ["Hello"]
