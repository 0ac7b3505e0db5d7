"""HTML serialization: flat DOM / simple tree back to markup.

The reference exports (but never calls) a reverse entity table
(htmerl_util:reference/1, :2382-3311).  This module makes it useful: a
serializer from the engine's tree representations back to HTML, with the
reference's codepoint->entity mapping for non-ASCII text.

Deviation note: reference/1 mixes raw-byte clauses (Latin-1) with /utf8
codepoint clauses and its fallback returns the whole binary — it cannot
actually be folded over a document.  We implement the evident intent
(codepoint -> &name;) and additionally escape the structurally required
characters (& < > " in attributes), which the reference table omits.
"""

from __future__ import annotations

from .entities import REVERSE_REFS
from .parser import VOID_ELEMENTS

_STRUCTURAL_TEXT = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}
_STRUCTURAL_ATTR = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def encode_entities(text: str, in_attr: bool = False) -> str:
    structural = _STRUCTURAL_ATTR if in_attr else _STRUCTURAL_TEXT
    out = []
    for ch in text:
        esc = structural.get(ch)
        if esc is not None:
            out.append(esc)
            continue
        cp = ord(ch)
        if cp > 127:
            name = REVERSE_REFS.get(cp)
            if name is not None:
                out.append(f"&{name};")
                continue
        out.append(ch)
    return "".join(out)


def _open_tag(name: str, attrs, void: bool) -> str:
    parts = ["<", name]
    for uri, prefix, local, value in attrs:
        qn = f"{prefix}:{local}" if prefix else local
        parts.append(f' {qn}="{encode_entities(value, in_attr=True)}"')
    parts.append("/>" if void else ">")
    return "".join(parts)


def serialize_tree(tree: dict) -> str:
    """Simple-form tree (htmpark.parse_simple output) -> HTML string."""
    out = []
    if tree["kind"] == "document":
        if tree["name"]:
            dt = "<!DOCTYPE " + tree["name"]
            if tree["public"]:
                dt += f' PUBLIC "{tree["public"]}"'
                if tree["system"]:
                    dt += f' "{tree["system"]}"'
            elif tree["system"]:
                dt += f' SYSTEM "{tree["system"]}"'
            out.append(dt + ">")
        for child in tree["content"]:
            out.append(serialize_tree(child))
        return "".join(out)
    if tree["kind"] == "element":
        name = tree["name"]
        void = name in VOID_ELEMENTS and not tree["content"]
        out.append(_open_tag(name, tree["attrs"], void))
        if not void:
            raw = name in ("script", "style")  # rawtext content, no escaping
            for child in tree["content"]:
                if raw and child["kind"] == "text":
                    out.append(child["value"])
                else:
                    out.append(serialize_tree(child))
            out.append(f"</{name}>")
        return "".join(out)
    if tree["kind"] == "text":
        return encode_entities(tree["value"])
    if tree["kind"] == "comment":
        return f"<!--{tree['value']}-->"
    return ""


def serialize_nodes(rows) -> str:
    """Flat node-table rows (htmpark.parse_nodes output) -> HTML string."""
    by_parent: dict = {}
    for r in rows:
        by_parent.setdefault(r[1], []).append(r)

    def render(r) -> str:
        nid, pid, kind, name, ns, attrs, text, depth, span, _line = r
        if kind == "element":
            kids = by_parent.get(nid, [])
            void = name in VOID_ELEMENTS and not kids
            s = _open_tag(name, attrs, void)
            if not void:
                raw = name in ("script", "style")
                for k in kids:
                    if raw and k[2] == "text":
                        s += k[6]
                    else:
                        s += render(k)
                s += f"</{name}>"
            return s
        if kind == "text":
            return encode_entities(text)
        if kind == "comment":
            return f"<!--{text}-->"
        if kind == "doctype":
            return f"<!DOCTYPE {name}>" if name else "<!DOCTYPE>"
        return ""

    return "".join(render(r) for r in by_parent.get(-1, []))
