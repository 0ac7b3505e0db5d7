"""sitemaps.org protocol support for crawl pipelines.

A crawl that honors robots.txt (htmpark.robots) also reads the
``Sitemap:`` directives it declares (robots.sitemaps): each names an XML
sitemap whose ``<loc>`` entries are URLs the site ASKS the crawler to
fetch — the publisher-side complement of the link-discovered frontier.
This module is the engine-side consumer: the <loc> extraction runs the
REAL htmpark parser (the sitemap XML is just another markup document to
the tokenizer/tree machinery), and the protocol's location-scope rule
decides which entries a polite crawler may accept.

Not derived from the reference (zadean/htmerl parses markup only); the
semantics follow the public sitemaps.org protocol:

* a sitemap lists ``<url><loc>...</loc></url>`` entries under
  ``<urlset>`` (index files nest ``<sitemap><loc>`` the same way — the
  extraction is element-name driven, so both shapes yield their locs);
* **location scope**: a sitemap located at
  ``scheme://host/dir/sitemap.xml`` can only contain URLs on the SAME
  scheme+host(+port) whose path starts with ``/dir/`` — entries outside
  that scope "are considered invalid" and a consumer must drop them
  (this is the rule that stops an untrusted sitemap from injecting
  other sites' URLs into the frontier);
* whitespace around the loc value is insignificant (XML text nodes are
  trimmed).

The Spark surface is queries.q_web_sitemap_coverage: the per-host
sitemap dimension (robots parse -> fetch -> loc extraction, one
mapInPandas over the bounded host dim, same shape as the robots rules
dimension) joins the link-discovered frontier targets to split declared
URLs into already-discovered vs new crawl seeds, with the robots gate
applied to the seeds.
"""
from __future__ import annotations


def sitemap_locs(xml_bytes) -> list:
    """``<loc>`` element texts from sitemap XML, in document order, via
    the real parser (htmpark.sax fold): characters buffered between the
    startElement/endElement of each ``loc``, surrounding whitespace
    stripped.  Nested/NON-loc markup inside an entry (lastmod,
    changefreq, ...) is ignored.  A truncated document still emits its
    trailing loc: the tree builder's EOF recovery implies the missing
    end tags (HTML5 semantics), so the buffered text closes with the
    document — the location-scope check downstream is the guard
    against a mid-URL cut yielding a foreign-looking host."""
    from . import sax

    def fold(ev, _line, st):
        locs, buf = st
        if isinstance(ev, tuple):
            if ev[0] == "startElement" and ev[2] == "loc":
                return (locs, [])
            if ev[0] == "characters" and buf is not None:
                buf.append(ev[1])
            elif ev[0] == "endElement" and ev[2] == "loc" \
                    and buf is not None:
                locs.append("".join(buf).strip())
                return (locs, None)
        return st

    (locs, _buf), _tb = sax(xml_bytes, fold, ([], None))
    return locs


def _split_url(url: str):
    """(scheme, hostport, path) of an absolute URL — scheme and
    hostport lowercased (case-insensitive per RFC 3986 §6.2.2.1), path
    as given; authority ends at the first ``/?#`` after the FIRST
    ``://`` (the same split discipline as queries._with_canon_url)."""
    low = url.lower()
    i = low.find("://")
    if i <= 0:
        return ("", "", url)
    scheme = low[:i]
    rest = url[i + 3:]
    j = len(rest)
    for sep in "/?#":
        k = rest.find(sep)
        if k != -1:
            j = min(j, k)
    path = rest[j:] if j < len(rest) and rest[j] == "/" else "/"
    return (scheme, rest[:j].lower(), path.split("?", 1)[0]
            .split("#", 1)[0])


def loc_in_scope(loc: str, sitemap_url: str) -> bool:
    """sitemaps.org location-scope rule: ``loc`` is valid for the
    sitemap at ``sitemap_url`` iff scheme and host(+port) match
    (case-insensitive) and the loc path starts with the sitemap's
    DIRECTORY path (a root-level ``/sitemap.xml`` covers the whole
    host; ``/sub/sitemap.xml`` covers only ``/sub/...``)."""
    ls, lh, lp = _split_url(loc)
    ss, sh, sp = _split_url(sitemap_url)
    if not ls or (ls, lh) != (ss, sh):
        return False
    sdir = sp[:sp.rfind("/") + 1] if "/" in sp else "/"
    return lp.startswith(sdir)
