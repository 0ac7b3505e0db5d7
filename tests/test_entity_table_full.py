"""Systematic first-match check over the ENTIRE entity table.

For every one of the 2231 names, `&name;`/`&name` must decode to whatever
the reference's clause order dictates: the candidate (prefix of the input)
with the smallest clause index — independently recomputed here by brute
force over the table, then compared against the parser's match_entity.
"""
from htmpark.entities import ENTITIES, ENTITY_ORDER
from htmpark.parser import match_entity


def brute_force(s: str):
    best = None
    for name, (idx, decoded) in ENTITIES.items():
        if s.startswith(name) and (best is None or idx < best[0]):
            best = (idx, decoded, len(name))
    if best is None:
        return None
    return best[1], best[2]


def test_every_entity_first_match():
    mismatches = []
    for name in ENTITY_ORDER:
        s = name + "x"  # trailing garbage so semicolon-less names terminate
        got = match_entity(s, 0)
        want = brute_force(s)
        want = (want[0], want[1]) if want else None
        if got != want:
            mismatches.append((name, got, want))
    assert not mismatches, mismatches[:5]


def test_shadowed_semicolon_names_census():
    """Count how many `name;` entries are shadowed by earlier legacy names —
    pins the table's shape so regeneration drift is caught."""
    shadowed = []
    for name in ENTITY_ORDER:
        if not name.endswith(";"):
            continue
        got = match_entity(name, 0)
        idx, decoded = ENTITIES[name]
        if got != (decoded, len(name)):
            shadowed.append(name)
    # exactly 40 `name;` entries extend an earlier legacy no-semi name and
    # can therefore never match (e.g. `parallel;` is shadowed by `para`,
    # `notin;` by `not`, `gtdot;` by `gt`)
    assert "notin;" in shadowed
    assert "gtdot;" in shadowed
    assert "parallel;" in shadowed
    assert len(shadowed) == 40, (len(shadowed), shadowed)
