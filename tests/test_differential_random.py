"""Randomized Spark-vs-DuckDB differential gate.

The driver's correctness gate runs on FIXED testdata; a query/oracle pair
can agree there by data coincidence (no ties, no short docs, no malformed
payloads).  This suite synthesizes a SEEDED random mini-sf directory with
edge cases the fixed tables lack — single-word documents, unicode words,
malformed/missing JSON payloads, heavily duplicated texts — and re-runs a
broad query subset through the same row-count/schema/value-hash compare
as tools/check_oracle.py.

Determinism guards: (user_id, ts) pairs are globally unique (gap/session/
as-of orderings would otherwise be tie-ambiguous between engines, which is
a GENUINE nondeterminism both engines are allowed to resolve differently);
document text words are HTML-inert (no '<', '&') so the html wrap
round-trips.
"""
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tools")
from check_oracle import frame_hash  # noqa: E402

from htmpark.queries import REGISTRY, resolve_sql  # noqa: E402

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
         "omega éü— data12 x9").split()

N_EVENTS = 2000
N_DOCS = 300
N_VECS = 200

# EVERY registry pair runs here — the suite enumerates the registry, so a
# new query cannot silently opt out of the randomized differential (r7
# verdict item 6).  Even pairs that consume the documents table only
# through its row count (corpus/web/mm synthesis) gain signal: the random
# table's 300 docs exercises the GREATEST(500, ...) page-count floor and
# every count-derived parameter off its fixed-gate values.
QUERIES = sorted(REGISTRY)


def test_suite_enumerates_registry():
    """Coverage invariant: the parametrization below IS the registry."""
    assert set(QUERIES) == set(REGISTRY)


@pytest.fixture(scope="module")
def rnd_sf(tmp_path_factory):
    # default seed is pinned (CI determinism); HTMPARK_RND_SEED lets a
    # soak sweep seeds — a query/oracle pair that agrees on one random
    # table by data coincidence gets re-challenged on others
    rng = random.Random(int(os.environ.get("HTMPARK_RND_SEED", "20260816")))
    d = str(tmp_path_factory.mktemp("rnd_sf"))
    con = duckdb.connect()

    # events: unique (user_id, ts); ~25% malformed/missing json payloads
    types = ["click", "view", "purchase", "signup", "error"]
    seen = set()
    rows = []
    for eid in range(N_EVENTS):
        while True:
            uid = rng.randrange(80)
            off = rng.randrange(40 * 24 * 3600 * 10) * 100_000  # µs grid
            if (uid, off) not in seen:
                seen.add((uid, off))
                break
        ty = types[rng.randrange(5)]
        val = round(rng.uniform(0, 100), 2)
        r = rng.random()
        if r < 0.10:
            props = "not json"
        elif r < 0.18:
            props = '{"other": 1}'
        elif r < 0.25:
            props = None
        else:
            props = '{"k": %d}' % rng.randrange(100)
        rows.append((eid, off, uid, ty, val, props))
    con.execute("CREATE TABLE ev (event_id BIGINT, off BIGINT, user_id BIGINT, "
                "event_type VARCHAR, value DOUBLE, props VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"""COPY (SELECT event_id,
        TIMESTAMP '2024-01-01' + to_microseconds(off) AS ts,
        user_id, event_type, value, props FROM ev ORDER BY event_id)
        TO '{d}/events.parquet' (FORMAT PARQUET)""")

    # documents: lengths 1..60 words incl. single-word docs; ~20% exact
    # duplicates of an earlier doc; langs cycle
    texts = []
    for i in range(N_DOCS):
        if i > 10 and random.Random(i).random() < 0.2:
            texts.append(texts[rng.randrange(len(texts))])
        else:
            n = rng.choice([1, 1, 2, 3] + list(range(5, 60)))
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(n)))
    con.execute("CREATE TABLE doc (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO doc VALUES (?,?,?,?,?)",
                    [(i, t, ["en", "de", "fr"][i % 3], f"src{i % 4}", len(t))
                     for i, t in enumerate(texts)])
    con.execute(f"COPY (SELECT * FROM doc ORDER BY doc_id) TO "
                f"'{d}/documents.parquet' (FORMAT PARQUET)")

    # embeddings: float32 arrays, dim 64
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO emb VALUES (?,?,?)",
                    [(i, [rng.uniform(-1, 1) for _ in range(64)], i % 5)
                     for i in range(N_VECS)])
    con.execute(f"COPY (SELECT * FROM emb ORDER BY vec_id) TO "
                f"'{d}/embeddings.parquet' (FORMAT PARQUET)")

    # TPC-H-shaped tables with referential integrity; duplicate order
    # dates / prices are deliberate (tiebreak determinism must carry them)
    con.execute("CREATE TABLE region(r_regionkey INT, r_name VARCHAR)")
    con.executemany("INSERT INTO region VALUES (?,?)",
                    [(i, f"R{i}") for i in range(5)])
    con.execute("CREATE TABLE nation(n_nationkey INT, n_name VARCHAR, "
                "n_regionkey INT)")
    con.executemany("INSERT INTO nation VALUES (?,?,?)",
                    [(i, f"N{i}", rng.randrange(5)) for i in range(25)])
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR, "
                "c_nationkey INT, c_acctbal DOUBLE, c_mktsegment VARCHAR)")
    segs = ["BUILDING", "MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD"]
    con.executemany("INSERT INTO customer VALUES (?,?,?,?,?)",
                    [(i, f"C{i}", rng.randrange(25),
                      round(rng.uniform(0, 9999), 2), rng.choice(segs))
                     for i in range(120)])
    con.execute("CREATE TABLE supplier(s_suppkey BIGINT, s_name VARCHAR, "
                "s_nationkey INT, s_acctbal DOUBLE)")
    con.executemany("INSERT INTO supplier VALUES (?,?,?,?)",
                    [(i, f"S{i}", rng.randrange(25),
                      round(rng.uniform(0, 9999), 2)) for i in range(30)])
    con.execute("CREATE TABLE part(p_partkey BIGINT, p_name VARCHAR, "
                "p_brand VARCHAR, p_type VARCHAR, p_size INT, "
                "p_retailprice DOUBLE)")
    con.executemany("INSERT INTO part VALUES (?,?,?,?,?,?)",
                    [(i, " ".join(rng.choice(VOCAB) for _ in range(3)),
                      f"B{rng.randrange(5)}", f"T{rng.randrange(6)}",
                      rng.randrange(1, 51),
                      round(rng.uniform(100, 2000), 2)) for i in range(150)])
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    con.execute("CREATE TABLE ord(o_orderkey BIGINT, o_custkey BIGINT, "
                "o_orderstatus VARCHAR, o_totalprice DOUBLE, odays BIGINT, "
                "o_orderpriority VARCHAR)")
    con.executemany(
        "INSERT INTO ord VALUES (?,?,?,?,?,?)",
        [(i, rng.randrange(120), rng.choice(["O", "F", "P"]),
          round(rng.uniform(100, 500000), 2),
          rng.randrange(0, 400) * 86_400_000_000
          + rng.randrange(0, 3) * 3_600_000_000,  # duplicate dates likely
          rng.choice(prios)) for i in range(600)])
    con.execute(f"""COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
        o_totalprice, TIMESTAMP '2023-01-01' + to_microseconds(odays)
        AS o_orderdate, o_orderpriority FROM ord ORDER BY o_orderkey)
        TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    con.execute("CREATE TABLE li(l_orderkey BIGINT, l_partkey BIGINT, "
                "l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, "
                "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
                "l_returnflag VARCHAR, l_linestatus VARCHAR, sdays BIGINT)")
    con.executemany(
        "INSERT INTO li VALUES (?,?,?,?,?,?,?,?,?,?,?)",
        [(rng.randrange(600), rng.randrange(150), rng.randrange(30),
          j % 7 + 1, float(rng.randrange(1, 51)),
          round(rng.uniform(100, 90000), 2),
          round(rng.uniform(0, 0.10), 2), round(rng.uniform(0, 0.08), 2),
          rng.choice(["A", "N", "R"]), rng.choice(["O", "F"]),
          rng.randrange(0, 430) * 86_400_000_000) for j in range(2500)])
    con.execute(f"""COPY (SELECT l_orderkey, l_partkey, l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus,
        TIMESTAMP '2023-01-01' + to_microseconds(sdays) AS l_shipdate
        FROM li) TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")
    for tbl in ("region", "nation", "customer", "supplier", "part"):
        con.execute(f"COPY (SELECT * FROM {tbl}) TO "
                    f"'{d}/{tbl}.parquet' (FORMAT PARQUET)")
    con.close()
    return d


@pytest.fixture(scope="module")
def rnd_duck(rnd_sf):
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "orders", "lineitem",
              "customer", "part", "supplier", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{rnd_sf}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_random_differential(spark, rnd_sf, rnd_duck, name):
    fn, sql = REGISTRY[name]
    sql = resolve_sql(sql, rnd_sf)
    stab = fn(spark, rnd_sf).toArrow()
    scols = stab.column_names
    srows = [tuple(r[c] for c in scols) for r in stab.to_pylist()]
    dtab = rnd_duck.execute(sql).arrow()
    dcols = dtab.column_names
    drows = [tuple(r[c] for c in dcols) for r in dtab.to_pylist()]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    assert frame_hash(scols, srows) == frame_hash(dcols, drows), name
