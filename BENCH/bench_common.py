"""Shared steady-state session warmup for bench.py and the isolated
re-measure harness.

The mover-settlement rule's validity rests on "same session shape +
warmups as bench.py"; keeping the warmup sequence in ONE place makes
that comparability structural instead of a copy that can drift (it
drifted once: the first remeasure_query.py omitted the head-of-line
warmup, inflating rep 0 by the documented 0.3-0.7s session residual).

Each block is untimed and mirrors what a long-running production job
amortizes away: python-worker spawn + parse codegen, table footers /
page cache, shuffle + window machinery, and the residual that
otherwise lands on whichever query a run happens to execute first.
"""
from __future__ import annotations

# the dedup family consumers share one persisted candidate-pair /
# label materialization per session; warm-running one would build the
# memo here and zero out bench.py's dedicated memo attribution lines
MEMO_CONSUMERS = {"dedup_minhash_pairs", "dedup_clusters",
                  "graph_pagerank", "curation_pipeline"}


def noop_materialize(df):
    """Materialize every column of a plan without collecting to the
    driver — the measurement sink for all bench surfaces."""
    df.write.format("noop").mode("overwrite").save()


def warm_session(spark, sf_dir, *, registry_head=2, exclude=()):
    """Run bench.py's full untimed warmup sequence on ``spark``.

    ``registry_head`` warm-runs the first N registry entries (skipping
    MEMO_CONSUMERS and ``exclude``) so the ~0.3-0.7s first-query
    session residual (codegen compiles, broadcast-exchange thread
    init, python worker pool growth — measured in round 4) does not
    land on the first measured query.  Pass the queries about to be
    MEASURED via ``exclude`` so a head entry that is itself under
    measurement is not pre-warmed into an unrepresentative plan-warm
    reading."""
    from htmpark.corpus import synthesize_pages
    from htmpark.job import extract_pages
    from htmpark.queries import REGISTRY

    # python workers + parse codegen
    noop_materialize(extract_pages(synthesize_pages(spark, 256,
                                                    body_repeat=12)))
    # input-table file index / footers / page cache, so first-touch
    # cost doesn't land on whichever query reads a table first
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents",
                "embeddings"):
        try:
            noop_materialize(spark.read.parquet(f"{sf_dir}/{tbl}.parquet"))
        except Exception:
            pass
    # shuffle / explode / window machinery (codegen + exchange init)
    noop_materialize(spark.range(0, 100_000)
                     .selectExpr("id", "explode(sequence(0, 3)) AS x")
                     .repartition(8, "x")
                     .selectExpr("id", "x",
                                 "row_number() OVER (PARTITION BY x "
                                 "ORDER BY id) AS rn")
                     .groupBy("x").count())
    # head-of-line residual leveller
    skip = MEMO_CONSUMERS | set(exclude)
    for name in list(REGISTRY)[:registry_head]:
        if name not in skip:
            noop_materialize(REGISTRY[name][0](spark, sf_dir))
