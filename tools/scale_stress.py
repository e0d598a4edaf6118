#!/usr/bin/env python
"""Empirical scale-stress of the 100 TB structural claims (r10 verdict #3).

The plan guards prove the SHAPE of the heavy operators (blocked pair
joins, two-level ranks, bounded-model collects); this measures the
CONSTANT FACTORS: synthesize derived corpora at 1x/3x/10x the sf0.1
fixtures inside the repo (never touching read-only /root/testdata), run
the dedup/ANN/text/window families at each scale, and fit the wall-clock
scaling exponent per op (least-squares slope of log wall vs log scale).

Corpus construction — sized up WITHOUT changing the data's statistical
shape, so exponents measure the engine, not a pathology:

- ``documents`` ×M: replica r offsets doc_id by r·10^7 and prefixes every
  word with ``r{r}_`` — within-replica duplicate/shingle structure is
  preserved exactly, cross-replica shingle similarity is destroyed, so
  near-dup pair counts scale LINEARLY like a real 10x crawl (a naive
  verbatim union would square every duplicate cluster instead).
- ``embeddings`` ×M: replica r offsets vec_id by r·10^7 and multiplies
  the vector elementwise by a deterministic Rademacher ±1 pattern (seeded
  per replica) — signs cancel within a replica, so norms and
  within-replica cosine are preserved EXACTLY, while cross-replica cosine
  is a random-sign sum with E=0 and sd≈1/√d.  (A dimension ROTATION was
  tried first and failed: the synthetic embeddings are cluster-structured
  with smooth dimensions, so rotated replicas stayed similar and the
  near-dup pair count went quadratic — 4137→424094 pairs at 10x — which
  measures the corpus pathology, not the engine.)
- ``lineitem`` ×M: replica r offsets l_orderkey by r·10^9 (fact keys grow
  with the data; dimension keys stay fixture-bounded, like production).
- ``events`` ×M (r12): replica r offsets user_id by r·10^7 and event_id
  by r·10^9 — a fresh user population with identical per-user history,
  so sessions/CDC keys/user-day facts scale exactly linearly.
- ``orders`` ×M (r12): replica r offsets o_orderkey by r·10^9 (matches
  the lineitem offset); o_custkey stays fixture-bounded, so
  facts-per-dimension-key deepen M× like a real warehouse.

- ``customer``/``part`` ×M (r15): fresh entity populations (key offset +
  name tag; part tags the fuzzy-join BLOCKING token so candidate pairs
  stay linear) — these are the FACT input of the customer-/part-grain
  ops (profile, checksum, mask-pii, merge-upsert, distribution,
  grouped-agg, unpivot, range/fuzzy join, csv/orc round-trips).

All other tables (region, nation, supplier) are symlinked at 1x — true
dimensions that don't scale with fact data.  Usage::

    python tools/scale_stress.py                  # 1,3,10 x sf0.1
    python tools/scale_stress.py --multipliers 1,10 --ops x_llm_dedup_minhash

Writes ``scale_stress_r12.json`` next to the repo root and prints one
summary line per op.  The r13 batches ran with explicit ``--ops``
(iterative-graph/pair-gen → ``scale_stress_r13_graph[_x30].json``;
multimodal/embedding → ``scale_stress_r13_mm_embed.json``); the r14
batches cover the fact-table warehouse families
(``scale_stress_r14_warehouse.json``: agg/join/window/topk/pandas-UDF
over lineitem/orders/events) and the event-time + per-document text
families (``scale_stress_r14_ts_text.json``), plus the TPC-H/set/subquery
residue (``scale_stress_r14_tpch_setsub.json``) and the LLM-doc/ETL/stream
residue (``scale_stress_r14_llm_etl.json``); the r15 batch
(``scale_stress_r15_residue.json``) covers the customer-/part-grain and
flagship residue over the v3 corpus, closing measurable coverage at 222
of 274; the r16 batch (``scale_stress_r16_partsupp[_x30].json``) adds
the five derived-partsupp TPC-H queries, keeping coverage closed at 227
of 279 — the remaining 52 ids are fixed-grain by construction (REST
stub / nation / region inputs).  All stress-measured ops and their
output files are indexed in BASELINE.md's round addenda.

Ops are timed bench-style (df.count(), housekeeping
between ops, one session).  With the default ``--samples 2`` the MIN of
two runs is recorded, so every wall is the op's marginal steady-state
cost over warm session-shared frames — the shingle/pair build cost is
excluded uniformly at every scale (only ``--samples 1`` charges it to
the first shingle-family op, bench.py-style).
"""

from __future__ import annotations

import argparse
import gc
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dataengineer_scripts_spark import registry  # noqa: E402
from dataengineer_scripts_spark.session import get_spark  # noqa: E402
from dataengineer_scripts_spark.tables import TABLE_NAMES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STRESS_DIR = os.path.join(REPO, ".scale_stress")

#: Measured families, in bench order (shingle users after dedup_exact so
#: the shared-frame build lands on the first shingle op, like bench.py).
DEFAULT_OPS = [
    "x_llm_dedup_exact",
    "x_llm_dedup_minhash",
    "x_llm_dedup_ngram_jaccard",
    "x_llm_dedup_containment",
    "x_llm_dup_spans",
    "x_llm_winnowing_fingerprint",
    "x_llm_zipf_fit",
    "x_llm_ngram_lm_counts",
    "x_llm_ann_ivf",
    "x_llm_ann_lsh",
    "x_llm_semdedup",
    "x_llm_dedup_embed",
    "x_llm_knn_batch_blocked",  # all-pairs by SPEC: expect exponent ~2
    "x_etl_zorder_stats_sharded",
    # r12 extension (r11 verdict #3): the streaming/stateful and
    # heavy-relational ops whose 100 TB posture previously rested on plan
    # shape alone.  All are events/orders-driven; output rows scale
    # exactly linearly except rolling_distinct and audience_overlap,
    # whose outputs are day-/type-grain CONSTANT while the work scales.
    "x_win_sessionize",
    "x_agg_rolling_distinct",
    "x_agg_audience_overlap",
    "x_etl_cdc_compact",
    "x_join_scd2_pointintime",
    "x_stream_upsert_materialize",
]

ID_STEP_DOC = 10_000_000
ID_STEP_FACT = 1_000_000_000


def _replicate_documents(spark: SparkSession, base: str, m: int):
    src = spark.read.parquet(f"{base}/documents.parquet")
    parts = []
    for r in range(m):
        if r == 0:
            parts.append(src)
            continue
        # tag only NON-EMPTY tokens (r11 advice item 2): consecutive or
        # leading spaces split to '' tokens, and prefixing those would
        # mint new words 'r{r}_' that exist in no base doc — changing
        # token counts and shingle structure vs the base corpus.  The
        # tag is DELIMITED (r15 ADVICE item 3): an undelimited 'r{r}'
        # prefix collides across replicas at m>10 whenever a base word
        # begins with a digit ('r1'+'1foo' == 'r11'+'foo'); '_' keeps
        # the tagged word a single \w+ token for regex tokenizers
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.when(
                    w != "", F.concat(F.lit(f"r{r}_"), w)
                ).otherwise(w),
            ),
            " ",
        )
        parts.append(
            src.select(
                (F.col("doc_id") + r * ID_STEP_DOC).alias("doc_id"),
                tagged.alias("text"),
                "lang",
                "source",
                F.length(tagged).cast("long").alias("n_chars"),
            )
        )
    return _union_replicas(parts[0], parts[1:])


def _replicate_embeddings(spark: SparkSession, base: str, m: int):
    import random

    src = spark.read.parquet(f"{base}/embeddings.parquet")
    dim = len(src.select("embedding").head()[0])
    parts = []
    for r in range(m):
        if r == 0:
            parts.append(src)
            continue
        rng = random.Random(0xE5C4 + r)
        signs = ",".join(
            f"{rng.choice((1.0, -1.0))}D" for _ in range(dim)
        )
        flipped = F.expr(
            f"zip_with(embedding, array({signs}), "
            "(x, s) -> cast(x * s as float))"
        )
        parts.append(
            src.select(
                (F.col("vec_id") + r * ID_STEP_DOC).alias("vec_id"),
                flipped.alias("embedding"),
                "label",
            )
        )
    return _union_replicas(parts[0], parts[1:])


def _union_replicas(src, replicas):
    """Fold src ∪ replicas by name — the union shared by every
    replicator."""
    out = src
    for p in replicas:
        out = out.unionByName(p)
    return out


def _offset_fact_keys(src, m: int, offsets: dict[str, int]):
    """Fact-table ×M: replica r adds r·step to each named key column —
    fresh key populations with identical per-key content, dimensions
    untouched.  Shared by the lineitem/orders/events replicators."""
    return _union_replicas(
        src,
        [
            src.withColumns(
                {k: F.col(k) + r * step for k, step in offsets.items()}
            )
            for r in range(1, m)
        ],
    )


def _replicate_lineitem(spark: SparkSession, base: str, m: int):
    src = spark.read.parquet(f"{base}/lineitem.parquet")
    return _offset_fact_keys(src, m, {"l_orderkey": ID_STEP_FACT})


def _replicate_events(spark: SparkSession, base: str, m: int):
    """events ×M: replica r offsets user_id by r·10^7 and event_id by
    r·10^9 — each replica is a fresh user population with the SAME
    per-user event history, so session counts, CDC keys, distinct
    (user, day) facts and latest-per-user states all scale EXACTLY
    linearly (offsetting only event_id would instead deepen every
    per-user partition M× — a skew pathology, not a bigger corpus).
    Timestamps/types/values are untouched, so the day grain and the
    type universe stay fixture-bounded like production.  Read through
    ``tables.table`` (the fixture's ns-timestamp gotcha); the written
    replica carries plain µs timestamps, which the loader passes
    through unchanged."""
    from dataengineer_scripts_spark.tables import table

    return _offset_fact_keys(
        table(spark, base, "events"),
        m,
        {"event_id": ID_STEP_FACT, "user_id": ID_STEP_DOC},
    )


def _replicate_orders(spark: SparkSession, base: str, m: int):
    """orders ×M: replica r offsets o_orderkey by r·10^9 (consistent with
    the lineitem replica, so order↔lineitem joins stay intact across
    replicas).  o_custkey is NOT offset — dimensions stay fixture-bounded,
    so facts-per-dimension-key grow M× exactly as a real warehouse grows
    against a slowly-changing dimension (the shape the SCD2 point-in-time
    window must absorb)."""
    src = spark.read.parquet(f"{base}/orders.parquet")
    return _offset_fact_keys(src, m, {"o_orderkey": ID_STEP_FACT})


def _replicate_customer(spark: SparkSession, base: str, m: int):
    """customer ×M (r15): replica r offsets c_custkey by r·10^7 and tags
    c_name with an ``r{r}_`` prefix (fresh, globally-unique entities —
    the "bigger entity table" model for the customer-grain ops: profile,
    checksum, mask-pii, merge-upsert, distribution, grouped-agg, csv/orc
    round-trips).  c_nationkey is untouched, so nation stays a bounded
    dimension and per-nation groups deepen M× like a real registry.
    The tag is delimited (r15 ADVICE item 3): undelimited, replica 1 of
    a digit-leading base name collides with replica 11+ at m>10."""
    src = spark.read.parquet(f"{base}/customer.parquet")
    return _union_replicas(
        src,
        [
            src.withColumns(
                {
                    "c_custkey": F.col("c_custkey") + r * ID_STEP_DOC,
                    "c_name": F.concat(F.lit(f"r{r}_"), F.col("c_name")),
                }
            )
            for r in range(1, m)
        ],
    )


def _replicate_part(spark: SparkSession, base: str, m: int):
    """part ×M (r15): replica r offsets p_partkey by r·10^7 and tags the
    LAST token of p_name with an ``r{r}_`` prefix.  The last token is the
    fuzzy-join BLOCKING key (x_join_fuzzy_name blocks on it), so tagging
    it makes replica blocks DISJOINT: block count scales M×, block sizes
    stay fixture-bounded, candidate pairs scale linearly — a bigger
    catalog, not an M²-deep-block pathology (the same within-vs-across
    replica reasoning as the documents word-tagging above).  The tag is
    delimited (r15 ADVICE item 3): undelimited, disjointness at m>10
    silently relied on base tokens never beginning with a digit."""
    src = spark.read.parquet(f"{base}/part.parquet")
    return _union_replicas(
        src,
        [
            src.withColumns(
                {
                    "p_partkey": F.col("p_partkey") + r * ID_STEP_DOC,
                    "p_name": F.regexp_replace(
                        F.col("p_name"), r"(\S+)$", f"r{r}_$1"
                    ),
                }
            )
            for r in range(1, m)
        ],
    )


SCALED = {
    "documents": _replicate_documents,
    "embeddings": _replicate_embeddings,
    "lineitem": _replicate_lineitem,
    "events": _replicate_events,
    "orders": _replicate_orders,
    "customer": _replicate_customer,
    "part": _replicate_part,
}


def build_corpus(spark: SparkSession, base: str, m: int, force: bool = False) -> str:
    """Materialize the xM derived fixture dir; idempotent per multiplier."""
    dest = os.path.join(STRESS_DIR, f"x{m}")
    # marker carries the BASE the corpus derives from AND the construction
    # version: a later run with a different --base, or against a corpus
    # built by an older construction (r11 left events/orders symlinked and
    # tagged empty doc tokens; v2 left customer/part symlinked; v3 used
    # the undelimited 'r{r}' replica tag that collides at m>10 on
    # digit-leading tokens), must rebuild, not silently reuse
    marker = os.path.join(dest, ".complete")
    base_abs = os.path.abspath(base)
    stamp = f"{base_abs}#v4"
    if not force:
        try:
            if open(marker).read() == stamp:
                return dest
        except OSError:
            pass
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    for name in TABLE_NAMES:
        tgt = os.path.join(dest, f"{name}.parquet")
        if name in SCALED and m > 1:
            SCALED[name](spark, base, m).write.mode("overwrite").parquet(tgt)
        else:
            # absolute target: a relative --base would make the link
            # resolve relative to the corpus dir, not the invocation cwd
            os.symlink(os.path.join(base_abs, f"{name}.parquet"), tgt)
    open(marker, "w").write(stamp)
    return dest


def _fit_exponent(points: dict[int, float]) -> float | None:
    """Least-squares slope of log(wall) on log(multiplier)."""
    pts = [(math.log(m), math.log(w)) for m, w in points.items() if w > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    denom = n * sxx - sx * sx
    return round((n * sxy - sx * sy) / denom, 3) if denom else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--multipliers", default="1,3,10")
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    ap.add_argument("--out", default=os.path.join(REPO, "scale_stress_r12.json"))
    ap.add_argument("--force-rebuild", action="store_true")
    # min-of-2 damps the shared-JVM moving-victim stalls (BASELINE.md's
    # noise methodology); sample 2 runs with warm session-shared frames,
    # so the min approximates the op's marginal steady-state cost at
    # every scale uniformly.
    ap.add_argument("--samples", type=int, default=2)
    args = ap.parse_args()
    mults = [int(x) for x in args.multipliers.split(",")]
    ops = [x for x in args.ops.split(",") if x]

    spark = get_spark("scale-stress")
    qs = registry.queries()
    dirs = {m: build_corpus(spark, args.base, m, args.force_rebuild) for m in mults}
    for m, d in dirs.items():
        print(f"# corpus x{m}: {d}", file=sys.stderr)

    wall: dict[str, dict[int, float]] = {op: {} for op in ops}
    rows: dict[str, dict[int, int]] = {op: {} for op in ops}
    for m in mults:
        for i, op in enumerate(ops):
            best, n = None, 0
            for _ in range(max(1, args.samples)):
                t0 = time.perf_counter()
                n = qs[op](spark, dirs[m]).count()
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
            wall[op][m] = round(best, 3)
            rows[op][m] = n
            print(f"# x{m} {op}: {wall[op][m]:.2f}s ({n} rows)", file=sys.stderr)
            if (i + 1) % 4 == 0:
                gc.collect()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
        # Scale boundary: the session cache pins this scale's
        # localCheckpointed frames through live DataFrame refs — while
        # the dict references them, gc.collect cannot drop the py4j refs
        # and the ContextCleaner cannot release the checkpoint blocks.
        # Evicting the entries and THEN collecting (bench.py's proven
        # Python-gc-first mechanism) lets the cleaner reclaim them before
        # the next scale allocates.
        from dataengineer_scripts_spark import session_cache

        done_dir = os.path.abspath(dirs[m])
        for k in [k for k in session_cache._SESSION_FRAMES if k[1] == done_dir]:
            del session_cache._SESSION_FRAMES[k]
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    report = {
        "base": args.base,
        "multipliers": mults,
        "ops": {
            op: {
                "wall_sec": {str(m): wall[op][m] for m in mults},
                "rows": {str(m): rows[op][m] for m in mults},
                "exponent": _fit_exponent(wall[op]),
            }
            for op in ops
        },
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    for op in ops:
        e = report["ops"][op]["exponent"]
        ws = " ".join(f"x{m}={wall[op][m]:.2f}s" for m in mults)
        print(f"{op}: exponent={e} ({ws})")
    spark.stop()


if __name__ == "__main__":
    main()
