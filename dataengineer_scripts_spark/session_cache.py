"""Session-scoped materialization cache shared across operator modules.

Several registered queries recompute identical frames (the corpus shingle
build, the near-dup pair list, the PageRank affinity graph).  In one
bench/driver session the dedup family used to run the shingle self-join
three times over; sharing the ``localCheckpoint``-ed frame makes each
build once-per-session.  Keyed by (applicationId, sf_dir, frame) so a
restarted SparkContext or a different fixture rebuilds; checkpointed
frames are deterministic, so cached-vs-fresh results are bit-identical
(the pytest sweep exercises both orders).

Hoisted out of ``operators/llm.py`` in round 10 when ``operators/bi.py``
grew the same need (the PageRank graph build shared by both variants) —
ONE mechanism, not two parallel dicts with the same key discipline.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_SESSION_FRAMES: dict[tuple[str, str, str], DataFrame] = {}


def session_shared(
    spark: SparkSession,
    sf_dir: str,
    key: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    k = (app_id, os.path.abspath(sf_dir), key)
    df = _SESSION_FRAMES.get(k)
    if df is None:
        # evict frames bound to stopped contexts (same discipline as
        # tables._TABLE_MEMO — r19 ADVICE: a process that cycles
        # SparkSessions must not retain dead-JVM DataFrames forever)
        for stale in [sk for sk in _SESSION_FRAMES if sk[0] != app_id]:
            _SESSION_FRAMES.pop(stale, None)
        df = build().localCheckpoint(eager=False)
        _SESSION_FRAMES[k] = df
    return df
