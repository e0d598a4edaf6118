"""ANN quality gates: both approximate paths (IVF cells, LSH bands) must
return full top-k shape and achieve meaningful recall against the exact
scan.  The fixture embeddings are near-orthogonal random vectors — the
hardest case for locality pruning — so the floors are deliberately modest;
on real clustered embeddings both paths recall far higher."""

from __future__ import annotations

import pytest

from dataengineer_scripts_spark import registry

DEFS = registry.definitions()


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


@pytest.mark.parametrize(
    "name,floor",
    [("x_llm_ann_ivf", 0.5), ("x_llm_ann_lsh", 0.25),
     # ADC over a 16-entry codebook on worst-case random vectors: rank
     # shifts from quantization error dominate; measured 0.18-0.28
     # across sf0.001-0.1
     ("x_llm_pq_adc_topk", 0.1)]
)
def test_ann_recall_vs_exact(spark, sf_dir, name, floor):
    exact = _pairs(DEFS["x_llm_knn_cosine"].fn(spark, sf_dir))
    approx_df = DEFS[name].fn(spark, sf_dir)
    approx = _pairs(approx_df)
    assert len(approx) == len(exact)  # full top-k shape: 10 queries × 5
    recall = len(exact & approx) / len(exact)
    assert recall >= floor, f"{name} recall {recall:.2f} < {floor}"
    # every reported rank group is a valid 1..k ranking
    ranks = [(r.query_id, r.rank) for r in approx_df.collect()]
    by_q = {}
    for q, rk in ranks:
        by_q.setdefault(q, []).append(rk)
    assert all(sorted(v) == list(range(1, 6)) for v in by_q.values())
