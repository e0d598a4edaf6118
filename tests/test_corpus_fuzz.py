"""Differential fuzz for the corpus modules: random documents/embeddings.

``test_tpch_fuzz.py`` randomizes the eight warehouse tables but symlinks
``documents``/``embeddings`` from the fixture, so the dedup / ANN / text
analysis families (~70 oracle ops in ``llm.py`` / ``relevance.py`` /
``multimodal.py``) had fixed-fixture parity only (r16 verdict item 5).
This file closes that blind spot: each seed builds a random corpus whose
DEGENERATE shapes the fixture can never produce —

- documents: empty text, sub-shingle docs (1–2 words), a one-word-repeated
  doc (exactly one distinct shingle), exact-duplicate groups,
  near-duplicates (one word mutated), a missing language, skewed and
  singleton sources;
- embeddings: the all-zero vector (norm 0 — the cosine-denominator cousin
  of the r16 regression-stats DIVIDE_BY_ZERO), exact-duplicate and
  antipodal vectors, a tiny-norm (1e-20) and a huge-component (1e30)
  vector, a missing label class and a singleton class —

then pushes every enrolled oracle op through the driver's own comparator.
The eight warehouse tables symlink from sf0.001 so mixed readers (e.g.
``x_etl_dq_report``) enroll too.

Enrollment follows table reads TRANSITIVELY through same-module helpers
(``_shingle_rows`` → ``table(spark, sf_dir, "documents")``), unlike the
TPC-H broad batch's direct-read scan — the llm family reads almost
exclusively through helpers.  The count is pinned so a refactor that
breaks the resolver fails loudly instead of silently shrinking coverage
(r16 ADVICE).

Seeds are pinned for reproducibility.  Text is fixture-shaped (single-
space-separated lowercase vocabulary words) so cross-engine tokenizer
semantics stay in the regime the oracles were specified for; the fuzz
targets STRUCTURAL degenerates, not Unicode/whitespace lawyering.
"""

from __future__ import annotations

import inspect
import os
import random

import pytest

from dataengineer_scripts_spark import registry

from .conftest import make_duck
from .oracle_utils import assert_matches_oracle, transitive_tables
from .test_tpch_fuzz import _write

DEFS = registry.definitions()

_ALL_TABLES = {
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
}


# Enrollment resolver shared with the TPC-H warehouse fuzz — see
# tests/oracle_utils.py (moved there in r17 when the warehouse batch
# upgraded from direct-read scanning to the same transitive resolution).
_transitive_tables = transitive_tables


CORPUS_IDS = sorted(
    name
    for name, d in DEFS.items()
    if d.oracle is not None
    # effectful ops (sinks, JDBC, executor shims) are excluded for the
    # same reason as in the TPC-H broad batch: their subjects are side
    # effects with their own tests
    and not name.startswith(("snk_", "src_", "exec_"))
    # streaming ops' subject is the micro-batch runtime, pinned in
    # test_streaming.py
    and inspect.unwrap(d.fn).__module__.rsplit(".", 1)[-1]
    not in ("tpch", "windows")
    and (tabs := _transitive_tables(d.fn)) is not None
    and tabs & {"documents", "embeddings"}
    and tabs <= _ALL_TABLES
)

# Silent-shrinkage pin (mirrors BROAD_IDS): a legitimate registry change
# updates this consciously; a resolver regression fails loudly.  At 78 the
# enrollment covers EVERY oracle op of llm.py/relevance.py/multimodal.py
# (63+4+6, verified at pin time) plus the mixed/relational corpus readers.
assert len(CORPUS_IDS) == 78, (
    f"CORPUS_IDS enrollment changed: {len(CORPUS_IDS)} != 78 — if the "
    "registry legitimately grew/shrank, update the pin; if not, the "
    "transitive-read resolver just silently dropped ops from coverage"
)


_VOCAB = (
    "sort order column window agg part join scan group slow fast key hash "
    "merge batch stream spark table dup small index row shuffle plan cache "
    "skew limit filter count map"
).split()
#: Hostile-text alphabet: punctuation, digits, mixed case, unicode
#: (multibyte UTF-8), embedded tab — the cross-engine tokenizer/regex
#: surface the fixture's lowercase-ASCII vocabulary never exercises.
#: Caught on the maiden probe: x_mm_binary_decode's oracle summed
#: CHARACTER code points where the Spark side sums UTF-8 BYTES.
_HOSTILE_WORDS = [
    "Foo.", "bar,baz", "QUX", "a", "the", "x1y2", "42", "hello-world",
    "café", "naïve", "日本語", "tab\tchar", "semi;colon", "(paren)", "e.g.",
    "don't", "A/B", "100%", "über",
]
#: Whitespace-hostile whole documents (leading/trailing/double spaces,
#: bare whitespace) overwriting the first few docs in hostile mode.
_HOSTILE_TEXTS = [
    "  leading spaces",
    "trailing spaces  ",
    "double  space  gap",
    " ",
    "\t",
    "mix  of\tTabs and  DOUBLE  gaps",
]
_LANGS = ["en", "de", "es", "fr", "zh"]
EMBED_DIM = 64


def _build_corpus(rng: random.Random, sf: str, hostile: bool = False) -> None:
    # ---- documents -------------------------------------------------
    vocab = _VOCAB + _HOSTILE_WORDS if hostile else _VOCAB
    texts: list[str] = []
    n_base = rng.randint(40, 80)
    for _ in range(n_base):
        n_words = rng.choice(
            [0, 1, 2, rng.randint(3, 8), rng.randint(9, 40), rng.randint(41, 120)]
        )
        texts.append(" ".join(rng.choice(vocab) for _ in range(n_words)))
    if hostile:
        texts[: len(_HOSTILE_TEXTS)] = _HOSTILE_TEXTS
    # one-word-repeated doc: exactly ONE distinct shingle
    texts.append(" ".join([rng.choice(_VOCAB)] * rng.randint(5, 30)))
    # exact-duplicate groups (sizes 2–4)
    for _ in range(rng.randint(2, 4)):
        t = rng.choice(texts)
        texts.extend([t] * rng.randint(1, 3))
    # near-duplicates: one word mutated in a long-enough doc
    longish = [t for t in texts if len(t.split()) >= 8]
    for _ in range(rng.randint(2, 5)):
        w = rng.choice(longish).split()
        w[rng.randrange(len(w))] = rng.choice(_VOCAB)
        texts.append(" ".join(w))
    n_doc = len(texts)
    # a missing language on some seeds: empty-group branches in the
    # lang-keyed ops (confusion, sampling, fertility)
    langs = _LANGS if rng.random() < 0.5 else _LANGS[:-1]
    n_src = rng.randint(3, 12)  # skewed; singletons likely at 12
    _write(sf, "documents", {
        "doc_id": ("i64", list(range(n_doc))),
        "text": ("str", texts),
        "lang": ("str", [rng.choice(langs) for _ in range(n_doc)]),
        "source": ("str", [f"src{min(rng.randrange(n_src), rng.randrange(n_src))}"
                           for _ in range(n_doc)]),
        "n_chars": ("i64", [len(t) for t in texts]),
    })

    # ---- embeddings ------------------------------------------------
    import numpy as np

    n_lab = 10
    # a missing label class on some seeds; always at least one singleton
    labels_pool = list(range(n_lab if rng.random() < 0.5 else n_lab - 1))
    centers = {}
    for lab in range(n_lab):
        v = np.array([rng.gauss(0, 1) for _ in range(EMBED_DIM)], dtype=np.float64)
        centers[lab] = v / np.linalg.norm(v)
    vecs: list[np.ndarray] = []
    labs: list[int] = []
    for _ in range(rng.randint(50, 110)):
        lab = rng.choice(labels_pool)
        noise = np.array([rng.gauss(0, 0.15) for _ in range(EMBED_DIM)])
        v = centers[lab] + noise
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        labs.append(lab)
    base = len(vecs)
    # degenerates (labels reuse the pool so class stats stay coherent):
    # the all-zero vector — cosine/normalization denominator is 0
    vecs.append(np.zeros(EMBED_DIM, dtype=np.float32)); labs.append(rng.choice(labels_pool))
    # exact duplicate of a clustered vector (cosine exactly 1.0)
    i = rng.randrange(base)
    vecs.append(vecs[i].copy()); labs.append(labs[i])
    # antipodal vector (cosine exactly -1.0 with its source)
    j = rng.randrange(base)
    vecs.append((-vecs[j]).copy()); labs.append(rng.choice(labels_pool))
    # tiny-norm vector: norm² ~1e-40 — underflow probe (double math: fine)
    vecs.append((vecs[rng.randrange(base)] * np.float32(1e-20)).astype(np.float32))
    labs.append(rng.choice(labels_pool))
    # magnitude outlier: one component at 1e4 (vs unit-norm neighbors).
    # Deliberately NOT astronomically large: the quantize/outlier/PQ ops'
    # OUTPUT contract is int64 micro-fixed-point (scale_micro, dist_micro)
    # which both engines overflow identically somewhere past amax ~1e12 —
    # a loud, symmetric failure outside the documented contract, not an
    # engine divergence this fuzz could adjudicate.
    h = np.zeros(EMBED_DIM, dtype=np.float32); h[rng.randrange(EMBED_DIM)] = np.float32(1e4)
    vecs.append(h); labs.append(rng.choice(labels_pool))
    # singleton class: one vector with the otherwise-unused top label
    vecs.append(centers[n_lab - 1].astype(np.float32)); labs.append(n_lab - 1)

    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labs, type=pa.int32()),
    })
    pq.write_table(tbl, f"{sf}/embeddings.parquet")

    # the warehouse tables are irrelevant to the corpus families (and the
    # few mixed readers want REAL relational data) — symlink the fixture
    for name in sorted(_ALL_TABLES - {"documents", "embeddings"}):
        os.symlink(
            f"/root/testdata/sf0.001/{name}.parquet", f"{sf}/{name}.parquet"
        )


@pytest.mark.parametrize(
    "seed,hostile",
    [
        # 0xC0FFEE: the maiden-run finder seed — caught 13 divergences
        # (ANSI divide-by-zero on empty/sub-shingle docs, the zero-norm
        # vector, DuckDB's sum-over-empty NULL) — kept as the regression
        # pin for those fixes; 0x111 hostile: the byte-vs-codepoint finder
        # (x_mm_binary_decode).  0x5EED (independent structural coverage,
        # same generator/distribution as 0xC0FFEE) moved behind the
        # opt-in `soak` mark in r20: a 78-op full-parity pass costs
        # minutes and the driver's pytest budget truncated the suite at
        # 7% in r19 (VERIFY_r19 tests_ok false with zero failures) —
        # redundant seeds are the first thing to pay.
        (0xC0FFEE, False),
        pytest.param(0x5EED, False, marks=pytest.mark.soak),
        (0x111, True),
    ],
)
def test_corpus_suite_matches_oracle_on_random_corpus(
    spark, tmp_path, seed, hostile
):
    sf = str(tmp_path)
    _build_corpus(random.Random(seed), sf, hostile=hostile)
    con = make_duck(sf)
    try:
        nonempty = 0
        for name in CORPUS_IDS:
            df = DEFS[name].fn(spark, sf)
            assert_matches_oracle(df, con, DEFS[name].oracle, name)
            nonempty += bool(df.head(1))
        assert nonempty >= len(CORPUS_IDS) // 2, (
            f"seed {seed}: only {nonempty}/{len(CORPUS_IDS)} non-empty"
        )
    finally:
        con.close()


# ---------------------------------------------------------------------
# Adversarial whole-corpus shapes: entire tables collapsed to one extreme
# (every doc identical / empty; single-char-word vocabulary; one giant
# doc; every embedding zero / identical).  These exercised branches the
# per-row degenerates above cannot: a LANGUAGE with zero lexable tokens
# (fertility 0/0), a corpus-wide zero token total (source_mix share),
# a single-term vocabulary (zipf's bit-exactly-zero rank variance), and
# a corpus with NO length-2 token at all (the BPE merge step's empty
# top-pair collect).  Maiden probe caught 5 failures across 4 ops, all
# ANSI-throw-vs-DuckDB-NULL or driver IndexError — fixed with the same
# NULL-mirror conventions.
# ---------------------------------------------------------------------


def _adv_write_docs(sf, texts):
    n = len(texts)
    _write(sf, "documents", {
        "doc_id": ("i64", list(range(n))),
        "text": ("str", texts),
        "lang": ("str", ["en"] * n),
        "source": ("str", ["src0"] * n),
        "n_chars": ("i64", [len(t) for t in texts]),
    })


def _adv_identical(rng, sf):
    # 60 copies of one text of SINGLE-CHAR words: beyond total duplication,
    # no token reaches length 2, so the BPE pair universe is empty
    t = " ".join(rng.choice("a b c d e f g h".split()) for _ in range(50))
    _adv_write_docs(sf, [t] * 60)


def _adv_empty(rng, sf):
    _adv_write_docs(sf, [""] * 40)


def _adv_giant(rng, sf):
    # 2500 words: still ~180x the baseline docs (the skew/giant-doc
    # branches under test key on the RATIO, not the absolute size), but
    # the quadratic-tail ops (pair windows over one doc's shingles) cost
    # ~10x less than the original 8000 — this single shape was 270 s of
    # the r19 suite's 31 min, the largest line item in the driver's
    # truncated pytest budget (VERIFY_r19).
    _adv_write_docs(sf, ["small doc here"] * 10 + [
        " ".join(rng.choice("x y z w".split()) for _ in range(2500))
    ])


def _adv_allzero_emb(rng, sf):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "vec_id": pa.array(range(40), type=pa.int64()),
        "embedding": pa.array([[0.0] * EMBED_DIM] * 40,
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * 40, type=pa.int32()),
    }), f"{sf}/embeddings.parquet")
    del np


def _adv_identical_emb(rng, sf):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    v = np.random.RandomState(7).randn(EMBED_DIM).astype(np.float32)
    v /= np.linalg.norm(v)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(50), type=pa.int64()),
        "embedding": pa.array([v.tolist()] * 50, type=pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(50)], type=pa.int32()),
    }), f"{sf}/embeddings.parquet")


def _adv_nan_inf_emb(rng, sf):
    """30 clean unit vectors plus one NaN-component and one
    Inf-component vector: corrupt embeddings a 100 TB ingest WILL carry.
    Broke 11 of 15 similarity ops before the degenerate-norm convention
    (normalize/sanitize any vector whose norm is not a positive finite
    double to the ZERO vector, identically in both engines — NaN
    propagation otherwise differs between numpy GEMM, SQL sums, and
    NaN-is-greatest comparisons)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    vecs = []
    for _ in range(30):
        v = np.array([rng.gauss(0, 1) for _ in range(EMBED_DIM)],
                     dtype=np.float32)
        vecs.append(v / np.linalg.norm(v))
    bad = np.zeros(EMBED_DIM, np.float32)
    bad[3] = np.float32("nan")
    vecs.append(bad)
    bad2 = np.ones(EMBED_DIM, np.float32)
    bad2[7] = np.float32("inf")
    vecs.append(bad2)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([i % 5 for i in range(len(vecs))],
                          type=pa.int32()),
    }), f"{sf}/embeddings.parquet")


def _adv_null_element_emb(rng, sf):
    """30 clean unit vectors plus one embedding carrying a NULL element
    (r17 ADVICE): Spark's F.aggregate fold propagates the NULL into a
    NULL norm (→ zero-vector branch) while DuckDB's list_sum IGNORES
    NULLs (→ positive norm, normalized vector RETAINING the NULL).  The
    pinned convention: any-NULL embedding sanitizes to the ZERO vector
    in both engines — _SQL_NORMED and the nearest-class inline twin
    carry an explicit any-NULL test mirroring the Spark fold."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    vecs: list[list] = []
    for _ in range(30):
        v = np.array([rng.gauss(0, 1) for _ in range(EMBED_DIM)],
                     dtype=np.float32)
        vecs.append((v / np.linalg.norm(v)).tolist())
    bad = [1.0] * EMBED_DIM
    bad[5] = None  # a single NULL element poisons the whole vector
    vecs.append(bad)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": pa.array([i % 5 for i in range(len(vecs))],
                          type=pa.int32()),
    }), f"{sf}/embeddings.parquet")


#: Excluded from the NaN/Inf AND null-element cases ONLY: the
#: raw-embedding fixed-point ops (int64 micro-unit output encodings)
#: overflow/reject NaN·1e6 casts in BOTH engines — loud, symmetric,
#: outside the documented magnitude contract (same adjudication as the
#: 1e30 probe) — and their raw amax/centroid folds have no sanitization
#: seam to pin a NULL convention behind (Spark propagates, DuckDB
#: ignores, numpy sees NaN — three-way); a production pipeline
#: quarantines such rows upstream, as the similarity family now does
#: internally via the degenerate-norm sanitization (which the r18
#: NULL-element probe extended to any-NULL embeddings).
_NAN_OUT_OF_CONTRACT = {"x_llm_embed_quantize", "x_llm_embed_outlier",
                        "x_llm_embed_pq"}


#: Which fixture table each adversarial shape mutates.  Each shape run
#: now enrolls only the ops whose TRANSITIVE read set includes that
#: table (r20 suite-budget trim): an op that never reads the mutated
#: table sees the unmutated 0xA11 baseline — structurally the same
#: corpus the seeded parametrization above already pushes through full
#: parity — so re-running it per shape was 7x redundant baseline
#: coverage, not adversarial coverage.  Ops reading BOTH tables stay
#: enrolled in every shape.
_SHAPE_TABLE = {
    _adv_identical: "documents",
    _adv_empty: "documents",
    _adv_giant: "documents",
    _adv_allzero_emb: "embeddings",
    _adv_identical_emb: "embeddings",
    _adv_nan_inf_emb: "embeddings",
    _adv_null_element_emb: "embeddings",
}


@pytest.mark.parametrize(
    "shape",
    [_adv_identical, _adv_empty, _adv_giant, _adv_allzero_emb,
     _adv_identical_emb, _adv_nan_inf_emb, _adv_null_element_emb],
    ids=["identical_docs", "empty_docs", "giant_doc", "allzero_embeddings",
         "identical_embeddings", "nan_inf_embeddings",
         "null_element_embeddings"],
)
def test_corpus_suite_survives_adversarial_shape(spark, tmp_path, shape):
    sf = str(tmp_path)
    rng = random.Random(0xA11)
    _build_corpus(rng, sf)  # baseline; the shape overwrites its one table
    shape(rng, sf)
    skip = (
        _NAN_OUT_OF_CONTRACT
        if shape in (_adv_nan_inf_emb, _adv_null_element_emb)
        else set()
    )
    mutated = _SHAPE_TABLE[shape]
    enrolled = [
        name for name in CORPUS_IDS
        if mutated in (_transitive_tables(DEFS[name].fn) or set())
    ]
    # a resolver regression must shrink coverage loudly, not silently
    # (floors from the pin-time enrollment: 64 documents readers, 14
    # embeddings readers among the 78 CORPUS_IDS)
    assert len(enrolled) >= {"documents": 50, "embeddings": 12}[mutated], (
        mutated, len(enrolled)
    )
    con = make_duck(sf)
    try:
        for name in enrolled:
            if name in skip:
                continue
            df = DEFS[name].fn(spark, sf)
            assert_matches_oracle(df, con, DEFS[name].oracle, name)
    finally:
        con.close()


# Rows-only corpus readers (no oracle → excluded from CORPUS_IDS): the
# approximate ANN/sketch paths whose correctness gates live in
# test_ann_recall.py against the FIXTURE.  Here they get the degenerate
# inputs (zero-norm vector, empty docs) as a no-crash smoke — their
# numpy mapInPandas bodies are exactly where a NaN/empty-batch would
# detonate, and the oracle harness can never reach them.
ROWS_ONLY_CORPUS_IDS = sorted(
    n
    for n, d in DEFS.items()
    if d.oracle is None
    and not n.startswith(("snk_", "src_", "exec_"))
    and inspect.unwrap(d.fn).__module__.rsplit(".", 1)[-1]
    not in ("tpch", "windows")
    and (t := _transitive_tables(d.fn)) is not None
    and t & {"documents", "embeddings"}
    and t <= _ALL_TABLES
)


def test_rows_only_ann_ops_survive_null_element_embeddings(spark, tmp_path):
    """The numpy mapInPandas ANN bodies receive a NULL element as NaN
    (Arrow → pandas); they consume _normalized, whose r18 convention
    sanitizes any-NULL vectors to zero — so the index builds and the
    search still returns rows instead of detonating on NaN."""
    sf = str(tmp_path)
    _build_corpus(random.Random(0xC0FFEE), sf)
    _adv_null_element_emb(random.Random(1), sf)
    for name in ("x_llm_ann_ivf", "x_llm_ann_lsh", "x_llm_pq_adc_topk"):
        assert DEFS[name].fn(spark, sf).count() > 0, (
            f"{name}: empty on the NULL-element corpus"
        )


def test_rows_only_corpus_ops_survive_degenerate_corpus(spark, tmp_path):
    assert ROWS_ONLY_CORPUS_IDS == [
        "x_llm_ann_ivf",
        "x_llm_ann_lsh",
        "x_llm_dedup_simhash",
        "x_llm_pq_adc_topk",
    ]
    sf = str(tmp_path)
    _build_corpus(random.Random(0xC0FFEE), sf)
    for name in ROWS_ONLY_CORPUS_IDS:
        df = DEFS[name].fn(spark, sf)
        # force full execution; the ANN paths must still return rows
        # (the corpus minus one zero vector is still searchable)
        assert df.count() > 0, f"{name}: empty on the degenerate corpus"
