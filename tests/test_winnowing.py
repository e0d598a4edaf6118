"""Independent validation of x_llm_winnowing_fingerprint: a brute-force
Python reference (same md5-prefix hash, same packing) checked against the
operator on fixture documents, plus the winnowing guarantee — any shared
substring of length >= k + w - 1 contributes a common fingerprint —
exercised on constructed collisions through the same reference."""

from __future__ import annotations

import hashlib
import random

from dataengineer_scripts_spark import registry
from dataengineer_scripts_spark.operators.llm import WINNOW_K, WINNOW_W


def _ref_fingerprints(text: str) -> set[int]:
    """Brute-force winnowing: packed (hash, pos) min per sliding window."""
    n = len(text)
    keys = []
    for i in range(1, n - WINNOW_K + 2):  # 1-based positions
        gram = text[i - 1 : i - 1 + WINNOW_K]
        h = int(hashlib.md5(gram.encode()).hexdigest()[:13], 16)
        keys.append(h * 2048 + i)
    selected = set()
    for end in range(WINNOW_W - 1, len(keys)):  # complete windows only
        selected.add(min(keys[end - WINNOW_W + 1 : end + 1]))
    return selected


def test_operator_matches_bruteforce_reference(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(5)
        .collect()
    }
    out = {
        r["doc_id"]: r
        for r in registry.definitions()["x_llm_winnowing_fingerprint"]
        .fn(spark, sf_dir)
        .collect()
        if r["doc_id"] in docs
    }
    for doc_id, text in docs.items():
        ref = _ref_fingerprints(text)
        row = out[doc_id]
        assert row["n_fingerprints"] == len(ref), doc_id
        assert int(row["fp_checksum"]) == sum(k // 2048 for k in ref), doc_id


def test_winnowing_guarantee_shared_substring_shares_fingerprint():
    # Schleimer et al. guarantee: a match of length >= k + w - 1 always
    # contributes at least one selected fingerprint HASH on both sides.
    rng = random.Random(42)
    alphabet = "abcdefgh "
    for _ in range(25):
        shared = "".join(rng.choice(alphabet) for _ in range(WINNOW_K + WINNOW_W - 1))
        a = "".join(rng.choice(alphabet) for _ in range(30)) + shared
        b = shared + "".join(rng.choice(alphabet) for _ in range(30))
        ha = {k // 2048 for k in _ref_fingerprints(a)}
        hb = {k // 2048 for k in _ref_fingerprints(b)}
        assert ha & hb, (a, b)
