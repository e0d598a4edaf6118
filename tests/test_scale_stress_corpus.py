"""Invariants of the scale-stress corpus construction (tools/scale_stress.py).

The r11 scale-stress exponents in BASELINE.md are only meaningful if the
derived corpora size the data up WITHOUT changing its statistical shape:
within-replica duplicate/shingle structure preserved exactly, cross-replica
similarity destroyed, embedding norms/geometry preserved within a replica.
These tests pin those invariants at sf0.001 so a construction regression
cannot silently invalidate a future round's published exponents.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import load_scale_stress

scale_stress = load_scale_stress()


def test_document_replicas_preserve_dup_structure_and_stay_disjoint(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    x3 = scale_stress._replicate_documents(spark, sf_dir, 3)
    n = base.count()
    assert x3.count() == 3 * n
    # ids disjoint across replicas, each replica a full copy
    assert x3.select("doc_id").distinct().count() == 3 * n
    # near-dup group structure triples EXACTLY: key docs by their first
    # 10 WORDS (word-tagging is injective per word, so word-sequence
    # equality — unlike char offsets — survives the transform bit-for-bit)
    key = F.array_join(F.slice(F.split("text", " "), 1, 10), " ")

    def dup_groups(df):
        return (
            df.groupBy(key.alias("k")).count().filter(F.col("count") > 1).count()
        )

    base_groups = dup_groups(base)
    assert base_groups > 0  # fixture must exercise the invariant
    assert dup_groups(x3) == 3 * base_groups
    # exact-text dup groups replicate too (0 at this SF, 8 at sf0.1)
    def exact_groups(df):
        return df.groupBy("text").count().filter(F.col("count") > 1).count()

    assert exact_groups(x3) == 3 * exact_groups(base)
    # no text is shared between replicas (word-tagging destroys overlap)
    reps = x3.withColumn(
        "rep", (F.col("doc_id") / scale_stress.ID_STEP_DOC).cast("int")
    )
    cross = (
        reps.alias("a")
        .join(
            reps.alias("b"),
            (F.col("a.text") == F.col("b.text"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .count()
    )
    assert cross == 0
    # word/char statistics shift only by the bounded tag prefix: token
    # counts per doc are IDENTICAL to the base (tagging never merges or
    # splits words)
    def token_hist(df):
        return sorted(
            r[0]
            for r in df.select(
                F.size(F.filter(F.split("text", " "), lambda w: w != ""))
            ).collect()
        )

    assert token_hist(reps.filter(F.col("rep") == 2).drop("rep")) == token_hist(base)


def test_embedding_replicas_preserve_geometry_and_decorrelate(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x2 = scale_stress._replicate_embeddings(spark, sf_dir, 2)
    n = base.count()
    assert x2.count() == 2 * n
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    # norms preserved bit-for-bit-ish (float mult by +-1 is exact)
    base_norms = {
        r["vec_id"]: r["n"]
        for r in base.select("vec_id", norm.alias("n")).collect()
    }
    rep_norms = {
        r["vec_id"] - scale_stress.ID_STEP_DOC: r["n"]
        for r in x2.filter(F.col("vec_id") >= scale_stress.ID_STEP_DOC)
        .select("vec_id", norm.alias("n"))
        .collect()
    }
    assert rep_norms == pytest.approx(base_norms)
    # within-replica pairwise dot products preserved exactly: signs cancel
    import numpy as np

    b = base.orderBy("vec_id").limit(8).collect()
    r1 = (
        x2.filter(F.col("vec_id") >= scale_stress.ID_STEP_DOC)
        .orderBy("vec_id")
        .limit(8)
        .collect()
    )
    bmat = np.array([row["embedding"] for row in b])
    rmat = np.array([row["embedding"] for row in r1])
    assert np.allclose(bmat @ bmat.T, rmat @ rmat.T, atol=1e-5)
    # cross-replica similarity decorrelated: same-id pairs (identical
    # vectors pre-flip) must NOT stay near-identical after the flip
    bn = bmat / np.linalg.norm(bmat, axis=1, keepdims=True)
    rn = rmat / np.linalg.norm(rmat, axis=1, keepdims=True)
    same_id_cos = np.abs((bn * rn).sum(axis=1))
    assert same_id_cos.max() < 0.9  # a rotation-style failure leaves ~1.0


def test_corpus_marker_keyed_by_base(tmp_path, spark, monkeypatch):
    monkeypatch.setattr(scale_stress, "STRESS_DIR", str(tmp_path))
    d1 = scale_stress.build_corpus(spark, "/root/testdata/sf0.001", 1)
    # same base: cached (marker readback short-circuits)
    assert scale_stress.build_corpus(spark, "/root/testdata/sf0.001", 1) == d1
    link = os.readlink(os.path.join(d1, "documents.parquet"))
    assert link == "/root/testdata/sf0.001/documents.parquet"
    # different base: must rebuild, and symlinks must be absolute even
    # for a RELATIVE --base (the dangling-link regression)
    rel_base = os.path.relpath("/root/testdata/sf0.01", os.getcwd())
    d2 = scale_stress.build_corpus(spark, rel_base, 1)
    link2 = os.readlink(os.path.join(d2, "documents.parquet"))
    assert os.path.isabs(link2) and link2.endswith("sf0.01/documents.parquet")
    assert os.path.exists(os.path.join(d2, "documents.parquet"))


def test_document_replicas_leave_empty_tokens_untagged(tmp_path, spark):
    """Consecutive/leading spaces split to '' tokens; tagging those would
    mint new words 'r{r}_' that exist in no base doc, changing token
    counts and shingle structure vs the base (r11 advice item 2).  The
    shipped fixtures contain no empty split tokens (verified: zero docs
    match '%  %'/' %'/'% ' at sf0.001–sf0.1), so this pins the guard on
    a synthetic corpus where they DO occur."""
    base = str(tmp_path / "base")
    os.makedirs(base)
    spark.createDataFrame(
        [(1, "a  b", "en", "web", 4), (2, " lead trail ", "en", "web", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{base}/documents.parquet")
    x2 = scale_stress._replicate_documents(spark, base, 2)
    rep = {
        r["doc_id"] - scale_stress.ID_STEP_DOC: r["text"]
        for r in x2.filter(
            F.col("doc_id") >= scale_stress.ID_STEP_DOC
        ).collect()
    }
    # empty tokens stay empty (separators preserved), words get tagged
    assert rep[1] == "r1_a  r1_b"
    assert rep[2] == " r1_lead r1_trail "
    # token multiset sizes (non-empty) identical to base — the invariant
    # the published exponents rest on
    base_counts = [2, 2]
    assert [
        len([w for w in t.split(" ") if w]) for _, t in sorted(rep.items())
    ] == base_counts


def test_replica_tags_stay_disjoint_past_ten_replicas(tmp_path, spark):
    """The r15 ADVICE collision: an UNDELIMITED tag makes replica 1 of a
    digit-leading word equal replica 11+ of its suffix ('r1'+'1foo' ==
    'r11'+'foo'), silently merging cross-replica vocabulary at m>10 —
    exactly the regime the 30x spot-checks run in.  The delimited
    ``r{r}_`` tag keeps every (replica, word) globally unique; this pins
    it on a corpus built to collide under the old scheme."""
    base = str(tmp_path / "base")
    os.makedirs(base)
    spark.createDataFrame(
        [(1, "1foo foo", "en", "web", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{base}/documents.parquet")
    x12 = scale_stress._replicate_documents(spark, base, 12)
    words = x12.select(
        F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    # 12 replicas x 2 distinct words, no cross-replica merge (undelimited,
    # r1-tagged '1foo' and r11-tagged 'foo' both read 'r11foo': 23 not 24)
    assert words.count() == 24


def test_event_replicas_scale_user_population_linearly(spark, sf_dir, tmp_path):
    """events ×M must be M fresh user populations with IDENTICAL per-user
    history — session counts, CDC keys and latest-per-user states then
    scale exactly linearly, which is what the r12 stress exponents
    measure.  Offsetting only event_id would instead deepen each user's
    partition M× (a skew pathology, not a bigger corpus)."""
    from dataengineer_scripts_spark.tables import table

    base = table(spark, sf_dir, "events")
    x3 = scale_stress._replicate_events(spark, sf_dir, 3)
    n = base.count()
    assert x3.count() == 3 * n
    # ids disjoint: both key spaces triple
    assert x3.select("user_id").distinct().count() == 3 * base.select(
        "user_id"
    ).distinct().count()
    assert x3.select("event_id").distinct().count() == 3 * n
    # replica 2's per-user history is the base's, bit for bit: strip the
    # offsets and compare full rows (ts/type/value/props untouched)
    rep2 = x3.filter(
        F.col("user_id") >= 2 * scale_stress.ID_STEP_DOC
    ).withColumns(
        {
            "user_id": F.col("user_id") - 2 * scale_stress.ID_STEP_DOC,
            "event_id": F.col("event_id") - 2 * scale_stress.ID_STEP_FACT,
        }
    )
    assert sorted(map(tuple, rep2.collect())) == sorted(
        map(tuple, base.collect())
    )
    # downstream linearity on a real consumer: session count triples
    # (resolve via the registry — operator modules must load in registry
    # order, a direct module import would race oracle_of dependencies)
    from dataengineer_scripts_spark import registry

    x_win_sessionize = registry.queries()["x_win_sessionize"]

    # tmp_path, not the real STRESS_DIR: a failed cleanup or a concurrent
    # tools/scale_stress.py run must never contend on repo-tree state
    # (r12 advice item 2)
    base_dir = str(sf_dir)
    x3_dir = str(tmp_path / "_test_x3_events")
    x3.write.mode("overwrite").parquet(f"{x3_dir}/events.parquet")
    n_sessions_base = x_win_sessionize(spark, base_dir).count()
    n_sessions_x3 = x_win_sessionize(spark, x3_dir).count()
    assert n_sessions_x3 == 3 * n_sessions_base


def test_order_replicas_deepen_facts_per_dimension_key(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/orders.parquet")
    x2 = scale_stress._replicate_orders(spark, sf_dir, 2)
    n = base.count()
    assert x2.count() == 2 * n
    assert x2.select("o_orderkey").distinct().count() == 2 * n
    # dimension keys stay fixture-bounded: same custkey set, 2x depth
    assert sorted(
        r[0] for r in x2.select("o_custkey").distinct().collect()
    ) == sorted(r[0] for r in base.select("o_custkey").distinct().collect())


def test_customer_replicas_are_fresh_entities_with_bounded_dims(spark, sf_dir):
    """customer ×M (r15): M fresh entity populations — keys AND names
    globally unique across replicas (the customer-grain ops profile /
    checksum / dedupe on them), while c_nationkey stays fixture-bounded
    so per-nation groups deepen M× like a real registry against a
    static dimension."""
    base = spark.read.parquet(f"{sf_dir}/customer.parquet")
    x3 = scale_stress._replicate_customer(spark, sf_dir, 3)
    n = base.count()
    assert x3.count() == 3 * n
    assert x3.select("c_custkey").distinct().count() == 3 * n
    assert x3.select("c_name").distinct().count() == 3 * base.select(
        "c_name"
    ).distinct().count()
    # the nation dimension does NOT scale
    assert sorted(
        r[0] for r in x3.select("c_nationkey").distinct().collect()
    ) == sorted(r[0] for r in base.select("c_nationkey").distinct().collect())
    # replica 2 is the base bit-for-bit after stripping offset and tag
    rep2 = x3.filter(
        F.col("c_custkey") >= 2 * scale_stress.ID_STEP_DOC
    ).withColumns(
        {
            "c_custkey": F.col("c_custkey") - 2 * scale_stress.ID_STEP_DOC,
            # strip the delimited 'r2_' replica tag (3 chars)
            "c_name": F.expr("substring(c_name, 4)"),
        }
    )
    assert sorted(map(tuple, rep2.collect())) == sorted(
        map(tuple, base.collect())
    )


def test_part_replicas_keep_fuzzy_blocks_disjoint(spark, sf_dir):
    """part ×M (r15): the fuzzy-join blocking key (LAST p_name token) is
    tagged per replica, so replica blocks are DISJOINT — block count
    scales M×, the largest block stays fixture-sized, and the fuzzy
    candidate-pair count scales linearly instead of M² (the
    within-vs-across replica reasoning of the documents word-tagging,
    applied to the one part-grain op with a join on derived text)."""
    base = spark.read.parquet(f"{sf_dir}/part.parquet")
    x3 = scale_stress._replicate_part(spark, sf_dir, 3)
    n = base.count()
    assert x3.count() == 3 * n
    assert x3.select("p_partkey").distinct().count() == 3 * n

    blk = F.regexp_extract("p_name", r"(\S+)$", 1).alias("blk")
    base_blocks = base.select(blk).groupBy("blk").count()
    x3_blocks = x3.select(blk).groupBy("blk").count()
    assert x3_blocks.count() == 3 * base_blocks.count()
    # block depth bounded: the deepest block never grows with M
    assert (
        x3_blocks.agg(F.max("count")).first()[0]
        == base_blocks.agg(F.max("count")).first()[0]
    )
    # non-blocking attributes untouched: price distribution identical ×3
    assert (
        x3.groupBy("p_retailprice").count().filter(
            F.col("count") % 3 != 0
        ).count()
        == 0
    )
