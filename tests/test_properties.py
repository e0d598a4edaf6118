"""Property-based tests (hypothesis) for the semantics most likely to hide
edge-case divergence: Python-faithful NOT-IN-with-NULL, the rolling-hash
fingerprint, and as-of join — each checked against a direct Python reference
implementation on randomized inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

TYPES = st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d"]))


@given(vals=st.lists(TYPES, min_size=1, max_size=30))
@SET
def test_python_faithful_not_in_whitelist(spark, vals):
    """The reference's `x not in ["a", None, "b"]` is 2-valued: NULL is an
    ordinary whitelisted member.  The engine convention
    `~(col.isin(...) | col.isNull())` must agree with Python exactly
    (SQL 3-valued NOT IN would drop every row when NULL is present)."""
    whitelist = ["a", None, "b"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v string"
    )
    got = {
        r.i
        for r in df.filter(
            ~(F.col("v").isin("a", "b") | F.col("v").isNull())
        ).collect()
    }
    want = {i for i, v in enumerate(vals) if v not in whitelist}
    assert got == want


@given(text=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                    min_size=1, max_size=80))
@SET
def test_rolling_fingerprint_matches_python(spark, text):
    """fp = fold(h*31 + codepoint mod 1e9+7) must equal the direct Python
    fold for arbitrary printable-ASCII strings."""
    from dataengineer_scripts_spark.operators.llm import FP_BASE, FP_MOD

    df = spark.createDataFrame([(text,)], "text string")
    fp_expr = F.aggregate(
        F.transform(F.split("text", ""), F.ascii),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
    )
    got = df.select(fp_expr.alias("fp")).collect()[0].fp
    want = 0
    for ch in text:
        want = (want * FP_BASE + ord(ch)) % FP_MOD
    assert got == want


EVENTS = st.lists(
    st.tuples(st.integers(0, 50), st.sampled_from(["purchase", "error", "view"])),
    min_size=1,
    max_size=25,
)


@given(events=EVENTS)
@SET
def test_asof_running_max_matches_reference(spark, events):
    """The merged-stream running-max as-of join must equal the quadratic
    reference (max purchase ts at-or-before each error) on arbitrary
    event sequences, including ties."""
    rows = [(i, 1, ts, ty) for i, (ts, ty) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, tsec int, event_type string"
    ).withColumn("ts", F.timestamp_seconds("tsec"))
    is_p = F.col("event_type") == "purchase"
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.when(is_p, 0).otherwise(1), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r.event_id: r.lp
        for r in df.withColumn("lp", F.max(F.when(is_p, F.col("tsec"))).over(w))
        .filter(F.col("event_type") == "error")
        .collect()
    }
    want = {
        i: max(
            (ts2 for ts2, ty2 in events if ty2 == "purchase" and ts2 <= ts),
            default=None,
        )
        for i, (ts, ty) in enumerate(events)
        if ty == "error"
    }
    assert got == want
