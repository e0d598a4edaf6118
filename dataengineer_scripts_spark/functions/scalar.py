"""Scalar function layer (SURVEY.md §2.7) — every scalar op the reference
performs, re-expressed as built-in Column expressions (JVM-side,
whole-stage-codegen; no Python in the hot path).

Each operator registers a `(spark, sf_dir) -> DataFrame` query phrased over
the driver fixtures plus a DuckDB oracle.  Reference citations are to
LordLaffeys/DataEngineer_Scripts (read-only at /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# ---------------------------------------------------------------------------
# JSON (fn_json_parse / fn_json_serialize — sync.py:46, app.py:100; sync.py:17-20)
# ---------------------------------------------------------------------------


@register(
    "fn_json_parse",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def fn_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse JSON text to typed values (`response.json()`, sync.py:46;
    `json.loads(...)` app.py:100,132) → `get_json_object` on the JVM."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


@register(
    "fn_json_serialize",
    oracle="""
    SELECT event_id,
           '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}'
             AS payload
    FROM events
    """,
)
def fn_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize records to JSON text (`json.dumps(payload)` sync.py:63,
    app.py:78) → `to_json(struct(...))`."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("payload"),
    )


# ---------------------------------------------------------------------------
# Timestamps (fn_ts_parse_fmt / fn_ts_format — app.py:49,174; :57,191,215)
# ---------------------------------------------------------------------------

_REF_FMT_SPARK = "EEE, dd MMM yyyy, HH:mm:ss 'GMT+0000'"
_REF_FMT_DUCK = "%a, %d %b %Y, %H:%M:%S GMT+0000"


@register(
    "fn_ts_parse_fmt",
    oracle=f"""
    SELECT event_id,
           strftime(ts::TIMESTAMP, '{_REF_FMT_DUCK}') AS ts_str,
           strptime(strftime(ts::TIMESTAMP, '{_REF_FMT_DUCK}'),
                    '{_REF_FMT_DUCK}') AS ts_rt
    FROM events
    """,
)
def fn_ts_parse_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the reference's `'%a, %d %b %Y, %H:%M:%S GMT+0000'` format
    (app.py:49,174) — literal `GMT+0000` token quoted in the Java pattern
    (SURVEY.md §7.4.3).  Sub-second precision is lost by design (the
    reference's format has none).

    Spark's CORRECTED-policy parser refuses day-of-week (`EEE`) fields on
    the *parse* side, so the round-trip strips the `'Mon, '` prefix (fixed
    5 chars) and parses the remainder — same result, no legacy parser."""
    ts_str = F.date_format("ts", _REF_FMT_SPARK)
    return table(spark, sf_dir, "events").select(
        "event_id",
        ts_str.alias("ts_str"),
        F.to_timestamp(
            F.substring(ts_str, 6, 100), "dd MMM yyyy, HH:mm:ss 'GMT+0000'"
        ).alias("ts_rt"),
    )


@register(
    "fn_ts_format",
    oracle="""
    SELECT event_id,
           strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS ts_iso,
           strftime(ts::TIMESTAMP, '%d-%b-%y') AS ts_dmy,
           strftime(ts::TIMESTAMP, '%H:%M') AS ts_hm
    FROM events
    """,
)
def fn_ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's output formats `'%Y-%m-%d %H:%M:%S'` / `'%d-%b-%y'` /
    `'%H:%M'` (app.py:191,224,274) → `date_format` Java patterns."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_iso"),
        F.date_format("ts", "dd-MMM-yy").alias("ts_dmy"),
        F.date_format("ts", "HH:mm").alias("ts_hm"),
    )


@register(
    "fn_tz_convert",
    oracle="""
    SELECT event_id, ts::TIMESTAMP + INTERVAL 7 HOUR AS ts_ict
    FROM events
    """,
)
def fn_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC → Asia/Bangkok (GMT+7, no DST) — `convert_timezone_to_gmt7`
    (app.py:43-57) → `from_utc_timestamp` (one JVM intrinsic instead of
    localize+astimezone per row)."""
    return table(spark, sf_dir, "events").select(
        "event_id", F.from_utc_timestamp("ts", "Asia/Bangkok").alias("ts_ict")
    )


@register(
    "fn_hour_mod_arith",
    oracle="""
    SELECT event_id,
           CAST((hour(ts::TIMESTAMP) + 25) % 24 AS INT) AS adj_hour_a,
           CAST((hour(ts::TIMESTAMP) + 7) % 24 AS INT) AS adj_hour_b
    FROM events
    """,
)
def fn_hour_mod_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wall-clock hour shift with wraparound — reproduces BOTH reference
    branches faithfully: `(h+25)%24` (app.py:142, the latent `gmt_offset=25`
    quirk) and `(h+7)%24` (app.py:152); documented, not "fixed"
    (SURVEY.md §7.4.4)."""
    h = F.hour("ts")
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.pmod(h + 25, F.lit(24)).cast("int").alias("adj_hour_a"),
        F.pmod(h + 7, F.lit(24)).cast("int").alias("adj_hour_b"),
    )


@register(
    "fn_time_lt",
    oracle="""
    SELECT event_id,
           (hour(ts::TIMESTAMP) * 60 + minute(ts::TIMESTAMP)) < 1080
             AS before_cutoff
    FROM events
    """,
)
def fn_time_lt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-of-day comparison against the 18:00 cutoff (app.py:146,156,160);
    no Spark TimeType → minutes-since-midnight ints (SURVEY.md §1.2)."""
    mins = F.hour("ts") * 60 + F.minute("ts")
    return table(spark, sf_dir, "events").select(
        "event_id", (mins < F.lit(18 * 60)).alias("before_cutoff")
    )


@register(
    "fn_date_extract",
    oracle="""
    SELECT event_id, ts::DATE AS d,
           CAST(year(ts::TIMESTAMP) AS INT) AS y,
           CAST(month(ts::TIMESTAMP) AS INT) AS m,
           CAST(hour(ts::TIMESTAMP) AS INT) AS h
    FROM events
    """,
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → date + field extraction (`.date()` app.py:175)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_date("ts").alias("d"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.hour("ts").alias("h"),
    )


@register(
    "fn_date_ge",
    oracle="""
    SELECT event_id, ts::DATE >= DATE '2024-01-15' AS synced_recent
    FROM events
    """,
)
def fn_date_ge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness predicate `date_only >= current_date` (app.py:180) with a
    fixed analysis date so runs are deterministic."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        (F.to_date("ts") >= F.lit("2024-01-15").cast("date")).alias("synced_recent"),
    )


# ---------------------------------------------------------------------------
# Strings / case / map / lower (fn_str_concat, fn_case_status, fn_map_lookup,
# fn_lower — sync.py:38,55; app.py:136-157,243-249,67)
# ---------------------------------------------------------------------------


@register(
    "fn_str_concat",
    oracle="""
    SELECT event_id,
           'https://api.example/projects/' || user_id || '/sync' AS sync_url,
           printf('%s#%d', event_type, event_id) AS tagged,
           concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS joined
    FROM events
    """,
)
def fn_str_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/string building by concat + f-string (sync.py:38,55;
    app.py:110,126) → `concat` / `format_string` / `concat_ws`."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.concat(
            F.lit("https://api.example/projects/"),
            F.col("user_id").cast("string"),
            F.lit("/sync"),
        ).alias("sync_url"),
        F.format_string("%s#%d", "event_type", "event_id").alias("tagged"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias(
            "joined"
        ),
    )


@register(
    "fn_case_status",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'Failed'
                WHEN event_type IN ('purchase','signup') THEN 'Success'
                WHEN event_type IS NULL THEN 'No Schedule'
                ELSE 'Not Synced' END AS status
    FROM events
    """,
)
def fn_case_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE cascade (schedule-shape dispatch app.py:136-157 and
    final status assignment :265-270,281) → chained `when(...)`.  Total
    function: every branch explicit, no unbound-variable path
    (SURVEY.md §7.4.5)."""
    t = F.col("event_type")
    status = (
        F.when(t == "error", "Failed")
        .when(t.isin("purchase", "signup"), "Success")
        .when(t.isNull(), "No Schedule")
        .otherwise("Not Synced")
    )
    return table(spark, sf_dir, "events").select("event_id", status.alias("status"))


@register(
    "fn_map_lookup",
    oracle="""
    SELECT event_id,
           CASE event_type WHEN 'error' THEN 'FFC7CE'
                           WHEN 'purchase' THEN 'C6EFCE'
                           WHEN 'click' THEN 'FFEB9C'
                           ELSE 'FFFFFF' END AS fill_color
    FROM events
    """,
)
def fn_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal dict lookup (status → Excel fill color, app.py:243-249,279)
    → `create_map` literal + `element_at` with a default."""
    color_map = F.create_map(
        F.lit("error"), F.lit("FFC7CE"),
        F.lit("purchase"), F.lit("C6EFCE"),
        F.lit("click"), F.lit("FFEB9C"),
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.coalesce(color_map[F.col("event_type")], F.lit("FFFFFF")).alias(
            "fill_color"
        ),
    )


@register(
    "fn_lower",
    oracle="""
    SELECT c_custkey, lower(c_mktsegment) AS seg
    FROM customer
    WHERE lower(c_mktsegment) IN ('building', 'machinery')
    """,
)
def fn_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive dispatch (`proj_file.lower() in ['dwh','cc']`,
    app.py:67,81,98) → `lower(col).isin(...)`."""
    c = table(spark, sf_dir, "customer")
    seg = F.lower("c_mktsegment")
    return c.filter(seg.isin("building", "machinery")).select(
        "c_custkey", seg.alias("seg")
    )


@register(
    "x_fn_regexp_extract",
    oracle=r"""
    SELECT event_id,
           TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
               AS k_val,
           CASE WHEN regexp_matches(props, '^\{.*\}\z')
                THEN 'object' ELSE 'other' END AS shape
    FROM events
    """,
)
def x_fn_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex field extraction from the semi-structured ``props`` payload
    — the scalar-function sibling of ``fn_json_parse`` for when the
    payload is only regex-structured (log lines, k=v fragments).  Both
    engines use RE2-class syntax; the capture group and the anchor test
    are spelled identically.

    Cross-engine edges handled deliberately: the end anchor is ``\\z``
    (end of TEXT in both Java regex and RE2), not ``$`` (which Java
    matches BEFORE a trailing final newline while RE2 matches only at
    end of text — a payload ending in '\\n' would otherwise classify
    differently per engine); and the non-match extract ('') goes through
    ``try_cast`` so the operator is ANSI-mode-safe, mirroring the
    oracle's TRY_CAST.

    Plan: pure Project over the scan — codegen, no shuffle."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1)
        .try_cast("bigint")
        .alias("k_val"),
        F.when(
            F.col("props").rlike("^\\{.*\\}\\z"), F.lit("object")
        )
        .otherwise(F.lit("other"))
        .alias("shape"),
    )


@register(
    "x_fn_struct_pack_extract",
    oracle="""
    WITH s AS (
        SELECT c_custkey,
               struct_pack(seg := c_mktsegment,
                           band := (floor(c_acctbal / 1000) * 1000)::BIGINT,
                           neg := c_acctbal < 0) AS profile
        FROM customer
    )
    SELECT c_custkey,
           profile.seg AS seg,
           profile.band AS band,
           profile.neg AS neg
    FROM s WHERE profile.band >= 5000
    """,
)
def x_fn_struct_pack_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction and field access through the nested-type
    surface: pack three derived attributes into a STRUCT, filter on a
    nested field, project the fields back out — the round-trip that
    proves the engine's nested types compose (``proj_nested_field``
    reads nesting the source provides; this op CREATES it).  Completes
    the complex-type trio: arrays (``x_fn_array_map``), maps
    (``fn_map_lookup``), structs (here).

    Plan: pure Project + Filter over the scan — Catalyst prunes the
    struct away entirely (the nested filter rewrites to the flat
    expression), so the nested abstraction costs nothing at
    execution."""
    profile = F.struct(
        F.col("c_mktsegment").alias("seg"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("bigint")
        .alias("band"),
        (F.col("c_acctbal") < 0).alias("neg"),
    )
    s = table(spark, sf_dir, "customer").select(
        "c_custkey", profile.alias("profile")
    )
    return s.filter(F.col("profile.band") >= 5000).select(
        "c_custkey",
        F.col("profile.seg").alias("seg"),
        F.col("profile.band").alias("band"),
        F.col("profile.neg").alias("neg"),
    )


@register(
    "x_fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           (o_orderdate + INTERVAL 3 MONTH)::DATE AS due_date,
           last_day(o_orderdate)::DATE AS month_end,
           date_trunc('quarter', o_orderdate)::DATE AS quarter_start,
           date_diff('day', o_orderdate::DATE, DATE '2000-01-01')
               ::BIGINT AS days_to_y2k
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def x_fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic surface: month addition (clamping at
    month-end, the semantic both engines share: Jan 31 + 1 month =
    Feb 28), last-day-of-month, quarter truncation and signed day
    differences — the due-date/billing-period toolkit on top of the
    timestamp layer (§2.7 covers parse/format/extract; this covers
    calendar MATH).

    Plan: pure Project over the scan with the key filter pushed down —
    every function is a codegen'd intrinsic."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.add_months("o_orderdate", 3).alias("due_date"),
            F.last_day("o_orderdate").alias("month_end"),
            F.date_trunc("quarter", "o_orderdate").cast("date").alias(
                "quarter_start"
            ),
            F.datediff(
                F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate")
            )
            .cast("bigint")
            .alias("days_to_y2k"),
        )
    )


@register(
    "x_agg_percentile_cont_disc",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_cont,
           round(quantile_disc(l_extendedprice, 0.5), 6) AS median_disc,
           count(*)::BIGINT AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def x_agg_percentile_cont_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT vs PERCENTILE_DISC side by side: the interpolated
    median versus the discrete one (an actually-occurring value) per
    group — the two ANSI quantile semantics whose silent confusion
    skews every 'median order value' report with even-sized groups
    (cont invents a value between the two middles; disc picks the
    lower middle).

    Plan: both medians ride ONE hash aggregate (shared sort inside the
    buffer); Spark's `percentile` is the cont semantic, and disc is
    `percentile_disc` through the SQL function surface."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5D)"), 6).alias(
                "median_cont"
            ),
            F.round(
                F.expr(
                    "percentile_disc(0.5) WITHIN GROUP (ORDER BY"
                    " l_extendedprice)"
                ),
                6,
            ).alias("median_disc"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
    )
