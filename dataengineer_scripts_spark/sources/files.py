"""File & JDBC sources (SURVEY.md §2.1).

- ``src_json_file`` — the reference loads a project list from a local JSON
  file with an existence check and a friendly error
  (``Job Cek Script/app.py:103-108``).  Spark-first: ``spark.read.json``
  with an **explicit schema** (schema-on-read contract; inference only in
  dev) and the existence check surfaced as a clear exception.
- ``src_jdbc_select`` — the reference pulls its project list from MSSQL
  with the projection and a literal column pushed into the source query
  (``app.py:67-79``: ``SELECT [name], [id], [name] as init_name, 'Delman'
  AS [loc] FROM DailyJobCheck``).  Spark-first: ``spark.read.format("jdbc")``
  with the ``query`` option — the projection executes inside the database,
  Spark only ever sees the 4 projected columns.  Tested against **embedded
  Apache Derby** (ships with Spark's JVM), which exercises the identical
  JDBC code path as MSSQL/Postgres — only the URL and dialect differ.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


class SqlDialect:
    """Identifier-quoting and limit rules for building JDBC pushdown
    queries per target database.  The reference's actual target is MSSQL
    (bracket identifiers, ``SELECT TOP n`` — ``Job Cek Script/
    app.py:67-79``); the sandbox exercises the same JDBC path on embedded
    Derby (ANSI double-quote identifiers, ``FETCH FIRST``).  Only the URL,
    driver and this dialect differ between the two."""

    def __init__(self, name: str, q_open: str, q_close: str, limit_style: str):
        self.name = name
        self.q_open = q_open
        self.q_close = q_close
        self.limit_style = limit_style  # "top" (MSSQL) | "fetch" (ANSI)

    def quote(self, identifier: str) -> str:
        # escape the closing quote char by doubling (]] / "")
        return (
            self.q_open
            + identifier.replace(self.q_close, self.q_close * 2)
            + self.q_close
        )


DIALECTS = {
    "ansi": SqlDialect("ansi", '"', '"', "fetch"),
    "derby": SqlDialect("derby", '"', '"', "fetch"),
    "mssql": SqlDialect("mssql", "[", "]", "top"),
}


def _sql_literal(value) -> str:
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, bool):
        return "1" if value else "0"
    return str(value)


def pushdown_query(
    table: str,
    columns: list,
    literals: dict | None = None,
    dialect: str = "ansi",
    limit: int | None = None,
) -> str:
    """Build the database-side projection query for a JDBC read — the
    shape the reference pushes to MSSQL (``app.py:72``: ``SELECT [name],
    [id], [name] as init_name, 'Delman' AS [loc] FROM DailyJobCheck``).
    ``columns``: names or ``(name, alias)`` pairs; ``literals``: constant
    columns as ``{alias: value}``; ``limit`` renders per-dialect (``TOP n``
    on MSSQL, ``FETCH FIRST n ROWS ONLY`` on ANSI/Derby).  The table
    identifier is passed through verbatim, as the reference writes it."""
    d = DIALECTS[dialect]
    items = []
    for c in columns:
        name, alias = c if isinstance(c, tuple) else (c, None)
        s = d.quote(name)
        if alias:
            s += f" AS {d.quote(alias)}"
        items.append(s)
    for alias, value in (literals or {}).items():
        items.append(f"{_sql_literal(value)} AS {d.quote(alias)}")
    head = "SELECT "
    if limit is not None and d.limit_style == "top":
        head += f"TOP {int(limit)} "
    q = head + ", ".join(items) + f" FROM {table}"
    if limit is not None and d.limit_style == "fetch":
        q += f" FETCH FIRST {int(limit)} ROWS ONLY"
    return q


def read_json_file(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-file source with the reference's existence check
    (``app.py:103-108``) surfaced as a clear error instead of a deep
    AnalysisException."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"project file {path!r} does not exist — expected a JSON records file"
        )
    return spark.read.schema(schema).json(path)


def jdbc_reader(
    spark: SparkSession,
    url: str,
    query: str,
    driver: str | None = None,
    fetchsize: int = 1000,
):
    """Configured JDBC reader with the projection pushed into the database
    via the ``query`` option (the Spark twin of the reference's
    ``pd.read_sql(sql, engine)`` at ``app.py:75``).  ``fetchsize`` sizes the
    cursor batches; predicate pushdown stays on (default) so later filters
    also reach the database."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        r = r.option("driver", driver)
    return r


def derby_url(db_dir: str, create: bool = False) -> str:
    return f"jdbc:derby:{db_dir}" + (";create=true" if create else "")


def write_jdbc_table(
    df: DataFrame, url: str, table: str, driver: str = DERBY_DRIVER
) -> None:
    """Create/overwrite a database table from a DataFrame over JDBC
    (used to seed the embedded-Derby test database)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )
