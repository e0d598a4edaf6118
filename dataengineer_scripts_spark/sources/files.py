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
