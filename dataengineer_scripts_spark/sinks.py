"""Sinks (SURVEY.md §2.1) + the HTTP fan-out partition functions backing the
§2.8 executor family.

- ``snk_http_post`` — the reference's only side-effecting output: POST
  ``{}`` to each node's ``/sync`` URL (``Sync Job/sync.py:60-69``), evolved
  through four executors: sequential (``sync.py``), thread pool
  (``sync_app.py:67-80``), asyncio (``sync_app2.py:56-75``) and thread pool
  + bounded retry (``sync_app3.py:58-74``).  Spark-first: the DataFrame of
  node ids is partitioned and ``foreachPartition`` posts each partition —
  Spark **tasks are the thread pool** (parallelism = partition count), the
  asyncio variant runs its event loop *inside* the partition function, and
  the retry variant keeps the reference's ≤3-attempts/short-circuit-on-200
  loop inside the function with ``spark.task.maxFailures`` above it.
- ``snk_json_records`` — serialize a frame to JSON records
  (``app.py:78,92``): distributed ``df.write.json``.
- ``snk_excel_styled`` — the styled Excel summary (``app.py:222-291``):
  computed as a DataFrame, then rendered driver-side.  The workbook *model*
  (header merge + date, fixed widths, per-status fill colors, thin borders)
  is built as plain data and rendered to a real ``.xlsx`` — via openpyxl
  when available, else via the stdlib OOXML writer in ``xlsx.py`` (an
  xlsx is a zip of XML parts; the styled subset we need is hand-emitted).
- ``snk_stdout_progress`` — progress/trace output (``sync.py:57``,
  ``app.py:115`` tqdm): per-partition progress via a Spark accumulator,
  rendered on the driver (executors must not print to the user's stdout).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from collections.abc import Iterator
from datetime import date

from pyspark.sql import DataFrame

from .xlsx import _XML_ILLEGAL
from .xlsx import col_letter as _col_letter

MAX_RETRIES = 3  # reference retry budget: sync_app3.py:58


def post_sync(base_url: str, token: str, node_id: int, retries: int = 1) -> int:
    """POST one node's ``/sync`` endpoint; returns attempts used.  With
    ``retries`` > 1, retries transient failures with the reference's
    semantics (``sync_app3.py:58-74``): bounded attempts, short-circuit on
    HTTP 200, give up after the budget."""
    url = f"{base_url}/analytic/nodes/{node_id}/sync"
    for attempt in range(1, retries + 1):
        # X-Attempt is the idempotency key: connection-level replays inside
        # _post_once resend the SAME key, so the server records exactly one
        # attempt per budget iteration no matter how the network behaves.
        req = urllib.request.Request(
            url, data=b"{}", method="POST",
            headers={
                "Authorization": token,
                "Content-Type": "application/json",
                "X-Attempt": str(attempt),
            },
        )
        if _post_once(req) == 200:  # success short-circuit (sync_app3.py:68)
            return attempt
        if attempt < retries:
            time.sleep(0.01)  # bounded backoff; keeps tests fast
    return retries


def _post_once(req: urllib.request.Request) -> int:
    """One HTTP-level attempt.  Connection-level transients under
    concurrent fan-out are retried internally — refused/reset connections
    surface BOTH as ``URLError`` (during connect) and as raw
    ``ConnectionError``/``TimeoutError`` (reset while reading the
    response, urllib does NOT wrap those) — the request was not served, so
    these consume no HTTP retry budget and cannot alter receipt counts.
    Client errors (<500) raise: auth/404 are not transient and must fail
    the Spark task."""
    import http.client

    last: Exception | None = None
    for backoff in (0.0, 0.05, 0.2, 0.8):
        if backoff:
            time.sleep(backoff)
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                return resp.status
        except urllib.error.HTTPError as ex:
            if ex.code < 500:
                raise
            return ex.code  # 5xx: a served failure — budget-consuming
        except (
            urllib.error.URLError,
            ConnectionError,
            TimeoutError,
            http.client.HTTPException,
        ) as ex:
            last = ex
    raise last  # connection never recovered — fail the task


def http_post_partition(base_url: str, token: str, retries: int = 1):
    """Partition function: POST every node id in the partition.  Used by
    sequential (1 partition), threadpool (N partitions — Spark tasks ARE
    the pool) and retry executors."""

    def post_all(rows: Iterator) -> None:
        for row in rows:
            post_sync(base_url, token, row.node_id, retries=retries)

    return post_all


def http_post_partition_async(base_url: str, token: str):
    """Asyncio twin (``sync_app2.py:56-75``): one event loop per partition,
    all POSTs in flight concurrently via ``asyncio.gather``.  Concurrency
    within the task multiplies the cross-task parallelism Spark already
    provides — useful when the endpoint is slow, not CPU-bound."""

    def post_all(rows: Iterator) -> None:
        import asyncio

        ids = [row.node_id for row in rows]
        if not ids:
            return

        async def main() -> None:
            await asyncio.gather(
                *(asyncio.to_thread(post_sync, base_url, token, i) for i in ids)
            )

        asyncio.run(main())

    return post_all


def fetch_receipts(base_url: str, token: str) -> dict:
    """Read the delivery record back from the API (test/verify surface)."""
    req = urllib.request.Request(
        f"{base_url}/receipts", headers={"Authorization": token}
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def write_json_records(df: DataFrame, path: str) -> None:
    """JSON-records sink (``app.py:78,92``): distributed write, one record
    per line per partition file."""
    df.write.mode("overwrite").json(path)


# --- styled Excel sink -----------------------------------------------------

#: Per-status fill colors — the reference's map at app.py:243-249
#: (C6EFCE / FFC7CE / FFE699 / BFBFBF / FFFFFF, verbatim).
STATUS_FILLS = {
    "Success": "C6EFCE",
    "Failed": "FFC7CE",
    "Not Synced": "FFE699",
    "No Schedule": "BFBFBF",
    "": "FFFFFF",
}
#: Header fill — app.py:231 uses solid FFFF00 (yellow) on the merged row.
HEADER_FILL = "FFFF00"
#: Fixed column widths — app.py:235-241.
COLUMN_WIDTHS = {
    "A": 12, "B": 10, "C": 28, "D": 28, "E": 10, "F": 14, "G": 60,
}
HEADER_COLS = ["date", "time", "init_name", "name", "loc", "status", "error_note"]


def build_workbook_model(
    rows: list[dict],
    columns: list[str] | None = None,
    report_date: date | None = None,
) -> dict:
    """The styled workbook as plain data: merged/filled header row carrying
    the report date (app.py:229-233), fixed column widths (:235-241),
    per-status row fills (:243-249,279-283), thin borders on every written
    cell (:285-286).  Serializable by any spreadsheet backend."""
    cols = columns or (list(rows[0].keys()) if rows else HEADER_COLS)
    d = (report_date or date.today()).isoformat()
    return {
        "header": {
            "title": f"Job Status Report {d}",
            "merge": f"A1:{_col_letter(len(cols))}1",
            "fill": HEADER_FILL,
        },
        "columns": cols,
        "column_widths": COLUMN_WIDTHS,
        "rows": [
            {
                "cells": [_cell(r.get(c)) for c in cols],
                "fill": STATUS_FILLS.get(str(r.get("status", "")), "FFFFFF"),
                "border": "thin",
            }
            for r in rows
        ],
    }


def _cell(v):
    """JSON-serializable cell value (timestamps → ISO strings).  String
    values are stripped of XML-1.0-illegal characters HERE, in the shared
    model layer, so both renderers agree: openpyxl's own sanitizer only
    covers the C0 controls, and a noncharacter or lone surrogate reaching
    it would produce an artifact the expat-based ``read_xlsx`` (and hence
    the ``snk_excel_values`` gate) cannot parse — or crash the write —
    on openpyxl hosts only (round-13 review finding)."""
    if isinstance(v, str):
        return _XML_ILLEGAL.sub("", v)
    return v.isoformat() if hasattr(v, "isoformat") else v


def write_excel_styled(
    df: DataFrame, path: str, report_date: date | None = None
) -> str:
    """Render the report DataFrame as a styled workbook.  Distributed part:
    the report computation (upstream plan).  Driver part: presentation.
    With openpyxl installed it renders through openpyxl; otherwise (this
    container) the stdlib OOXML writer (``xlsx.write_xlsx``) emits the
    same styled ``.xlsx`` — merged/filled header, column widths,
    per-status fills, thin borders — directly as zip + XML."""
    rows = [r.asDict() for r in df.collect()]  # presentation layer: small report
    model = build_workbook_model(rows, columns=df.columns, report_date=report_date)
    try:
        import openpyxl
        from openpyxl.styles import Alignment, Border, Font, PatternFill, Side
    except ImportError:
        from .xlsx import write_xlsx

        return write_xlsx(model, path)

    wb = openpyxl.Workbook()
    ws = wb.active
    thin = Border(*[Side(style="thin")] * 4)
    ws.merge_cells(model["header"]["merge"])
    ws["A1"] = model["header"]["title"]
    ws["A1"].fill = PatternFill("solid", fgColor=model["header"]["fill"])
    ws["A1"].font = Font(bold=True)
    ws["A1"].alignment = Alignment(horizontal="center")
    for col, width in model["column_widths"].items():
        ws.column_dimensions[col].width = width
    ws.append(model["columns"])
    for r in model["rows"]:
        ws.append(r["cells"])
        fill = PatternFill("solid", fgColor=r["fill"])
        for cell in ws[ws.max_row]:
            cell.fill = fill
            cell.border = thin
    wb.save(path)
    return path


def foreach_progress(df: DataFrame, label: str = "progress") -> int:
    """Progress sink: count rows per partition through an accumulator and
    render one driver-side progress line per partition (the declarative
    stand-in for the reference's per-row prints / tqdm bar).  Returns the
    total row count seen."""
    sc = df.sparkSession.sparkContext
    acc = sc.accumulator(0)

    def count_partition(rows: Iterator) -> None:
        n = 0
        for _ in rows:
            n += 1
        acc.add(n)

    n_parts = df.rdd.getNumPartitions()
    df.foreachPartition(count_partition)
    print(f"{label}: {acc.value} rows across {n_parts} partitions", flush=True)
    return acc.value


def scratch_dir(sub: str = "") -> str:
    """Per-call scratch directory under the repo (driver may not write
    outside /root/repo)."""
    import uuid

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp"
    )
    d = os.path.join(base, sub or uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    return d
