"""Minimal stdlib ``.xlsx`` writer/reader for the styled-report sink.

The reference's single user-visible artifact is a styled Excel workbook
(``Job Cek Script/app.py:222-291``): merged+filled header row
(``:229-233``), fixed column widths (``:235-241``), per-status fill
colors (``:243-249``), thin borders on every written cell (``:285-286``).
openpyxl is absent in this container, so this module renders the
already-built workbook model (``sinks.build_workbook_model``) straight to
OOXML: a ``.xlsx`` is just a zip of XML parts, and the subset we need —
one sheet, inline strings, solid fills, thin borders, merges, column
widths — is small enough to hand-emit deterministically with ``zipfile``
+ string templates.  ``read_xlsx`` re-parses the artifact with
``xml.etree`` so tests can round-trip values, fills, and the merge range
without any spreadsheet library.

Driver-side presentation only — the distributed part of the sink is the
report computation upstream; this renders a small collected report.
"""

from __future__ import annotations

import math
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

# Fixed timestamp => byte-identical output for identical models.
_ZIP_DATE = (1980, 1, 1, 0, 0, 0)

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
    "</workbook>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>"
)


def col_letter(idx: int) -> str:
    """1-based column index → A1-style letter(s)."""
    s = ""
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _letter_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


def _styles_xml(fills: list[str]) -> str:
    """styles.xml with fill indices 0/1 reserved (none/gray125 — an OOXML
    convention readers expect), then one solid fill per distinct color.
    cellXfs: xf0 default; xf1 header (bold, fill[0], centered, thin
    border); xf(2+i) data style for fill i (solid fill + thin border)."""
    fill_parts = [
        '<fill><patternFill patternType="none"/></fill>',
        '<fill><patternFill patternType="gray125"/></fill>',
    ]
    for color in fills:
        fill_parts.append(
            '<fill><patternFill patternType="solid">'
            f'<fgColor rgb="FF{color}"/><bgColor rgb="FF{color}"/>'
            "</patternFill></fill>"
        )
    xfs = [
        '<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>',
        # header: bold, first fill, centered, thin border (app.py:229-233)
        '<xf numFmtId="0" fontId="1" fillId="2" borderId="1" '
        'applyFont="1" applyFill="1" applyBorder="1" applyAlignment="1">'
        '<alignment horizontal="center" vertical="center"/></xf>',
    ]
    for i in range(len(fills)):
        xfs.append(
            f'<xf numFmtId="0" fontId="0" fillId="{2 + i}" borderId="1" '
            'applyFill="1" applyBorder="1"/>'
        )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<fonts count=\"2\">"
        '<font><sz val="11"/><name val="Calibri"/></font>'
        '<font><b/><sz val="11"/><name val="Calibri"/></font>'
        "</fonts>"
        f'<fills count="{len(fill_parts)}">{"".join(fill_parts)}</fills>'
        '<borders count="2">'
        "<border><left/><right/><top/><bottom/><diagonal/></border>"
        "<border>"
        '<left style="thin"><color rgb="FF000000"/></left>'
        '<right style="thin"><color rgb="FF000000"/></right>'
        '<top style="thin"><color rgb="FF000000"/></top>'
        '<bottom style="thin"><color rgb="FF000000"/></bottom>'
        "<diagonal/></border>"
        "</borders>"
        f'<cellXfs count="{len(xfs)}">{"".join(xfs)}</cellXfs>'
        "</styleSheet>"
    )


#: Characters the XML 1.0 Char production excludes (OOXML would be
#: rejected by any parser): the C0 controls minus TAB/LF/CR, the
#: U+FFFE/U+FFFF noncharacters (expat refuses to parse them — r12 advice
#: item 1), and lone surrogates (no UTF-8 form at all: zipfile.writestr
#: would crash encoding the sheet XML — round-13 review finding).
_XML_ILLEGAL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff\ufffe\uffff]")


def _cell_xml(ref: str, value, style: int) -> str:
    s = f' s="{style}"' if style else ""
    if value is None:
        return f'<c r="{ref}"{s}/>'
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        # NaN/Inf have no OOXML numeric form — store as inline string
        # (what openpyxl effectively does) instead of emitting <v>nan</v>
        if isinstance(value, float) and not math.isfinite(value):
            value = str(value)
        else:
            return f'<c r="{ref}"{s}><v>{value!r}</v></c>'
    text = escape(_XML_ILLEGAL.sub("", str(value)))
    return (
        f'<c r="{ref}"{s} t="inlineStr">'
        f'<is><t xml:space="preserve">{text}</t></is></c>'
    )


def write_xlsx(model: dict, path: str) -> str:
    """Render a ``sinks.build_workbook_model`` dict as a real ``.xlsx``.

    Sheet layout (matches the openpyxl rendering of the same model):
    row 1 = merged/filled/bold/centered header title, row 2 = column
    names, rows 3+ = data rows with per-status solid fill + thin border
    on every cell.
    """
    header = model["header"]
    columns = model["columns"]
    n_cols = len(columns)

    # distinct data fills in first-appearance order; header fill first
    fills: list[str] = [header["fill"]]
    for row in model["rows"]:
        if row["fill"] not in fills:
            fills.append(row["fill"])
    data_style = {c: 2 + i for i, c in enumerate(fills)}  # xf index per color

    sheet = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    sheet.append(
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    )
    widths = model.get("column_widths") or {}
    if widths:
        cols = "".join(
            f'<col min="{_letter_index(c)}" max="{_letter_index(c)}" '
            f'width="{w}" customWidth="1"/>'
            for c, w in sorted(widths.items(), key=lambda kv: _letter_index(kv[0]))
        )
        sheet.append(f"<cols>{cols}</cols>")
    sheet.append("<sheetData>")
    # row 1: header title in A1, styled; remaining merged cells styled empty
    row1 = [_cell_xml("A1", header["title"], 1)]
    for i in range(2, n_cols + 1):
        row1.append(_cell_xml(f"{col_letter(i)}1", None, 1))
    sheet.append(f'<row r="1">{"".join(row1)}</row>')
    # row 2: column names, unstyled
    row2 = [
        _cell_xml(f"{col_letter(i + 1)}2", name, 0)
        for i, name in enumerate(columns)
    ]
    sheet.append(f'<row r="2">{"".join(row2)}</row>')
    # rows 3+: data, per-row fill + border
    for r_i, row in enumerate(model["rows"]):
        style = data_style[row["fill"]]
        r = r_i + 3
        cells = [
            _cell_xml(f"{col_letter(c_i + 1)}{r}", v, style)
            for c_i, v in enumerate(row["cells"])
        ]
        sheet.append(f'<row r="{r}">{"".join(cells)}</row>')
    sheet.append("</sheetData>")
    sheet.append(
        f'<mergeCells count="1"><mergeCell ref="{header["merge"]}"/></mergeCells>'
    )
    sheet.append("</worksheet>")

    parts = [
        ("[Content_Types].xml", _CONTENT_TYPES),
        ("_rels/.rels", _ROOT_RELS),
        ("xl/workbook.xml", _WORKBOOK),
        ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
        ("xl/styles.xml", _styles_xml(fills)),
        ("xl/worksheets/sheet1.xml", "".join(sheet)),
    ]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in parts:
            info = zipfile.ZipInfo(name, date_time=_ZIP_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, content)
    return path


_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def read_xlsx(path: str) -> dict:
    """Parse an ``.xlsx`` back to a dict for round-trip tests:
    ``{"rows": {row_number: [values...]}, "row_fills": {row_number: hex},
    "merges": [ranges], "column_widths": {letter: width},
    "header_fill": hex}``.  Handles the subset ``write_xlsx`` emits
    (inline strings, numbers, booleans, solid fills) PLUS shared-string
    cells (``t="s"`` + ``xl/sharedStrings.xml``) and formula-string cells
    (``t="str"``), which openpyxl emits for text — so the
    ``snk_excel_values`` gate reads the same values whichever writer
    ``write_excel_styled`` dispatched to (r11 advice item 1)."""
    with zipfile.ZipFile(path) as zf:
        styles = ET.fromstring(zf.read("xl/styles.xml"))
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
        try:
            shared_xml = zf.read("xl/sharedStrings.xml")
        except KeyError:
            shared_xml = None

    # a shared string <si> is either one <t> or rich-text runs <r><t>…;
    # concatenate every descendant <t> to cover both
    shared: list[str] = []
    if shared_xml is not None:
        for si in ET.fromstring(shared_xml).iter(f"{{{_NS['m']}}}si"):
            shared.append(
                "".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t"))
            )

    fill_colors: list[str | None] = []
    for fill in styles.find("m:fills", _NS):
        pat = fill.find("m:patternFill", _NS)
        fg = pat.find("m:fgColor", _NS) if pat is not None else None
        rgb = fg.get("rgb") if fg is not None else None
        fill_colors.append(rgb[-6:] if rgb else None)
    xf_fill = [
        int(xf.get("fillId", "0")) for xf in styles.find("m:cellXfs", _NS)
    ]

    rows: dict[int, list] = {}
    row_fills: dict[int, str | None] = {}
    prev_row = 0
    for row in sheet.iter(f"{{{_NS['m']}}}row"):
        # OOXML makes the row's r= attribute optional, with the same
        # "next after previous" placement rule as cells: an unreferenced
        # row lands at the row AFTER THE PREVIOUS one (duplicates resolve
        # last-write-wins, like cells).  write_xlsx and openpyxl always
        # emit r=, but a round-trip reader must accept the spec's full
        # placement model (the r15 property fuzzes both levels together).
        r_attr = row.get("r")
        r = int(r_attr) if r_attr is not None else prev_row + 1
        prev_row = r
        # Place values by the cell's r="B3"-style column reference, not by
        # iteration order: a writer that omits a value-less style-less cell
        # entirely (openpyxl does) would otherwise silently shift every
        # later column in the row (r12 advice item 3).  Cells without an
        # r= attribute (legal per OOXML) take the column after the
        # PREVIOUS cell — OOXML's "next after previous" semantics — not
        # max(seen)+1, which would misplace an unreferenced cell whenever
        # a writer emits referenced cells out of ascending order (r13
        # advice item 3).
        cells: dict[int, object] = {}
        fill = None
        prev_col = 0
        for c in row:
            ref = c.get("r")
            if ref:
                col = _letter_index("".join(ch for ch in ref if ch.isalpha()))
            else:
                col = prev_col + 1
            prev_col = col
            t = c.get("t")
            if t == "inlineStr":
                t_el = c.find("m:is/m:t", _NS)
                value = t_el.text or "" if t_el is not None else ""
            else:
                v = c.find("m:v", _NS)
                if v is None:
                    value = None
                elif t == "s":
                    value = shared[int(v.text)]
                elif t == "str":
                    value = v.text or ""
                elif t == "b":
                    value = v.text == "1"
                else:
                    num = float(v.text)
                    value = int(num) if num.is_integer() else num
            cells[col] = value
            s = int(c.get("s", "0"))
            if fill is None and s:
                fill = fill_colors[xf_fill[s]]
        rows[r] = [cells.get(i) for i in range(1, max(cells, default=0) + 1)]
        row_fills[r] = fill

    merges = [
        mc.get("ref") for mc in sheet.iter(f"{{{_NS['m']}}}mergeCell")
    ]
    widths = {
        col_letter(int(col.get("min"))): float(col.get("width"))
        for col in sheet.iter(f"{{{_NS['m']}}}col")
    }
    return {
        "rows": rows,
        "row_fills": row_fills,
        "merges": merges,
        "column_widths": widths,
        "header_fill": row_fills.get(1),
    }


def validate_xlsx(path: str) -> None:
    """Sanity-check the artifact is a well-formed xlsx the subset readers
    need: zip opens, required parts present, sheet XML parses, merge refs
    are valid A1 ranges."""
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        for part in (
            "[Content_Types].xml",
            "_rels/.rels",
            "xl/workbook.xml",
            "xl/styles.xml",
            "xl/worksheets/sheet1.xml",
        ):
            if part not in names:
                raise ValueError(f"missing xlsx part: {part}")
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    for mc in sheet.iter(f"{{{_NS['m']}}}mergeCell"):
        if not re.fullmatch(r"[A-Z]+\d+:[A-Z]+\d+", mc.get("ref") or ""):
            raise ValueError(f"bad merge ref: {mc.get('ref')}")
