"""Minimal pure-Python XLSX text extraction (stdlib only: zipfile +
ElementTree).

A spreadsheet is a zip archive: xl/workbook.xml lists sheets in workbook
order with relationship ids, xl/_rels/workbook.xml.rels maps those ids to
worksheet parts, shared cell strings live in xl/sharedStrings.xml. The
reference parses spreadsheets through `unstructured.partition`
(/root/reference/yamlpipe/components/sources.py:92-93); this extractor
makes `.xlsx` a real registry format without the dependency. Scope: cell
values in row-major order — shared strings (plain or rich-run), inline
strings, formula string results, and raw numeric text — rows joined with
tabs, sheets separated by blank lines, in workbook sheet order; no number
formatting (dates come out as serial numbers), no merged-cell expansion.
"""

from __future__ import annotations

import io
import posixpath
import zipfile
import xml.etree.ElementTree as ET

_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out: list[str] = []
    for si in root.iter(f"{_MAIN}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_MAIN}t")))
    return out


def _cell_text(c: ET.Element, shared: list[str]) -> str:
    ctype = c.get("t") or "n"
    if ctype == "inlineStr":
        is_el = c.find(f"{_MAIN}is")
        if is_el is None:
            return ""
        return "".join(t.text or "" for t in is_el.iter(f"{_MAIN}t"))
    v = c.find(f"{_MAIN}v")
    if v is None or v.text is None:
        return ""
    if ctype == "s":
        try:
            idx = int(v.text)
        except ValueError:
            return ""
        # explicit bounds check: a negative index in a corrupt file must
        # not silently wrap to the END of the shared-string table
        return shared[idx] if 0 <= idx < len(shared) else ""
    return v.text  # "n" number, "str" formula result, "b" boolean 0/1


def extract_xlsx_text(data: bytes) -> str:
    """Sheet texts (rows tab-joined, newline-separated) joined with blank
    lines, in workbook sheet order."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        rels: dict[str, str] = {}
        try:
            rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            for rel in rel_root.iter(f"{_RELS}Relationship"):
                rid, target = rel.get("Id"), rel.get("Target")
                if rid and target:
                    rels[rid] = (
                        target
                        if target.startswith("/")
                        else posixpath.join("xl", target)
                    ).lstrip("/")
        except KeyError:
            pass
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        shared = _shared_strings(zf)
        sheets: list[str] = []
        for sheet in wb.iter(f"{_MAIN}sheet"):
            path = rels.get(sheet.get(_RID) or "")
            if not path:
                continue
            try:
                ws = ET.fromstring(zf.read(path))
            except KeyError:
                continue
            rows: list[str] = []
            for row in ws.iter(f"{_MAIN}row"):
                cells = [
                    _cell_text(c, shared) for c in row.iter(f"{_MAIN}c")
                ]
                line = "\t".join(cells).rstrip("\t")
                if line.strip():
                    rows.append(line)
            if rows:
                sheets.append("\n".join(rows))
    return "\n\n".join(sheets)
