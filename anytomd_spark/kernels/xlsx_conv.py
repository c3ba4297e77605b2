"""XLSX to Markdown conversion kernel (direct OOXML parse, no calamine).

Reimplements ``/root/reference/src/converter/xlsx.rs`` semantics:
per-sheet ``## SheetName`` + pipe table with first row as header
(convert_inner :246-329), cell formatting (format_cell :184-237 — whole
floats -> int, bools -> TRUE/FALSE, datetimes -> ``YYYY-MM-DD[ HH:MM:SS]``,
error cells -> text + MalformedSegment warning), empty sheets skipped,
sections joined by ``\\n``, Excel column letters in warning locations
(col_letter :161-172). The bounding-box range semantics match calamine's
``worksheet_range``: iteration starts at the minimal (row, col) corner that
holds data and pads gaps with empty cells.
"""

from __future__ import annotations

import datetime as _dt
import re

from anytomd_spark.kernels.decode import MALFORMED_SEGMENT, SKIPPED_ELEMENT, warning
from anytomd_spark.kernels.markdown import (
    escape_cell,
    format_heading,
)
from anytomd_spark.kernels.ooxml import (
    attr_suffix,
    open_zip,
    parse_relationships,
    parse_xml_events,
    parse_xml_events_raw,
    read_zip_text,
    validate_zip_budget,
)
from anytomd_spark.kernels.simple import MalformedDocument

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")

# Built-in date/time number formats (ECMA-376 §18.8.30), as calamine detects
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48))
_DATE_TOKEN = re.compile(r"[ymdhs]", re.IGNORECASE)


def col_letter(col: int) -> str:
    """0-based column index -> Excel letters (xlsx.rs:161-172)."""
    result = ""
    n = col
    while True:
        result = chr(ord("A") + n % 26) + result
        if n < 26:
            break
        n = n // 26 - 1
    return result


def _col_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


_INF = float("inf")


def format_float(f: float) -> str:
    """Rust ``f64::to_string`` = shortest round-trip, like Python repr.

    Branch order is the whole-number fast path first: ``is_integer`` is
    one C call (False for NaN/inf, so those fall through safely) and
    spreadsheet cells are overwhelmingly whole numbers."""
    if f.is_integer():
        if -1e17 < f < 1e17:
            return str(int(f))  # format_cell: fract()==0 -> "{:.0}"
        # Rust {:.0}/Display expand digits positionally even for huge
        # whole values; repr() would switch to '1e+20'-style notation
        return f"{f:.0f}"
    if f != f:
        return "NaN"
    if f == _INF:
        return "inf"
    if f == -_INF:
        return "-inf"
    return repr(f)


def excel_serial_to_datetime(serial: float) -> _dt.datetime | None:
    """1900 date system; serial 1 = 1900-01-01 (base 1899-12-30 after the
    Lotus leap bug for serials >= 60, matching calamine's as_datetime)."""
    # NaN/inf serials: int() would raise (found by the fast-scan
    # Hypothesis battery); treat as non-dates -> format_float fallback
    if serial < 0 or serial != serial or serial == float("inf"):
        return None
    base = _dt.datetime(1899, 12, 30)
    if serial < 60:
        base = _dt.datetime(1899, 12, 31)
    days = int(serial)
    frac = serial - days
    seconds = round(frac * 86400)
    try:
        return base + _dt.timedelta(days=days, seconds=seconds)
    except OverflowError:
        return None


def _format_datetime(serial: float) -> str:
    ndt = excel_serial_to_datetime(serial)
    if ndt is None:
        return format_float(serial)
    if ndt.hour == 0 and ndt.minute == 0 and ndt.second == 0:
        return f"{ndt.year:04d}-{ndt.month:02d}-{ndt.day:02d}"
    return (
        f"{ndt.year:04d}-{ndt.month:02d}-{ndt.day:02d} "
        f"{ndt.hour:02d}:{ndt.minute:02d}:{ndt.second:02d}"
    )


def parse_shared_strings(xml: str) -> list[str]:
    """sharedStrings.xml -> list of strings (rich-text runs concatenated).

    Deliberately expat-only: a worksheet-style single-regex fast scan
    was built and interleaved-A/B'd at 0.81x (sst has ~5 expat events
    per string vs ~8+attr-dicts per sheet row, so the guard battery +
    120k match objects cost more than the callbacks they remove) —
    see PLANS.md round-6 negative result."""
    strings: list[str] = []
    st = {"in_si": False, "in_t": False, "parts": [], "in_rph": 0}

    def start(local, attrs):
        if local == "si":
            st["in_si"] = True
            st["parts"] = []
        elif local in ("rPh", "phoneticPr"):
            st["in_rph"] += 1
        elif local == "t" and st["in_si"] and not st["in_rph"]:
            st["in_t"] = True

    def text(data):
        if st["in_t"]:
            st["parts"].append(data)

    def end(local):
        if local == "si":
            strings.append("".join(st["parts"]))
            st["in_si"] = False
        elif local in ("rPh", "phoneticPr"):
            st["in_rph"] = max(0, st["in_rph"] - 1)
        elif local == "t":
            st["in_t"] = False

    parse_xml_events(xml, start, end, text)
    return strings


def parse_date_styles(styles_xml: str) -> set[int]:
    """Indices into cellXfs whose numFmt is date/time-like."""
    custom_date_fmts: set[int] = set()
    xf_fmt_ids: list[int] = []
    st = {"in_cellxfs": False}

    def _is_date_code(code: str) -> bool:
        # strip bracketed sections, quoted literals, colors
        cleaned = re.sub(r"\[[^\]]*\]|\"[^\"]*\"|\\.", "", code)
        return bool(_DATE_TOKEN.search(cleaned))

    def start(local, attrs):
        if local == "numFmt":
            fmt_id = attrs.get("numFmtId")
            code = attrs.get("formatCode", "")
            if fmt_id is not None and fmt_id.isdigit() and _is_date_code(code):
                custom_date_fmts.add(int(fmt_id))
        elif local == "cellXfs":
            st["in_cellxfs"] = True
        elif local == "xf" and st["in_cellxfs"]:
            fmt_id = attrs.get("numFmtId", "0")
            xf_fmt_ids.append(int(fmt_id) if fmt_id.isdigit() else 0)

    def end(local):
        if local == "cellXfs":
            st["in_cellxfs"] = False

    parse_xml_events(styles_xml, start, end, lambda d: None)

    date_styles: set[int] = set()
    for i, fmt_id in enumerate(xf_fmt_ids):
        if fmt_id in _BUILTIN_DATE_FMTS or fmt_id in custom_date_fmts:
            date_styles.add(i)
    return date_styles


# ---- fast worksheet scanner --------------------------------------------
#
# Machine-generated sheet XML is overwhelmingly regular: unprefixed
# <row>/<c>/<v>/<is>/<t> elements, double-quoted attributes, no DTD /
# CDATA / comments / PIs. On that shape a single-regex cell-level scan
# replaces ~8 expat->Python callback crossings per row with one regex
# match per row/cell (~2.6x on the 10 MB latency sheet). Equivalence
# with the expat path is guaranteed by construction: the document is
# first WELL-FORMEDNESS-checked by a handler-less native expat parse
# (malformed input falls back to the expat path, preserving its
# silent-truncation-at-error semantics, xlsx.rs Err(_) => break), and
# every construct the scan does not model — '<!'-markup, extra PIs,
# prefixed hot elements, single-quoted/entity-bearing attributes,
# markup inside <v>/<t> text — is detected by cheap guards or by the
# row/cell count self-check and falls back. Locked by
# tests/test_xlsx_fast_scan.py differential battery.

_ROW_ANY = re.compile(r"<row[\s/>]")
_C_ANY = re.compile(r"<c[\s/>]")
_T_ANY = re.compile(r"<t[\s/>]")
_V_ANY = re.compile(r"<v[\s/>]")
# a namespace-prefixed hot element anywhere disqualifies the fast scan
_PREFIXED_HOT = re.compile(r"<[A-Za-z_][\w.-]*:(?:row|c|v|is|t)[\s/>]")
_ATTRS = r'((?:\s+[A-Za-z_][\w:.-]*="[^"<>]*")*)\s*'
# The hot token regex captures r/s/t attributes IN the match (standard
# writer order r, s, t — Excel's own order); any other attribute, a
# different order, or a nonstandard value falls into the "leftover"
# group, whose markers route the cell to the generic per-cell path.
# Groups: 1 "row" literal | 2 row r | 3 row leftover ||
#         4 cell r | 5 cell s | 6 cell t | 7 cell leftover | 8 body
_SHEET_TOKEN = re.compile(
    r'<(row)(?:\s+r="([0-9]{1,7})")?'
    rf"{_ATTRS}/?>"
    r'|<c(?:\s+r="([A-Z]{1,3}[0-9]{1,7})")?'
    r'(?:\s+s="([0-9]+)")?(?:\s+t="([a-zA-Z]+)")?'
    rf"{_ATTRS}(?:/>|>(.*?)</c\s*>)",
    re.DOTALL,
)
# any-whitespace-separated r/s/t attr in a leftover group (XML allows
# tab/newline separators, not just a single space). May false-positive
# on a value containing ' r="'-ish text — that only routes the cell to
# the generic path, where _attr_value's structural parse is exact.
_LEFTOVER_RST = re.compile(r'\s[rst]="')
# one attribute pair as _ATTRS captured it: leftover is exactly a
# concatenation of these, so finditer cannot desync into a value
_ATTR_PAIR = re.compile(r'\s+([A-Za-z_][\w:.-]*)="([^"<>]*)"')
_T_INNER = re.compile(rf"<t{_ATTRS}(?:/>|>(.*?)</t\s*>)", re.DOTALL)
_V_INNER = re.compile(rf"<v{_ATTRS}(?:/>|>(.*?)</v\s*>)", re.DOTALL)

# the fast scan only engages above this size: the fixed guard scans +
# well-formedness parse don't amortize on small parts (measured ~5%
# slower at ~1 KB, 1.35x faster at 10 MB)
_FAST_SCAN_MIN_BYTES = 65536

_ENT = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}
_ENT_RE = re.compile(r"&(?:(amp|lt|gt|quot|apos)|#(?:x([0-9a-fA-F]+)|([0-9]+)));")


def _decode_text(s: str) -> str:
    """Expat-equivalent text: newline-normalize then expand references
    (charref-produced \\r stays literal, exactly like expat)."""
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    if "&" not in s:
        return s
    return _ENT_RE.sub(_ent_repl, s)


def _ent_repl(m: re.Match) -> str:
    g1 = m.group(1)
    if g1:
        return _ENT[g1]
    g2 = m.group(2)
    if g2:
        return chr(int(g2, 16))
    return chr(int(m.group(3)))


def _attr_value(attrs_s: str, name: str) -> str | None:
    """Extract a double-quoted attribute by name from an _ATTRS-captured
    leftover group (attribute pairs separated by any XML whitespace),
    with expat's attribute-value normalization (literal whitespace ->
    space, charref whitespace kept literally: normalize then decode).
    Walks the pair structure rather than substring-searching, so a value
    that CONTAINS ``r="``-like text can never be misread as the attr."""
    for m in _ATTR_PAIR.finditer(attrs_s):
        if m.group(1) != name:
            continue
        val = m.group(2)
        if "\r" in val or "\n" in val or "\t" in val:
            val = val.replace("\r", " ").replace("\n", " ").replace("\t", " ")
        if "&" in val:
            val = _ENT_RE.sub(_ent_repl, val)
        return val
    return None


def _fast_sheet_cells(
    xml: str, shared: list[str], date_styles: set[int]
) -> tuple[dict[int, str], dict[int, str]] | None:
    """Fast-scan a worksheet; ``None`` means use the expat path."""
    from xml.parsers import expat as _expat

    # '<!' covers DOCTYPE (DTD-defined entities), comments and CDATA in
    # one C-speed scan; extra '<?' beyond the leading declaration = PIs
    if "<!" in xml:
        return None
    if xml.count("<?") != (1 if xml.startswith("<?") else 0):
        return None
    if _PREFIXED_HOT.search(xml):
        return None
    parser = _expat.ParserCreate()
    try:
        parser.Parse(xml, True)
    except _expat.ExpatError:
        return None  # expat path truncates at the error, identically

    n_rows = len(_ROW_ANY.findall(xml))
    n_cells = len(_C_ANY.findall(xml))
    cells: dict[int, str] = {}
    errors: dict[int, str] = {}
    row, next_col = 0, 0
    n_shared = len(shared)
    seen_rows = seen_cells = 0
    cell_ref_match = _CELL_REF.match

    for m in _SHEET_TOKEN.finditer(xml):
        g = m.group
        if g(1) is not None:  # row
            seen_rows += 1
            r = g(2)
            if r is None:
                leftover = g(3)
                r = _attr_value(leftover, "r") if leftover else None
                row = (
                    int(r) - 1
                    if r and r.isdigit() and len(r) <= 7
                    and 0 < int(r) <= 1048576
                    else row + 1
                )
            else:  # regex-guaranteed 1-7 digits
                ri = int(r)
                row = ri - 1 if 0 < ri <= 1048576 else row + 1
            next_col = 0
            continue
        seen_cells += 1
        ref, sref, t, leftover, body = g(4, 5, 6, 7, 8)
        if leftover and _LEFTOVER_RST.search(leftover):
            # nonstandard attribute order / value: generic extraction for
            # whichever of r/s/t the positional groups missed
            if ref is None:
                ref = _attr_value(leftover, "r")
                if ref:
                    rm = cell_ref_match(ref)
                    if rm and len(rm.group(1)) <= 3 and len(rm.group(2)) <= 7:
                        col = _col_index(rm.group(1))
                        row = int(rm.group(2)) - 1
                    else:
                        col = next_col
                else:
                    col = next_col
            else:
                col = _col_index(ref.rstrip("0123456789"))
                row = int(ref.lstrip("ABCDEFGHIJKLMNOPQRSTUVWXYZ")) - 1
            if sref is None:
                sref = _attr_value(leftover, "s")
                if sref is not None and not sref.isdigit():
                    sref = None
            if t is None:
                t = _attr_value(leftover, "t")
        elif ref is not None:
            # regex-guaranteed [A-Z]{1,3}[0-9]{1,7}: split at the first digit
            if "A" <= ref[1] <= "Z":
                if "A" <= ref[2] <= "Z":
                    col = ((ord(ref[0]) - 64) * 26 + ord(ref[1]) - 64) * 26 \
                        + ord(ref[2]) - 65
                    row = int(ref[3:]) - 1
                else:
                    col = (ord(ref[0]) - 64) * 26 + ord(ref[1]) - 65
                    row = int(ref[2:]) - 1
            else:
                col = ord(ref[0]) - 65
                row = int(ref[1:]) - 1
        else:
            col = next_col
        next_col = col + 1
        s = int(sref) if sref is not None else None

        key = (row << 32) | col
        if t == "inlineStr":
            if body:
                if body.startswith("<is><t>") and body.endswith("</t></is>") \
                        and "<" not in (inner := body[7:-9]):
                    if "&" in inner or "\r" in inner:
                        inner = _decode_text(inner)
                    cells[key] = inner
                else:
                    tms = _T_INNER.findall(body)
                    if len(tms) != len(_T_ANY.findall(body)):
                        return None  # un-modeled <t ...> form in this cell
                    parts = []
                    for _ta, ttext in tms:
                        if ttext:
                            if "<" in ttext:
                                return None  # markup inside <t>
                            parts.append(_decode_text(ttext))
                    cells[key] = "".join(parts)
            else:
                cells[key] = ""
            if errors:
                errors.pop(key, None)
            continue
        # value types read from <v> text
        if body:
            if body.startswith("<v>") and body.endswith("</v>") \
                    and "<" not in (raw := body[3:-4]):
                if "&" in raw or "\r" in raw:
                    raw = _decode_text(raw)
            elif "<v" not in body:
                raw = ""  # e.g. formula-only cell: <f>...</f>
            else:
                vms = _V_INNER.findall(body)
                if len(vms) != len(_V_ANY.findall(body)):
                    return None
                raw = "".join(vtext for _va, vtext in vms if vtext)
                if "<" in raw:
                    return None  # markup inside <v>
                raw = _decode_text(raw)
        else:
            raw = ""
        if t == "s":
            if raw.isdigit():
                idx = int(raw)
                if idx < n_shared:
                    cells[key] = shared[idx]
                    if errors:
                        errors.pop(key, None)
        elif t == "str":
            cells[key] = raw
            if errors:
                errors.pop(key, None)
        elif t == "b":
            if raw:
                cells[key] = (
                    "TRUE" if raw.strip() in ("1", "true", "TRUE")
                    else "FALSE"
                )
                if errors:
                    errors.pop(key, None)
        elif t == "e":
            if raw:
                err = raw.strip()
                cells[key] = err
                errors[key] = err
        else:  # "n" or unknown explicit type: numeric
            if raw:
                # plain small integer (no sign/point/exponent/leading
                # zero): float->int->str round-trips to raw itself —
                # skip the conversions for the dominant cell type
                # isascii guard: isdigit() alone accepts e.g.
                # Arabic-Indic digits, which float() parses but which
                # would NOT round-trip back to raw
                if raw.isascii() and raw.isdigit() and raw[0] != "0" \
                        and len(raw) <= 15 \
                        and (s is None or s not in date_styles):
                    cells[key] = raw
                else:
                    try:
                        f = float(raw)
                    except ValueError:
                        cells[key] = raw
                    else:
                        if s is not None and s in date_styles:
                            cells[key] = _format_datetime(f)
                        else:
                            cells[key] = format_float(f)
                if errors:
                    errors.pop(key, None)

    if seen_rows != n_rows or seen_cells != n_cells:
        return None  # some row/cell didn't match the strict token shape
    return cells, errors


def parse_sheet_cells(
    xml: str, shared: list[str], date_styles: set[int]
) -> tuple[dict[int, str], dict[int, str]]:
    """sheetData cells -> ({row<<32 | col: formatted string},
    {row<<32 | col: error text}) — keys are packed ints (a two-int
    tuple key costs ~80B more per cell; see the memory note below).

    Cells are formatted to their final strings AT PARSE TIME (whole
    floats -> int, bools -> TRUE/FALSE, date serials -> ISO, xlsx.rs
    format_cell :184-237): a 210k-cell sheet otherwise holds a
    per-cell value tuple + boxed payload (~220 B/cell of pure Python
    object overhead) until a second formatting pass — measured ~40% of
    the 10 MB conversion's peak RSS. Error cells keep their text in the
    second map so the caller can emit MalformedSegment warnings with
    range-relative locations once the bounding box is known; a later
    write to the same cell ref clears any earlier error there (last
    write wins, exactly like the single-map design).
    """
    # Below ~64 KB the expat callback cost is small and the fast scan's
    # fixed costs (guard scans + validation parse) don't amortize —
    # measured ~5% SLOWER on ~1 KB corpus sheets, 1.35x faster at 10 MB
    if len(xml) >= _FAST_SCAN_MIN_BYTES:
        fast = _fast_sheet_cells(xml, shared, date_styles)
        if fast is not None:
            return fast
    # expat path: the semantic definition — one handler call per XML
    # event — nonlocal scalars instead of a state dict, branches ordered
    # by event frequency (c/v/t dominate; row is 1-per-row)
    cells: dict[int, str] = {}
    errors: dict[int, str] = {}
    row, col, next_col = 0, -1, 0
    t = s = None
    in_v = in_is_t = False
    # accumulators reused across cells (cleared, not reallocated)
    v: list[str] = []
    is_t: list[str] = []
    v_append, is_t_append = v.append, is_t.append
    v_clear, is_t_clear = v.clear, is_t.clear
    n_shared = len(shared)
    # raw-name handlers (parse_xml_events_raw): the qualified->local
    # memoization lives inline so expat calls these directly — one
    # Python call per element instead of two (~10% of the 10 MB path)
    local_names: dict[str, str] = {}

    def start(name, attrs):
        nonlocal row, col, next_col, t, s, in_v, in_is_t
        try:
            local = local_names[name]
        except KeyError:
            local = local_names[name] = name[name.rfind(":") + 1:]
        if local == "c":
            ref = attrs.get("r")
            if ref:
                m = _CELL_REF.match(ref)
                # spreadsheet bounds guard (Excel caps at XFD/1048576):
                # a malformed ref like AAAAAAA1 would otherwise produce a
                # col that bleeds into the packed key's row bits AND a
                # multi-billion-column bounding box in the grid loop
                if m and len(m.group(1)) <= 3 and len(m.group(2)) <= 7:
                    letters, digits = m.group(1, 2)
                    col = _col_index(letters)
                    row = int(digits) - 1
                else:
                    col = next_col
            else:
                col = next_col
            next_col = col + 1
            t = attrs.get("t", "n")
            sref = attrs.get("s")
            s = int(sref) if sref and sref.isdigit() else None
            v_clear()
            is_t_clear()
        elif local == "v":
            in_v = True
        elif local == "t":
            in_is_t = True
        elif local == "row":
            # mirror the cell-ref bounds guard: a crafted <row
            # r="99999999999"> would otherwise set a multi-billion-row
            # bounding box and an unbounded grid-building loop (Excel
            # caps rows at 1048576)
            r = attrs.get("r")
            row = (
                int(r) - 1
                if r and r.isdigit() and len(r) <= 7 and 0 < int(r) <= 1048576
                else row + 1
            )
            next_col = 0

    def text(data):
        if in_v:
            v_append(data)
        elif in_is_t:
            is_t_append(data)

    def end(name):
        nonlocal in_v, in_is_t
        try:
            local = local_names[name]
        except KeyError:
            local = local_names[name] = name[name.rfind(":") + 1:]
        if local == "v":
            in_v = False
        elif local == "c":
            raw = "".join(v)
            key = (row << 32) | col  # packed key: ~80B/cell cheaper than a tuple
            if t == "n":  # numeric: the default type, checked first
                if raw:
                    try:
                        f = float(raw)
                    except ValueError:
                        cells[key] = raw
                    else:
                        if s is not None and s in date_styles:
                            cells[key] = _format_datetime(f)
                        else:
                            cells[key] = format_float(f)
                    if errors:
                        errors.pop(key, None)
            elif t == "s":
                if raw.isdigit():
                    idx = int(raw)
                    if idx < n_shared:
                        cells[key] = shared[idx]
                        if errors:
                            errors.pop(key, None)
            elif t == "inlineStr":
                cells[key] = "".join(is_t)
                if errors:
                    errors.pop(key, None)
            elif t == "str":
                cells[key] = raw
                if errors:
                    errors.pop(key, None)
            elif t == "b":
                if raw:
                    cells[key] = (
                        "TRUE" if raw.strip() in ("1", "true", "TRUE")
                        else "FALSE"
                    )
                    if errors:
                        errors.pop(key, None)
            elif t == "e":
                if raw:
                    err = raw.strip()
                    cells[key] = err
                    errors[key] = err
            else:  # numeric ("n" or unknown explicit type)
                if raw:
                    try:
                        f = float(raw)
                    except ValueError:
                        cells[key] = raw
                    else:
                        if s is not None and s in date_styles:
                            cells[key] = _format_datetime(f)
                        else:
                            cells[key] = format_float(f)
                    if errors:
                        errors.pop(key, None)
        elif local == "t":
            in_is_t = False

    parse_xml_events_raw(xml, start, end, text)
    return cells, errors


def _format_cell(
    value: tuple | None, location: str, warnings: list[dict]
) -> str:
    if value is None:
        return ""
    kind, v = value
    if kind == "s":
        return v
    if kind == "f":
        return format_float(v)
    if kind == "b":
        return "TRUE" if v else "FALSE"
    if kind == "d":
        return _format_datetime(v)
    if kind == "e":
        warnings.append(warning(
            MALFORMED_SEGMENT, f"cell contains error: {v}", location
        ))
        return v
    return ""


def _sheet_targets(zf) -> list[tuple[str, str]]:
    """workbook.xml sheet order -> [(name, worksheet path)]."""
    workbook_xml = read_zip_text(zf, "xl/workbook.xml")
    if workbook_xml is None:
        raise MalformedDocument("missing xl/workbook.xml")
    rels_xml = read_zip_text(zf, "xl/_rels/workbook.xml.rels")
    rels = parse_relationships(rels_xml) if rels_xml is not None else {}

    sheets: list[tuple[str, str]] = []

    def start(local, attrs):
        if local == "sheet":
            name = attrs.get("name", "")
            rid = attr_suffix(attrs, "id")
            target = None
            if rid is not None and rid in rels:
                target = rels[rid][0]
            if target is None:
                target = f"worksheets/sheet{len(sheets) + 1}.xml"
            if target.startswith("/"):
                path = target[1:]
            elif target.startswith("xl/"):
                path = target
            else:
                path = f"xl/{target}"
            sheets.append((name, path))

    parse_xml_events(workbook_xml, start, lambda l: None, lambda d: None)
    return sheets


def parse_drawing_blips(xml: str) -> list[str]:
    """Drawing XML -> ordered blip relationship ids (xlsx.rs:130-160)."""
    rel_ids: list[str] = []

    def start(local, attrs):
        if local == "blip":
            rid = attr_suffix(attrs, "embed")
            if rid is not None:
                rel_ids.append(rid)

    parse_xml_events(xml, start, lambda l: None, lambda d: None)
    return rel_ids


def extract_sheet_images(zf, sheet_path: str) -> list[tuple[str, bytes]]:
    """(filename, bytes) for every image anchored on the sheet, via
    sheet rels -> drawing XML blips -> drawing rels -> media bytes
    (xlsx.rs extract_sheet_images :32-128)."""
    from anytomd_spark.kernels.markdown import (
        derive_rels_path,
        resolve_relative_path,
    )
    from anytomd_spark.kernels.ooxml import read_zip_bytes

    images: list[tuple[str, bytes]] = []
    sheet_rels_xml = read_zip_text(zf, derive_rels_path(sheet_path))
    if sheet_rels_xml is None:
        return images
    sheet_rels = parse_relationships(sheet_rels_xml)
    for target, _rel_type in sheet_rels.values():
        if "drawing" not in target:
            continue
        if target.startswith("/"):
            drawing_path = target[1:]
        elif target.startswith("../"):
            drawing_path = f"xl/{target[3:]}"
        else:
            drawing_path = f"xl/worksheets/{target}"
        drawing_xml = read_zip_text(zf, drawing_path)
        if drawing_xml is None:
            continue
        blip_ids = parse_drawing_blips(drawing_xml)
        if not blip_ids:
            continue
        drawing_rels_xml = read_zip_text(zf, derive_rels_path(drawing_path))
        if drawing_rels_xml is None:
            continue
        drawing_rels = parse_relationships(drawing_rels_xml)
        drawing_dir = drawing_path.rsplit("/", 1)[0] if "/" in drawing_path else ""
        for rel_id in blip_ids:
            rel = drawing_rels.get(rel_id)
            if rel is None:
                continue
            image_target = rel[0]
            if image_target.startswith("/"):
                image_path = image_target[1:]
            else:
                image_path = resolve_relative_path(drawing_dir, image_target)
            data = read_zip_bytes(zf, image_path)
            if data is not None:
                images.append((image_path.rsplit("/", 1)[-1], data))
    return images


def convert_xlsx(
    data: bytes,
    max_uncompressed_zip_bytes: int = 16 << 30,
    extract_images: bool = False,
    describer=None,
    max_image_bytes: int = 4 << 30,
) -> dict:
    from anytomd_spark.kernels.decode import RESOURCE_LIMIT_REACHED
    from anytomd_spark.kernels.ooxml import resolve_image_placeholders

    try:
        zf = open_zip(data)
    except Exception as e:
        raise MalformedDocument(f"invalid ZIP: {e}") from e
    warnings: list[dict] = []
    sections: list[str] = []
    plain_sections: list[str] = []
    need_image_bytes = extract_images or describer is not None
    images: list[tuple[str, bytes]] = []
    bytes_map: dict[str, bytes] = {}
    image_infos: list[dict] = []
    image_counter = 0
    total_image_bytes = 0
    with zf:
        validate_zip_budget(zf, max_uncompressed_zip_bytes)
        shared_xml = read_zip_text(zf, "xl/sharedStrings.xml")
        shared = parse_shared_strings(shared_xml) if shared_xml is not None else []
        styles_xml = read_zip_text(zf, "xl/styles.xml")
        date_styles = parse_date_styles(styles_xml) if styles_xml is not None else set()

        for name, path in _sheet_targets(zf):
            sheet_xml = read_zip_text(zf, path)
            if sheet_xml is None:
                warnings.append(warning(
                    SKIPPED_ELEMENT,
                    f"failed to read sheet '{name}': not found",
                    name,
                ))
                continue
            cells, cell_errors = parse_sheet_cells(
                sheet_xml, shared, date_styles
            )
            if not cells:
                continue
            # packed keys sort row-major: min/max key give the row bounds
            min_row = min(cells) >> 32
            max_row = max(cells) >> 32
            min_col = min(k & 0xFFFFFFFF for k in cells)
            max_col = max(k & 0xFFFFFFFF for k in cells)

            # warning locations are range-relative, like the reference's
            # enumerate() over calamine's trimmed range — emitted in
            # row-major grid order, exactly as the old per-cell pass did
            for k in sorted(cell_errors):
                r, c = k >> 32, k & 0xFFFFFFFF
                warnings.append(warning(
                    MALFORMED_SEGMENT,
                    f"cell contains error: {cell_errors[k]}",
                    f"{name}!{col_letter(c - min_col)}{r - min_row + 1}",
                ))

            # fused grid walk + render: one pass over the bounding box
            # emitting both tables, instead of materializing a row-list
            # grid and iterating it twice (build_table /
            # build_table_plain). Output is byte-identical to those
            # emitters for the equal-width rows a bounding box yields
            # (padding/truncation is a no-op); locked by the goldens and
            # test_xlsx_fast_scan's integration check.
            get = cells.get
            empty = ""
            cols = range(min_col, max_col + 1)
            md_parts: list[str] = []
            plain_parts: list[str] = []
            for r in range(min_row, max_row + 1):
                base = r << 32
                vals = [get(base | c, empty) for c in cols]
                md_parts.append(
                    "| " + " | ".join(map(escape_cell, vals)) + " |\n"
                )
                plain_parts.append("\t".join(vals))
                plain_parts.append("\n")
                if r == min_row:
                    md_parts.append("|" + "---|" * len(vals) + "\n")
            section = format_heading(2, name) + "".join(md_parts)
            plain_section = f"{name}\n" + "".join(plain_parts)

            if need_image_bytes:
                image_lines: list[str] = []
                plain_image_lines: list[str] = []
                for filename, img_data in extract_sheet_images(zf, path):
                    total_image_bytes += len(img_data)
                    if total_image_bytes <= max_image_bytes:
                        placeholder = f"__img_{image_counter}__"
                        image_counter += 1
                        image_infos.append({
                            "placeholder": placeholder,
                            "original_alt": "",
                            "filename": filename,
                            "bytes_key": placeholder,
                        })
                        image_lines.append(f"![{placeholder}]({filename})")
                        plain_image_lines.append(placeholder)
                        if extract_images:
                            images.append((filename, img_data))
                        bytes_map[placeholder] = img_data
                    else:
                        warnings.append(warning(
                            RESOURCE_LIMIT_REACHED,
                            f"total image bytes exceeded limit "
                            f"({max_image_bytes})",
                            filename,
                        ))
                if image_lines:
                    section += "\n" + "\n".join(image_lines)
                    plain_section += "\n" + "\n".join(plain_image_lines)

            sections.append(section)
            plain_sections.append(plain_section)

    markdown = "\n".join(sections)
    plain_text = "\n".join(plain_sections)
    markdown, plain_text = resolve_image_placeholders(
        markdown, plain_text, image_infos,
        image_bytes=bytes_map, describer=describer, warnings=warnings,
    )
    return {
        "markdown": markdown,
        "plain_text": plain_text,
        "title": None,
        "warnings": warnings,
        "images": images,
    }
