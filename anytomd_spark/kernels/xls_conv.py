"""Legacy .xls (BIFF8) to Markdown conversion kernel.

The reference reads .xls through calamine's auto-detecting workbook opener
(``/root/reference/src/converter/xlsx.rs:260``) and then renders sheets
exactly like .xlsx. Python has no maintained stdlib-free BIFF reader, so
this module implements the minimal subset needed for parity: an OLE2
compound-file walker to locate the ``Workbook``/``Book`` stream, and a
BIFF8 record parser covering BOUNDSHEET, SST (+CONTINUE), LABELSST,
LABEL/RSTRING, NUMBER, RK, MULRK, BOOLERR, FORMULA/STRING, plus XF/FORMAT
for date detection. Rendering reuses the xlsx cell-format semantics
(whole floats -> int, TRUE/FALSE, ``YYYY-MM-DD[ HH:MM:SS]``).
"""

from __future__ import annotations

import struct

from anytomd_spark.kernels.markdown import (
    build_table,
    build_table_plain,
    format_heading,
)
from anytomd_spark.kernels.simple import MalformedDocument
from anytomd_spark.kernels.xlsx_conv import (
    _BUILTIN_DATE_FMTS,
    _DATE_TOKEN,
    _format_cell,
)

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE

import re as _re


# --------------------------------------------------------------------------
# OLE2 compound document
# --------------------------------------------------------------------------

def _read_ole_stream(data: bytes, wanted_names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name is in wanted_names."""
    if not data.startswith(OLE_MAGIC):
        raise MalformedDocument("not an OLE2 compound document")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    sector_size = 1 << sector_shift
    mini_size = 1 << mini_shift
    num_fat_sectors = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    num_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    num_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(idx: int) -> bytes:
        off = 512 + idx * sector_size
        return data[off: off + sector_size]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    next_difat = first_difat
    for _ in range(num_difat):
        if next_difat in (_FREESECT, _ENDOFCHAIN):
            break
        sec = sector(next_difat)
        entries = struct.unpack(f"<{sector_size // 4}I", sec)
        difat.extend(entries[:-1])
        next_difat = entries[-1]

    fat: list[int] = []
    for fat_sec in difat[:num_fat_sectors]:
        if fat_sec in (_FREESECT, _ENDOFCHAIN):
            continue
        fat.extend(struct.unpack(f"<{sector_size // 4}I", sector(fat_sec)))

    def read_chain(start: int, limit: int | None = None) -> bytes:
        out = []
        idx = start
        seen = 0
        while idx not in (_ENDOFCHAIN, _FREESECT) and idx < len(fat):
            out.append(sector(idx))
            idx = fat[idx]
            seen += 1
            if seen > len(fat) + 1:
                raise MalformedDocument("FAT chain loop")
        blob = b"".join(out)
        return blob[:limit] if limit is not None else blob

    directory = read_chain(first_dir)

    # MiniFAT + mini stream (root entry holds the ministream chain)
    minifat: list[int] = []
    idx = first_minifat
    for _ in range(num_minifat):
        if idx in (_FREESECT, _ENDOFCHAIN):
            break
        minifat.extend(struct.unpack(f"<{sector_size // 4}I", sector(idx)))
        idx = fat[idx] if idx < len(fat) else _ENDOFCHAIN

    root_start = root_size = None
    target_start = target_size = None
    for off in range(0, len(directory) - 127, 128):
        entry = directory[off: off + 128]
        name_len = struct.unpack_from("<H", entry, 64)[0]
        if name_len < 2:
            continue
        name = entry[: name_len - 2].decode("utf-16-le", errors="replace")
        obj_type = entry[66]
        start = struct.unpack_from("<I", entry, 116)[0]
        size = struct.unpack_from("<Q", entry, 120)[0] & 0xFFFFFFFF
        if obj_type == 5:
            root_start, root_size = start, size
        elif obj_type == 2 and target_start is None and name in wanted_names:
            target_start, target_size = start, size

    if target_start is None:
        raise MalformedDocument("Workbook stream not found in OLE2 file")

    if target_size >= mini_cutoff:
        return read_chain(target_start, target_size)

    if root_start is None:
        raise MalformedDocument("OLE2 root entry missing")
    ministream = read_chain(root_start, root_size)
    out = []
    idx = target_start
    remaining = target_size
    while idx not in (_ENDOFCHAIN, _FREESECT) and remaining > 0 and idx < len(minifat):
        chunk = ministream[idx * mini_size: idx * mini_size + mini_size]
        out.append(chunk[:remaining] if remaining < mini_size else chunk)
        remaining -= mini_size
        idx = minifat[idx]
    return b"".join(out)[:target_size]


# --------------------------------------------------------------------------
# BIFF8 records
# --------------------------------------------------------------------------

def _iter_records(stream: bytes, start: int = 0):
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        opcode, length = struct.unpack_from("<HH", stream, pos)
        payload = stream[pos + 4: pos + 4 + length]
        yield pos, opcode, payload
        pos += 4 + length


def _read_unicode_string(buf: bytes, pos: int, short: bool = False) -> tuple[str, int]:
    """XLUnicodeString: [u8|u16] cch, u8 grbit, chars, rich/ext tails."""
    if short:
        cch = buf[pos]
        pos += 1
    else:
        cch = struct.unpack_from("<H", buf, pos)[0]
        pos += 2
    grbit = buf[pos]
    pos += 1
    high_byte = grbit & 0x01
    ext_st = grbit & 0x04
    rich_st = grbit & 0x08
    c_run = 0
    cb_ext = 0
    if rich_st:
        c_run = struct.unpack_from("<H", buf, pos)[0]
        pos += 2
    if ext_st:
        cb_ext = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
    if high_byte:
        raw = buf[pos: pos + 2 * cch]
        text = raw.decode("utf-16-le", errors="replace")
        pos += 2 * cch
    else:
        raw = buf[pos: pos + cch]
        text = "".join(chr(b) for b in raw)  # compressed = Latin-1 low bytes
        pos += cch
    pos += 4 * c_run + cb_ext
    return text, pos


class _SstReader:
    """SST payload spliced with CONTINUE records.

    At each CONTINUE boundary an in-progress string restarts with a fresh
    grbit byte; this reader tracks segment boundaries to honor that.
    """

    def __init__(self, segments: list[bytes]) -> None:
        self.segments = segments
        self.seg = 0
        self.pos = 0

    def _remaining_in_seg(self) -> int:
        return len(self.segments[self.seg]) - self.pos

    def _advance_seg(self) -> None:
        self.seg += 1
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0 and self.seg < len(self.segments):
            avail = self._remaining_in_seg()
            if avail == 0:
                self._advance_seg()
                continue
            take = min(avail, n)
            out += self.segments[self.seg][self.pos: self.pos + take]
            self.pos += take
            n -= take
        return out

    def read_u8(self) -> int:
        return self.read(1)[0]

    def read_u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def read_string(self) -> str:
        cch = self.read_u16()
        grbit = self.read_u8()
        c_run = 0
        cb_ext = 0
        if grbit & 0x08:
            c_run = self.read_u16()
        if grbit & 0x04:
            cb_ext = self.read_u32()
        chars: list[str] = []
        remaining = cch
        high = grbit & 0x01
        while remaining > 0:
            if self.seg < len(self.segments) and self._remaining_in_seg() == 0:
                self._advance_seg()
                if self.seg >= len(self.segments):
                    break
                high = self.read_u8() & 0x01  # fresh grbit at continuation
                continue
            avail = self._remaining_in_seg()
            if high:
                take = min(remaining, avail // 2)
                if take == 0:
                    # odd split: byte straddles boundary (not produced by
                    # real writers) — bail out
                    break
                raw = self.read(2 * take)
                chars.append(raw.decode("utf-16-le", errors="replace"))
            else:
                take = min(remaining, avail)
                raw = self.read(take)
                chars.append("".join(chr(b) for b in raw))
            remaining -= take
        self.read(4 * c_run + cb_ext)
        return "".join(chars)


def _rk_value(rk: int) -> float:
    """Decode a 32-bit RK number: bit0 = /100, bit1 = 30-bit signed int
    else top 30 bits are the high bits of an IEEE double."""
    cent = rk & 0x01
    if rk & 0x02:
        iv = rk >> 2
        if rk & 0x80000000:  # sign-extend the 30-bit integer
            iv -= 1 << 30
        val = float(iv)
    else:
        val = struct.unpack(
            "<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC)
        )[0]
    return val / 100.0 if cent else val


def parse_xls(data: bytes) -> list[tuple[str, dict[tuple[int, int], tuple]]]:
    """-> [(sheet_name, {(row, col): value-tuple})] in BOUNDSHEET order."""
    stream = _read_ole_stream(data, ("Workbook", "Book"))

    sheets: list[tuple[str, int]] = []  # (name, substream offset)
    sst: list[str] = []
    xf_fmt_ids: list[int] = []
    custom_date_fmts: set[int] = set()

    # --- globals substream ---
    pending_sst: list[bytes] | None = None
    for pos, opcode, payload in _iter_records(stream):
        if opcode == 0x0085:  # BOUNDSHEET
            offset = struct.unpack_from("<I", payload, 0)[0]
            name, _ = _read_unicode_string(payload, 6, short=True)
            sheets.append((name, offset))
        elif opcode == 0x00FC:  # SST
            pending_sst = [payload]
        elif opcode == 0x003C and pending_sst is not None:  # CONTINUE
            pending_sst.append(payload)
        elif opcode == 0x00E0:  # XF
            if len(payload) >= 4:
                xf_fmt_ids.append(struct.unpack_from("<H", payload, 2)[0])
        elif opcode == 0x041E:  # FORMAT
            fmt_id = struct.unpack_from("<H", payload, 0)[0]
            code, _ = _read_unicode_string(payload, 2)
            cleaned = _re.sub(r"\[[^\]]*\]|\"[^\"]*\"|\\.", "", code)
            if _DATE_TOKEN.search(cleaned):
                custom_date_fmts.add(fmt_id)
        elif opcode == 0x000A and sheets:  # EOF of globals
            break
        elif pending_sst is not None and opcode != 0x003C:
            # SST fully read once a non-CONTINUE record follows
            pass

    if pending_sst is not None:
        reader = _SstReader(pending_sst)
        reader.read_u32()  # total refs
        unique = reader.read_u32()
        for _ in range(unique):
            try:
                sst.append(reader.read_string())
            except (IndexError, struct.error):
                break

    date_xfs = {
        i for i, fmt in enumerate(xf_fmt_ids)
        if fmt in _BUILTIN_DATE_FMTS or fmt in custom_date_fmts
    }

    def is_date_xf(xf: int) -> bool:
        return xf in date_xfs

    result = []
    for name, offset in sheets:
        cells: dict[tuple[int, int], tuple] = {}
        pending_formula_cell: tuple[int, int] | None = None
        depth = 0
        for pos, opcode, payload in _iter_records(stream, offset):
            if opcode == 0x0809:  # BOF
                depth += 1
                continue
            if opcode == 0x000A:  # EOF
                depth -= 1
                if depth <= 0:
                    break
                continue
            try:
                if opcode == 0x00FD:  # LABELSST
                    row, col, _xf, isst = struct.unpack_from("<HHHI", payload, 0)
                    if isst < len(sst):
                        cells[(row, col)] = ("s", sst[isst])
                elif opcode in (0x0204, 0x00D6):  # LABEL / RSTRING
                    row, col, _xf = struct.unpack_from("<HHH", payload, 0)
                    text, _ = _read_unicode_string(payload, 6)
                    cells[(row, col)] = ("s", text)
                elif opcode == 0x0203:  # NUMBER
                    row, col, xf = struct.unpack_from("<HHH", payload, 0)
                    val = struct.unpack_from("<d", payload, 6)[0]
                    cells[(row, col)] = ("d" if is_date_xf(xf) else "f", val)
                elif opcode == 0x027E:  # RK
                    row, col, xf, rk = struct.unpack_from("<HHHI", payload, 0)
                    cells[(row, col)] = ("d" if is_date_xf(xf) else "f", _rk_value(rk))
                elif opcode == 0x00BD:  # MULRK
                    row, col_first = struct.unpack_from("<HH", payload, 0)
                    col_last = struct.unpack_from("<H", payload, len(payload) - 2)[0]
                    p = 4
                    for c in range(col_first, col_last + 1):
                        xf, rk = struct.unpack_from("<HI", payload, p)
                        p += 6
                        cells[(row, c)] = (
                            "d" if is_date_xf(xf) else "f", _rk_value(rk)
                        )
                elif opcode == 0x0205:  # BOOLERR
                    row, col, _xf, val, is_err = struct.unpack_from("<HHHBB", payload, 0)
                    if is_err:
                        cells[(row, col)] = ("e", _BIFF_ERRORS.get(val, f"#ERR{val}"))
                    else:
                        cells[(row, col)] = ("b", bool(val))
                elif opcode == 0x0006:  # FORMULA
                    row, col, xf = struct.unpack_from("<HHH", payload, 0)
                    res = payload[6:14]
                    if res[6:8] == b"\xff\xff":
                        kind = res[0]
                        if kind == 0:
                            pending_formula_cell = (row, col)
                        elif kind == 1:
                            cells[(row, col)] = ("b", bool(res[2]))
                        elif kind == 2:
                            cells[(row, col)] = (
                                "e", _BIFF_ERRORS.get(res[2], f"#ERR{res[2]}")
                            )
                    else:
                        val = struct.unpack("<d", res)[0]
                        cells[(row, col)] = ("d" if is_date_xf(xf) else "f", val)
                elif opcode == 0x0207 and pending_formula_cell is not None:  # STRING
                    text, _ = _read_unicode_string(payload, 0)
                    cells[pending_formula_cell] = ("s", text)
                    pending_formula_cell = None
            except (IndexError, struct.error):
                continue
        result.append((name, cells))
    return result


_BIFF_ERRORS = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A",
}


def convert_xls(data: bytes) -> dict:
    """Render BIFF8 sheets with the same layout as convert_xlsx."""
    warnings: list[dict] = []
    sections: list[str] = []
    plain_sections: list[str] = []
    from anytomd_spark.kernels.xlsx_conv import col_letter

    for name, cells in parse_xls(data):
        if not cells:
            continue
        min_row = min(k[0] for k in cells)
        max_row = max(k[0] for k in cells)
        min_col = min(k[1] for k in cells)
        max_col = max(k[1] for k in cells)
        # location strings are only consumed by error-cell warnings —
        # build them lazily (same treatment as convert_xlsx)
        col_letters = [col_letter(i) for i in range(max_col - min_col + 1)]
        grid: list[list[str]] = []
        get = cells.get
        for r in range(min_row, max_row + 1):
            row_label = r - min_row + 1
            row_out = []
            for i, c in enumerate(range(min_col, max_col + 1)):
                val = get((r, c))
                if val is None:
                    row_out.append("")
                elif val[0] == "e":
                    row_out.append(_format_cell(
                        val, f"{name}!{col_letters[i]}{row_label}", warnings
                    ))
                else:
                    row_out.append(_format_cell(val, "", warnings))
            grid.append(row_out)
        headers, data_rows = grid[0], grid[1:]
        sections.append(format_heading(2, name) + build_table(headers, data_rows))
        plain_sections.append(f"{name}\n" + build_table_plain(headers, data_rows))

    return {
        "markdown": "\n".join(sections),
        "plain_text": "\n".join(plain_sections),
        "title": None,
        "warnings": warnings,
    }
