"""ctypes loader for the native HTML fast path (_html_fast.c).

Compiles the C twin on first import (cached in a temp dir keyed by the
md5 of the C source, so a changed kernel never reuses a stale .so) and
exposes :func:`convert_html_native`, which returns ``None`` whenever the
native walker declines — build unavailable, input contains ``&``
(html.unescape must run, Python path), or the C side bailed on a
construct outside its verified envelope.  The caller falls back to the
pure-Python walker in every ``None`` case, so this module can only make
conversion faster, never different: byte-parity on the accepted domain
is locked by tests/test_html_native.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_html_fast.c")

_lib = None
_tried = False


def _build() -> "ctypes.CDLL | None":
    try:
        with open(_C_SRC, "rb") as f:
            src = f.read()
        token = hashlib.md5(src).hexdigest()[:16]
        so_path = os.path.join(
            tempfile.gettempdir(), f"anytomd_html_fast_{token}.so"
        )
        if not os.path.exists(so_path):
            tmp = so_path + f".build{os.getpid()}"
            subprocess.run(
                ["cc", "-O2", "-fPIC", "-shared", "-o", tmp, _C_SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so_path)  # atomic: concurrent builders race safely
        lib = ctypes.CDLL(so_path)
        lib.html_convert.restype = ctypes.c_int
        lib.html_convert.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.html_free.restype = None
        lib.html_free.argtypes = [ctypes.c_char_p]
        return lib
    except Exception:
        return None


def _get_lib():
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib


# reusable scratch out-params: the worker calls this once per document
# from a single thread, and constructing 7 ctypes objects + 8 byrefs per
# call measured ~27 us each at bench volume
_md = ctypes.c_char_p()
_mdn = ctypes.c_size_t()
_pl = ctypes.c_char_p()
_pln = ctypes.c_size_t()
_ti = ctypes.c_char_p()
_tin = ctypes.c_size_t()
_has_ti = ctypes.c_int()
_ARGS = None


def convert_html_native(text: str) -> "dict | None":
    """Native conversion of ``text`` (BOM already stripped), or ``None``
    when the Python walker must run instead."""
    if "&" in text:  # html.unescape must apply; identity only without '&'
        return None
    if len(text) > (1 << 20):
        # the C walker trades memory for speed (growable output buffers
        # with doubling, whole-buffer copies at heading/link close); the
        # Python walker carries the audited marginal-peak bound
        # (test_chaos::test_near_limit_turn_in_memory_capped_worker), so
        # multi-MB documents stay on it — the native win is throughput
        # on the many-small-docs shape, not single-giant-doc latency
        return None
    lib = _get_lib()
    if lib is None:
        return None
    global _ARGS
    if _ARGS is None:
        _ARGS = (
            ctypes.byref(_md), ctypes.byref(_mdn),
            ctypes.byref(_pl), ctypes.byref(_pln),
            ctypes.byref(_ti), ctypes.byref(_tin),
            ctypes.byref(_has_ti),
        )
    data = text.encode("utf-8")
    md, mdn, pl, pln, ti, tin, has_ti = (
        _md, _mdn, _pl, _pln, _ti, _tin, _has_ti
    )
    rc = lib.html_convert(data, len(data), *_ARGS)
    if rc != 0:
        return None  # 1 = oom, 2 = bail -> Python path
    try:
        markdown = ctypes.string_at(md, mdn.value).decode("utf-8")
        plain = ctypes.string_at(pl, pln.value).decode("utf-8")
        title = (
            ctypes.string_at(ti, tin.value).decode("utf-8")
            if has_ti.value
            else None
        )
    finally:
        lib.html_free(md)
        lib.html_free(pl)
        if has_ti.value:
            lib.html_free(ti)
    return {
        "markdown": markdown,
        "plain_text": plain,
        "title": title,
        "warnings": [],
    }
