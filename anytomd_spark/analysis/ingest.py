"""Archive-shard corpus ingestion — the third real document SOURCE
format after parquet tables and WARC crawls (kernels/warc.py): training
corpora very often arrive as tar or zip shards (WebDataset layout,
Common Crawl derivative dumps, dataset exports), one archive blob per
row.

:func:`tar_extract` is the container->document edge: each shard blob is
opened with stdlib ``tarfile`` (plain tar and gzip-compressed tar via
``r:*`` autodetection), every regular member is converted to Markdown
by the SAME dispatcher the transcript pipeline uses
(kernels/convert.convert_bytes with the member extension as the hint),
and per-member errors are captured as rows rather than failing the
shard — one bad member in a million-member shard must not kill the
task. Archive-level corruption yields a single error row for the
shard. Map-side mapInPandas over the blob column; no shuffle.
"""

from __future__ import annotations

import io
import tarfile
import zipfile

import pandas as pd
from pyspark.sql import DataFrame

from anytomd_spark.kernels import convert as C
from anytomd_spark.kernels.ooxml import InputTooLarge

TAR_DOCS_SCHEMA = (
    "shard_id long, member string, fmt string, n_bytes long, "
    "markdown string, error string"
)

_EXT_FMT = {"txt": "txt", "md": "txt", "csv": "csv", "html": "html",
            "htm": "html", "json": "json", "xml": "xml", "ipynb": "ipynb",
            "docx": "docx", "pptx": "pptx", "xlsx": "xlsx", "xls": "xls"}


def _fmt_of(ext: str) -> str:
    from anytomd_spark.kernels import sniff

    if ext in _EXT_FMT:
        return _EXT_FMT[ext]
    if ext in sniff.CODE_EXTS:
        return "code"
    return ext


def tar_extract(
    shards: DataFrame,
    shard_col: str = "shard_id",
    payload_col: str = "payload",
    max_members: int = 1 << 20,
) -> DataFrame:
    """One row per regular archive member: (shard_id, member, fmt,
    n_bytes, markdown, error)."""

    def run(iterator):
        for pdf in iterator:
            rows = []
            for shard_id, payload in zip(pdf[shard_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:*")
                except (tarfile.TarError, EOFError, OSError) as e:
                    rows.append((int(shard_id), None, None, None, None,
                                 f"bad archive: {e}"))
                    continue
                n_seen = 0
                with tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        n_seen += 1
                        if n_seen > max_members:
                            rows.append((int(shard_id), None, None, None,
                                         None,
                                         f"member count exceeds "
                                         f"{max_members}"))
                            break
                        try:
                            body = tf.extractfile(m).read()
                        except (tarfile.TarError, OSError) as e:
                            rows.append((int(shard_id), m.name, None, None,
                                         None, f"bad member: {e}"))
                            continue
                        ext = (m.name.rsplit(".", 1)[-1].lower()
                               if "." in m.name else "txt")
                        try:
                            r = C.convert_bytes(body, ext)
                            rows.append((
                                int(shard_id), m.name, _fmt_of(ext),
                                len(body), r["markdown"], None,
                            ))
                        except (C.MalformedDocument, InputTooLarge,
                                ValueError) as e:
                            rows.append((int(shard_id), m.name,
                                         _fmt_of(ext), len(body), None,
                                         str(e)))
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "member", "fmt", "n_bytes",
                         "markdown", "error"],
            )

    return shards.mapInPandas(run, schema=TAR_DOCS_SCHEMA)


def zip_extract(
    shards: DataFrame,
    shard_col: str = "shard_id",
    payload_col: str = "payload",
    max_members: int = 1 << 20,
) -> DataFrame:
    """The zip twin of :func:`tar_extract`: same output schema, same
    fail-soft row semantics, stdlib zipfile. Encrypted members and
    per-member decompression errors become error rows."""

    def run(iterator):
        for pdf in iterator:
            rows = []
            for shard_id, payload in zip(pdf[shard_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    zf = zipfile.ZipFile(io.BytesIO(data))
                except (zipfile.BadZipFile, OSError, EOFError) as e:
                    rows.append((int(shard_id), None, None, None, None,
                                 f"bad archive: {e}"))
                    continue
                with zf:
                    infos = [zi for zi in zf.infolist()
                             if not zi.is_dir()][:max_members]
                    for zi in infos:
                        try:
                            body = zf.read(zi.filename)
                        except (zipfile.BadZipFile, RuntimeError,
                                NotImplementedError, OSError) as e:
                            rows.append((int(shard_id), zi.filename, None,
                                         None, None, f"bad member: {e}"))
                            continue
                        ext = (zi.filename.rsplit(".", 1)[-1].lower()
                               if "." in zi.filename else "txt")
                        try:
                            r = C.convert_bytes(body, ext)
                            rows.append((
                                int(shard_id), zi.filename, _fmt_of(ext),
                                len(body), r["markdown"], None,
                            ))
                        except (C.MalformedDocument, InputTooLarge,
                                ValueError) as e:
                            rows.append((int(shard_id), zi.filename,
                                         _fmt_of(ext), len(body), None,
                                         str(e)))
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "member", "fmt", "n_bytes",
                         "markdown", "error"],
            )

    return shards.mapInPandas(run, schema=TAR_DOCS_SCHEMA)


def build_zip(members: list[tuple[str, bytes]],
              compressed: bool = True) -> bytes:
    """In-memory zip with pinned timestamps (deterministic bytes)."""
    buf = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compressed else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", compression=comp) as zf:
        for name, body in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = comp
            zf.writestr(zi, body)
    return buf.getvalue()



# --------------------------------------------------------------------------
# deterministic synthetic shards (tests + driver oracle)
# --------------------------------------------------------------------------

def build_tar(members: list[tuple[str, bytes]], gzipped: bool = False) -> bytes:
    """In-memory tar (optionally .tar.gz) from (name, bytes) members,
    with pinned metadata (member mtime 0; gzip wrapped manually with
    mtime=0) so the bytes are fully deterministic."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, body in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(body)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(body))
    raw = buf.getvalue()
    if not gzipped:
        return raw
    import gzip

    out = io.BytesIO()
    with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return out.getvalue()


def tar_shard_payloads(n_shards: int = 8, members_per: int = 6) -> list[dict]:
    """Deterministic tar shards + per-member structural truth. Member
    contents are pure functions of (shard, index) in the three
    SQL-reproducible formats (txt passthrough, python code fence, CSV
    table), so the driver oracle rebuilds every member's expected
    Markdown from those two integers — same pattern as derive.py's
    transcript payloads. Odd shards are gzip-compressed."""
    shards = []
    for s in range(n_shards):
        members = []
        truth = []
        for i in range(members_per):
            kind = i % 3
            if kind == 0:
                name = f"doc_{i:03d}.txt"
                body = f"shard {s} member {i} plain text".encode()
            elif kind == 1:
                name = f"doc_{i:03d}.py"
                body = f"print('shard {s} member {i}')\n".encode()
            else:
                name = f"doc_{i:03d}.csv"
                body = f"shard,member\n{s},{i}\n".encode()
            members.append((name, body))
            truth.append({"member": name, "kind": kind, "s": s, "i": i,
                          "n_bytes": len(body)})
        payload = build_tar(members, gzipped=(s % 2 == 1))
        shards.append({"shard_id": s, "payload": payload,
                       "members": truth})
    return shards


def synthesize_tar_shards(spark, n_shards: int = 8,
                          members_per: int = 6) -> DataFrame:
    rows = [
        (r["shard_id"], bytearray(r["payload"]))
        for r in tar_shard_payloads(n_shards, members_per)
    ]
    pdf = pd.DataFrame(rows, columns=["shard_id", "payload"])
    return spark.createDataFrame(pdf, schema="shard_id long, payload binary")
