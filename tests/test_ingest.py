"""Tar-shard ingestion tests: member extraction across plain/gzip tars,
per-member error capture, archive corruption, non-regular members,
plan shape, generator truth."""

import io
import tarfile

import pytest

pyspark = pytest.importorskip("pyspark")

from anytomd_spark.analysis.ingest import (  # noqa: E402
    build_tar,
    synthesize_tar_shards,
    tar_extract,
    tar_shard_payloads,
)
from anytomd_spark.pipeline import build_session  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    s = build_session(master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()


def _shards_df(spark, rows):
    import pandas as pd

    pdf = pd.DataFrame(
        [(i, bytearray(p)) for i, p in rows],
        columns=["shard_id", "payload"],
    )
    return spark.createDataFrame(pdf, schema="shard_id long, payload binary")


class TestExtraction:
    def test_members_convert_per_format(self, spark):
        tar = build_tar([
            ("a.txt", b"hello world"),
            ("b.py", b"print('x')\n"),
            ("c.csv", b"a,b\n1,2\n"),
        ])
        out = {r["member"]: r for r in
               tar_extract(_shards_df(spark, [(0, tar)])).collect()}
        assert out["a.txt"]["markdown"] == "hello world"
        assert out["a.txt"]["fmt"] == "txt"
        assert out["b.py"]["markdown"] == "```python\nprint('x')\n```\n"
        assert out["b.py"]["fmt"] == "code"
        assert out["c.csv"]["markdown"].startswith("| a | b |")
        assert all(r["error"] is None for r in out.values())

    def test_gzip_and_plain_shards(self, spark):
        members = [("x.txt", b"content")]
        rows = [(0, build_tar(members)), (1, build_tar(members, gzipped=True))]
        out = tar_extract(_shards_df(spark, rows)).collect()
        assert len(out) == 2
        assert {r["shard_id"] for r in out} == {0, 1}
        assert all(r["markdown"] == "content" for r in out)

    def test_per_member_error_does_not_kill_shard(self, spark):
        tar = build_tar([
            ("ok.txt", b"fine"),
            ("doc.pdf", b"%PDF-1.4 not really"),
            ("also_ok.txt", b"fine too"),
        ])
        out = {r["member"]: r for r in
               tar_extract(_shards_df(spark, [(0, tar)])).collect()}
        assert out["ok.txt"]["error"] is None
        assert out["also_ok.txt"]["error"] is None
        assert out["doc.pdf"]["error"] is not None
        assert out["doc.pdf"]["markdown"] is None

    def test_archive_corruption_yields_one_error_row(self, spark):
        rows = [(0, b"not a tar at all" * 10), (1, build_tar([("a.txt", b"x")]))]
        out = tar_extract(_shards_df(spark, rows)).collect()
        bad = [r for r in out if r["shard_id"] == 0]
        assert len(bad) == 1 and "bad archive" in bad[0]["error"]
        good = [r for r in out if r["shard_id"] == 1]
        assert len(good) == 1 and good[0]["error"] is None

    def test_non_regular_members_skipped(self, spark):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            d = tarfile.TarInfo("subdir")
            d.type = tarfile.DIRTYPE
            tf.addfile(d)
            ln = tarfile.TarInfo("link.txt")
            ln.type = tarfile.SYMTYPE
            ln.linkname = "a.txt"
            tf.addfile(ln)
            f = tarfile.TarInfo("real.txt")
            body = b"data"
            f.size = len(body)
            tf.addfile(f, io.BytesIO(body))
        out = tar_extract(_shards_df(spark, [(0, buf.getvalue())])).collect()
        assert [r["member"] for r in out] == ["real.txt"]

    def test_extensionless_member_treated_as_txt(self, spark):
        tar = build_tar([("README", b"plain body")])
        out = tar_extract(_shards_df(spark, [(0, tar)])).collect()
        assert out[0]["fmt"] == "txt" and out[0]["markdown"] == "plain body"

    def test_map_only_plan(self, spark):
        df = tar_extract(synthesize_tar_shards(spark, n_shards=2))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_warning_telemetry_first_class(self, spark):
        # cp1252 bytes in a .txt member -> decode warning surfaces as
        # n_warnings, the same best-effort telemetry as the transcript
        # pipeline (reference src/converter/mod.rs:70-78)
        tar = build_tar([("latin.txt", b"caf\xe9 au lait"),
                         ("clean.txt", b"just ascii")])
        out = {r["member"]: r for r in
               tar_extract(_shards_df(spark, [(0, tar)])).collect()}
        assert out["latin.txt"]["n_warnings"] >= 1
        assert out["clean.txt"]["n_warnings"] == 0
        assert out["latin.txt"]["error"] is None


class TestMagicFirstDetection:
    """Members with unknown/missing extensions sniff content before
    defaulting to txt (reference priority, src/detection.rs:18-48)."""

    def test_bin_member_with_json_bytes(self, spark):
        tar = build_tar([("payload.bin", b'{"k": [1, 2]}')])
        out = tar_extract(_shards_df(spark, [(0, tar)])).collect()
        assert out[0]["fmt"] == "json"
        assert out[0]["markdown"].startswith("```json\n")

    def test_extensionless_member_with_html_bytes(self, spark):
        from anytomd_spark.analysis.ingest import build_zip, zip_extract

        z = build_zip([("page", b"<html><body><p>hi</p></body></html>")])
        out = zip_extract(_shards_df(spark, [(0, z)])).collect()
        assert out[0]["fmt"] == "html"
        assert "hi" in out[0]["markdown"]

    def test_bin_member_with_xml_bytes(self, spark):
        tar = build_tar([("conf.bin", b"<?xml version='1.0'?><a><b/></a>")])
        out = tar_extract(_shards_df(spark, [(0, tar)])).collect()
        assert out[0]["fmt"] == "xml"

    def test_plain_zip_container_member_errors_loudly(self, spark):
        from anytomd_spark.analysis.ingest import build_zip

        inner = build_zip([("x.txt", b"inner")])
        tar = build_tar([("nested.bin", inner)])
        out = tar_extract(_shards_df(spark, [(0, tar)])).collect()
        assert out[0]["fmt"] == "zip"
        assert "unsupported format" in out[0]["error"]

    def test_known_extension_still_wins(self, spark):
        # '.txt' is a known extension: no sniffing, JSON bytes stay text
        tar = build_tar([("notes.txt", b'{"not": "json-dispatched"}')])
        out = tar_extract(_shards_df(spark, [(0, tar)])).collect()
        assert out[0]["fmt"] == "txt"


class TestMemberBudgets:
    """Pre-decompression size budgets (the OOXML validate_zip_budget
    posture applied to the shard edge): declared sizes checked BEFORE
    any member bytes are read/inflated."""

    def test_tar_member_over_budget_is_error_row(self, spark):
        tar = build_tar([("big.txt", b"x" * 5000), ("ok.txt", b"fine")])
        out = {r["member"]: r for r in tar_extract(
            _shards_df(spark, [(0, tar)]), max_member_bytes=1000).collect()}
        assert "exceeds budget" in out["big.txt"]["error"]
        assert out["big.txt"]["n_bytes"] == 5000  # declared size reported
        assert out["big.txt"]["markdown"] is None
        assert out["ok.txt"]["error"] is None

    def test_zip_member_over_budget_is_error_row(self, spark):
        from anytomd_spark.analysis.ingest import build_zip, zip_extract

        z = build_zip([("big.txt", b"y" * 5000), ("ok.txt", b"fine")])
        out = {r["member"]: r for r in zip_extract(
            _shards_df(spark, [(0, z)]), max_member_bytes=1000).collect()}
        assert "exceeds budget" in out["big.txt"]["error"]
        assert out["ok.txt"]["error"] is None

    def test_zip_bomb_rejected_without_inflation(self, spark):
        # 512 MiB of zeros deflates to ~0.5 MiB; the central-directory
        # size check must reject it without paying decompression
        import time

        from anytomd_spark.analysis.ingest import build_zip, zip_extract

        bomb = build_zip([("zeros.txt", b"\x00" * (512 << 20))])
        assert len(bomb) < (4 << 20)
        df = _shards_df(spark, [(0, bomb)])
        t0 = time.time()
        out = zip_extract(df, max_member_bytes=64 << 20).collect()
        elapsed = time.time() - t0
        assert len(out) == 1 and "exceeds budget" in out[0]["error"]
        assert elapsed < 10, f"bomb reject took {elapsed:.1f}s"


class TestZipTruncation:
    def test_member_cap_emits_explicit_error_row(self, spark):
        from anytomd_spark.analysis.ingest import build_zip, zip_extract

        z = build_zip([(f"m{i}.txt", b"x") for i in range(5)])
        out = zip_extract(_shards_df(spark, [(0, z)]), max_members=3).collect()
        ok = [r for r in out if r["error"] is None]
        err = [r for r in out if r["error"] is not None]
        assert len(ok) == 3
        assert len(err) == 1 and "member count exceeds 3" in err[0]["error"]

    def test_tar_member_cap_matches(self, spark):
        z = build_tar([(f"m{i}.txt", b"x") for i in range(5)])
        out = tar_extract(_shards_df(spark, [(0, z)]), max_members=3).collect()
        assert sum(r["error"] is None for r in out) == 3
        assert any(r["error"] and "member count exceeds 3" in r["error"]
                   for r in out)


class TestGeneratorTruth:
    def test_payloads_decode_to_recorded_truth(self, spark):
        from anytomd_spark.kernels.convert import convert_bytes

        for r in tar_shard_payloads(4, 6):
            tf = tarfile.open(fileobj=io.BytesIO(r["payload"]), mode="r:*")
            names = [m.name for m in tf.getmembers() if m.isreg()]
            assert names == [m["member"] for m in r["members"]]
            for m, truth in zip(tf.getmembers(), r["members"]):
                body = tf.extractfile(m).read()
                assert len(body) == truth["n_bytes"]
                md = convert_bytes(
                    body, m.name.rsplit(".", 1)[-1])["markdown"]
                assert f"{truth['s']}" in md and f"{truth['i']}" in md

    def test_determinism(self):
        a = tar_shard_payloads(3, 4)
        b = tar_shard_payloads(3, 4)
        for x, y in zip(a, b):
            assert x["payload"] == y["payload"]


class TestZipExtraction:
    def test_members_convert_and_match_tar_semantics(self, spark):
        from anytomd_spark.analysis.ingest import build_zip, zip_extract

        for compressed in (False, True):
            z = build_zip([
                ("a.txt", b"hello world"),
                ("b.py", b"print('x')\n"),
                ("bad.pdf", b"%PDF nope"),
            ], compressed=compressed)
            out = {r["member"]: r for r in
                   zip_extract(_shards_df(spark, [(0, z)])).collect()}
            assert out["a.txt"]["markdown"] == "hello world"
            assert out["b.py"]["fmt"] == "code"
            assert out["bad.pdf"]["error"] is not None

    def test_bad_archive_single_error_row(self, spark):
        from anytomd_spark.analysis.ingest import zip_extract

        out = zip_extract(_shards_df(spark, [(0, b"PK\x03\x04 junk")])).collect()
        assert len(out) == 1 and "bad archive" in out[0]["error"]

    def test_zip_bytes_deterministic(self):
        from anytomd_spark.analysis.ingest import build_zip

        m = [("x.txt", b"abc" * 100)]
        assert build_zip(m) == build_zip(m)

    def test_zip_payload_generator_truth(self, spark):
        import io
        import zipfile

        from anytomd_spark.analysis.ingest import zip_shard_payloads
        from anytomd_spark.kernels.convert import convert_bytes

        for r in zip_shard_payloads(3, 7):
            zf = zipfile.ZipFile(io.BytesIO(r["payload"]))
            names = [zi.filename for zi in zf.infolist()]
            assert names == [m["member"] for m in r["members"]]
            for truth in r["members"]:
                body = zf.read(truth["member"])
                assert len(body) == truth["n_bytes"]

    def test_zip_generator_determinism(self):
        from anytomd_spark.analysis.ingest import zip_shard_payloads

        a = zip_shard_payloads(3, 7)
        b = zip_shard_payloads(3, 7)
        for x, y in zip(a, b):
            assert x["payload"] == y["payload"]


class TestUntrustedShardEdges:
    """Round-6 review findings: duplicate zip member names and the
    compressed-tar skip cost (both reproduced before fixing)."""

    def test_zip_duplicate_names_read_exact_entries(self, spark):
        # zipfile's by-name lookup resolves to the LAST entry; reading
        # by ZipInfo must attribute each row its OWN member's bytes
        import warnings

        from anytomd_spark.analysis.ingest import build_zip, zip_extract

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)  # dup-name warn
            z = build_zip([("a.txt", b"first"), ("a.txt", b"second-longer")])
        out = sorted(zip_extract(_shards_df(spark, [(0, z)])).collect(),
                     key=lambda r: r["n_bytes"])
        assert [r["n_bytes"] for r in out] == [5, 13]
        assert "first" in out[0]["markdown"]
        assert "second-longer" in out[1]["markdown"]

    def test_zip_duplicate_name_cannot_smuggle_oversized_entry(self, spark):
        # review repro: small first entry passes the budget check; a
        # by-name read would then inflate the oversized LAST entry
        import warnings

        from anytomd_spark.analysis.ingest import build_zip, zip_extract

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            z = build_zip([("a.txt", b"tiny"), ("a.txt", b"\x00" * (8 << 20))])
        out = zip_extract(_shards_df(spark, [(0, z)]),
                          max_member_bytes=1 << 20).collect()
        ok = [r for r in out if r["error"] is None]
        err = [r for r in out if r["error"] is not None]
        assert len(ok) == 1 and ok[0]["n_bytes"] == 4
        assert "tiny" in ok[0]["markdown"]
        assert len(err) == 1 and "exceeds budget" in err[0]["error"]

    def test_targz_oversized_member_aborts_shard(self, spark):
        # a compressed tar cannot seek past a member; skipping would
        # decompress the oversized body, so the shard aborts instead
        tar = build_tar([("ok.txt", b"fine"),
                         ("big.txt", b"\x00" * 5000),
                         ("after.txt", b"never reached")], gzipped=True)
        out = tar_extract(_shards_df(spark, [(0, tar)]),
                          max_member_bytes=1000).collect()
        by_member = {r["member"]: r for r in out}
        assert by_member["ok.txt"]["error"] is None
        assert "exceeds budget" in by_member["big.txt"]["error"]
        assert "after.txt" not in by_member
        assert any(r["error"] and "aborted" in r["error"] for r in out)

    def test_targz_bomb_rejected_without_decompression(self, spark):
        # 256 MiB of zeros gzips to ~256 KiB; the declared-size check
        # plus shard abort must reject it without gunzipping the body
        import time

        tar = build_tar([("zeros.bin", b"\x00" * (256 << 20)),
                         ("tail.txt", b"x")], gzipped=True)
        assert len(tar) < (4 << 20)
        df = _shards_df(spark, [(0, tar)])
        t0 = time.time()
        out = tar_extract(df, max_member_bytes=64 << 20).collect()
        elapsed = time.time() - t0
        errs = [r["error"] for r in out if r["error"]]
        assert any("exceeds budget" in e for e in errs)
        assert any("aborted" in e for e in errs)
        assert elapsed < 10, f"tar.gz bomb reject took {elapsed:.1f}s"

    def test_plain_tar_oversized_member_still_continues(self, spark):
        # uncompressed tar seeks past the rejected member: later
        # members must still convert (no abort on the seekable path)
        tar = build_tar([("big.txt", b"\x00" * 5000), ("after.txt", b"ok")])
        out = {r["member"]: r for r in tar_extract(
            _shards_df(spark, [(0, tar)]), max_member_bytes=1000).collect()}
        assert "exceeds budget" in out["big.txt"]["error"]
        assert out["after.txt"]["error"] is None


def test_member_memo_collapses_identical_members(monkeypatch):
    """Identical (hint, bytes) members across shards in one batch convert
    once (the batch.convert_batch memo pattern at the archive edge),
    with row-identical output to the unmemoized path."""
    from anytomd_spark.analysis import ingest as I
    from anytomd_spark.kernels import convert as C

    calls = []
    real = C.convert_bytes

    def counting(data, ext, **kw):
        calls.append((ext, bytes(data)))
        return real(data, ext, **kw)

    monkeypatch.setattr(I.C, "convert_bytes", counting)
    shared = [("README.txt", b"the same readme in every shard"),
              ("doc.csv", b"a,b\n1,2\n")]
    memo = {}
    rows_memo = []
    for s, (name, body) in enumerate(shared * 4):
        rows_memo.append(I._member_row(s, name, body, memo))
    n_calls_memo = len(calls)
    calls.clear()
    rows_plain = []
    for s, (name, body) in enumerate(shared * 4):
        rows_plain.append(I._member_row(s, name, body))
    n_calls_plain = len(calls)
    assert n_calls_memo == 2           # one per distinct member
    assert n_calls_plain == 8          # every occurrence, unmemoized
    assert rows_memo == rows_plain     # row-identical output
