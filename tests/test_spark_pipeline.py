"""End-to-end Spark tests: fixture-golden equality through mapInPandas,
stable window ordering, lineage + resume semantics, synthetic generation
determinism. Runs on local[2] to keep CI fast."""

from __future__ import annotations

import os

import pytest

from tests.conftest import FIXTURES, normalize

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from anytomd_spark.pipeline import (  # noqa: E402
    build_session,
    bucketed,
    compute_fmt_histogram,
    compute_lineage,
    convert_transcripts,
    ordered_output,
    run_pipeline,
)
from anytomd_spark.transcripts import (  # noqa: E402
    fixture_transcripts,
    generate_transcripts,
)


@pytest.fixture(scope="module")
def spark():
    s = build_session(master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()


GOLDEN_NAMES = [
    "sample.html", "sample.csv", "sample.json", "sample.xml",
    "sample.txt", "sample.py", "sample.ipynb", "sample.docx",
    "sample.pptx", "sample.xlsx", "sample.xls", "sample_unicode.xls",
]


def test_fixture_conversation_golden_equality(spark):
    """Port of the reference golden e2e suite through the Spark pipeline:
    each turn's markdown must match the golden under stable ordering.
    Input rows are shuffled (FIXTURES.md: correctness must come from the
    window-based sort, not arrival order)."""
    shuffled = fixture_transcripts().sample(frac=1.0, random_state=7)
    df = spark.createDataFrame(shuffled)
    converted = ordered_output(convert_transcripts(df, partitions=4))
    rows = converted.orderBy("conv_id", "turn_idx").collect()
    assert len(rows) == len(GOLDEN_NAMES)
    for row, name in zip(rows, GOLDEN_NAMES):
        with open(os.path.join(FIXTURES, "expected", f"{name}.md")) as f:
            expected = f.read()
        assert row.error is None, f"{name}: {row.error}"
        assert normalize(row.markdown) == normalize(expected), name
        assert row.turn_seq == row.turn_idx + 1


def test_fmt_histogram(spark):
    df = spark.createDataFrame(fixture_transcripts())
    hist = {
        r.fmt: r.n
        for r in compute_fmt_histogram(convert_transcripts(df)).collect()
    }
    assert hist["html"] == 1
    assert hist["docx"] == 1
    assert hist["xls"] == 2
    assert hist["code"] == 1
    assert hist["txt"] == 1


def test_generated_transcripts_deterministic(spark):
    a = generate_transcripts(spark, n_convs=40, seed=7, mega_every=0, partitions=2)
    b = generate_transcripts(spark, n_convs=40, seed=7, mega_every=0, partitions=5)
    rows_a = sorted(a.collect(), key=lambda r: (r.conv_id, r.turn_idx))
    rows_b = sorted(b.collect(), key=lambda r: (r.conv_id, r.turn_idx))
    assert rows_a == rows_b
    assert len(rows_a) > 40


def test_generated_transcripts_convert_clean(spark):
    df = generate_transcripts(spark, n_convs=60, seed=11, mega_every=0, partitions=2)
    converted = convert_transcripts(df, partitions=4)
    stats = converted.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("failures"),
        F.countDistinct("fmt").alias("n_fmts"),
    ).collect()[0]
    assert stats.failures == 0
    assert stats.n_fmts >= 6


def test_lineage_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    lineage = str(tmp_path / "lineage")
    df = generate_transcripts(spark, n_convs=30, seed=3, mega_every=0, partitions=2)

    r1 = run_pipeline(spark, df, out, lineage, run_id="run1", n_buckets=8)
    assert r1["rows"] == df.count()
    assert r1["failures"] == 0

    lin = spark.read.parquet(lineage)
    assert lin.filter(F.col("status") == "done").count() > 0

    # resume: everything is complete -> zero new rows converted
    r2 = run_pipeline(spark, df, out, lineage, run_id="run2", n_buckets=8)
    lin2 = spark.read.parquet(lineage).filter(F.col("run_id") == "run2")
    assert lin2.count() == 0 or lin2.agg(F.sum("n_rows")).collect()[0][0] in (0, None)

    # output readable and ordered
    out_df = spark.read.parquet(out)
    assert out_df.count() == r1["rows"]


def test_storage_probe_and_lineage_mode(spark, tmp_path):
    """Iceberg probe: no runtime jar in this sandbox -> parquet shim
    auto-selected and recorded in lineage; forcing iceberg fails loudly;
    snapshot pinning is an iceberg-only contract."""
    from anytomd_spark import table_io

    assert table_io.iceberg_available(spark) is False
    assert table_io.probe_storage(spark) == "parquet"
    assert table_io.probe_storage(spark, "parquet") == "parquet"
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        table_io.probe_storage(spark, "iceberg")
    with pytest.raises(ValueError):
        table_io.probe_storage(spark, "delta")

    df = generate_transcripts(spark, n_convs=6, seed=5, mega_every=0,
                              partitions=2)
    res = run_pipeline(spark, df, str(tmp_path / "out"),
                       str(tmp_path / "lin"), n_buckets=4)
    assert res["storage"] == "parquet"
    lin = spark.read.parquet(str(tmp_path / "lin"))
    assert {r.storage for r in lin.select("storage").collect()} == {"parquet"}

    with pytest.raises(ValueError, match="snapshot"):
        table_io.read_output(spark, str(tmp_path / "out"), "parquet",
                             snapshot_id=1)


def test_iceberg_write_call_chain_mocked(spark, monkeypatch):
    """The Iceberg live branch can't execute offline (no runtime jar —
    SURVEY §7.5), so pin its exact DataFrameWriterV2 call chains with
    mocks (VERDICT r3 #9): existing table -> writeTo(t).
    overwritePartitions(); missing table -> writeTo(t).partitionedBy(
    'bucket').create(); lineage -> append()/create(); snapshot read ->
    option('snapshot-id', id).table(t)."""
    from anytomd_spark import table_io

    calls: list = []

    class FakeWriterV2:
        def __init__(self, target):
            calls.append(("writeTo", target))

        def partitionedBy(self, *cols):
            calls.append(("partitionedBy", cols))
            return self

        def overwritePartitions(self):
            calls.append(("overwritePartitions",))

        def create(self):
            calls.append(("create",))

        def append(self):
            calls.append(("append",))

    exists = {"flag": True}
    df = spark.range(3).withColumn("bucket", F.lit(0))
    # patch the CONCRETE classes (pyspark 4: instances are the .classic
    # subclasses, which override the base-class methods)
    monkeypatch.setattr(type(df), "writeTo",
                        lambda self, target: FakeWriterV2(target))
    monkeypatch.setattr(type(spark.catalog), "tableExists",
                        lambda self, name: exists["flag"])

    table_io.write_output(df, "cat.db.out", "iceberg")
    assert calls == [("writeTo", "cat.db.out"), ("overwritePartitions",)]

    calls.clear()
    exists["flag"] = False
    table_io.write_output(df, "cat.db.out", "iceberg")
    assert calls == [("writeTo", "cat.db.out"),
                     ("partitionedBy", ("bucket",)), ("create",)]

    calls.clear()
    exists["flag"] = True
    table_io.append_lineage(df, "cat.db.lin", "iceberg")
    assert calls == [("writeTo", "cat.db.lin"), ("append",)]

    calls.clear()
    exists["flag"] = False
    table_io.append_lineage(df, "cat.db.lin", "iceberg")
    assert calls == [("writeTo", "cat.db.lin"), ("create",)]

    reads: list = []
    monkeypatch.setattr(
        type(spark.read), "option",
        lambda self, k, v: (reads.append(("option", k, v)), self)[1])
    monkeypatch.setattr(
        type(spark.read), "table",
        lambda self, name: (reads.append(("table", name)), df)[1])
    out = table_io.read_output(spark, "cat.db.out", "iceberg",
                               snapshot_id=42)
    assert out is df
    assert reads == [("option", "snapshot-id", "42"), ("table", "cat.db.out")]

    reads.clear()
    table_io.read_output(spark, "cat.db.out", "iceberg")
    assert reads == [("table", "cat.db.out")]


def test_lineage_read_is_metric_columns_only(spark, tmp_path):
    """The post-write lineage scan must never materialize the payload
    columns (VERDICT r2 'What's wrong #3'): the slim projection
    run_pipeline uses must push down to a ReadSchema without
    markdown/plain_text/text, and run totals come from the write job's
    observe metrics (no third scan)."""
    import contextlib
    import io

    df = generate_transcripts(spark, n_convs=8, seed=9, mega_every=0,
                              partitions=2)
    out = str(tmp_path / "out")
    res = run_pipeline(spark, df, out, str(tmp_path / "lin"), n_buckets=4)
    assert res["rows"] == df.count() and res["failures"] == 0

    slim = (
        spark.read.parquet(out)
        .filter(F.col("bucket").isin([0, 1, 2, 3]))
        .select("bucket", "fmt", "bytes_in", "chars_out", "error",
                "n_warnings")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        slim.explain("formatted")
    plan = buf.getvalue()
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "markdown" not in read_schema
    assert "plain_text" not in read_schema
    assert "text" not in read_schema.replace("plain_text", "")
    # lineage totals agree with the observed write metrics
    lin = spark.read.parquet(str(tmp_path / "lin"))
    assert lin.agg(F.sum("n_rows")).collect()[0][0] == res["rows"]


def test_compute_lineage_histogram(spark):
    df = spark.createDataFrame(fixture_transcripts())
    converted = bucketed(convert_transcripts(df), n_buckets=4)
    lin = compute_lineage(converted, "t").collect()
    total = sum(r.n_rows for r in lin)
    assert total == len(GOLDEN_NAMES)
    hist_total = sum(sum(r.fmt_hist.values()) for r in lin if r.fmt_hist)
    assert hist_total == len(GOLDEN_NAMES)


def test_verify_against_expected(spark):
    from anytomd_spark.pipeline import verify_against_expected

    df = spark.createDataFrame(fixture_transcripts())
    converted = convert_transcripts(df)
    expected = converted.select("conv_id", "turn_idx", "markdown")
    assert verify_against_expected(converted, expected)["ok"]

    tampered = expected.withColumn(
        "markdown",
        F.when(F.col("turn_idx") == 0, F.lit("WRONG")).otherwise(
            F.col("markdown")
        ),
    )
    report = verify_against_expected(converted, tampered)
    assert report["mismatched"] == 1 and not report["ok"]


def test_salted_equals_unsalted_on_skewed_input(spark):
    """Mega-conversation skew: the salted repartition path must produce
    exactly the same converted rows as the shuffle-free path."""
    df = generate_transcripts(
        spark, n_convs=12, seed=13, mega_every=6, mega_size=120, partitions=3
    )
    plain = convert_transcripts(df, repartition=False)
    salted = convert_transcripts(df, partitions=4, salt_buckets=4,
                                 repartition=True)
    key = lambda r: (r.conv_id, r.turn_idx)  # noqa: E731
    rows_a = sorted(plain.collect(), key=key)
    rows_b = sorted(salted.collect(), key=key)
    assert rows_a == rows_b
    # skew actually present: one conversation dominates
    sizes = {r.conv_id: r.n for r in df.groupBy("conv_id").count()
             .withColumnRenamed("count", "n").collect()}
    assert max(sizes.values()) >= 100


def test_ordered_output_mega_conversation_two_level(spark):
    """A single 1M-turn conversation through the skew-safe turn_seq path:
    exact rank values, and the payload-side window partitions on
    (conv_id, _seq_bkt) — a whole conversation never lands on one task
    (VERDICT r2 'What's wrong #2')."""
    import contextlib
    import io

    n = 1_000_000
    turns = spark.range(n).select(
        F.lit("megaconv").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
    )
    # shuffled arrival order: ordering must come from the operator
    converted = turns.withColumn("payload", F.lit("x")).orderBy(
        F.xxhash64("turn_idx")
    )
    out = ordered_output(converted, turns=turns, seq_bucket=65536)
    assert out.filter(F.col("turn_seq") != F.col("turn_idx") + 1).count() == 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(True)
    plan = buf.getvalue()
    # the two-level path is active: bucket key present in the plan, and
    # every row_number window spec includes it next to conv_id
    assert "_seq_bkt" in plan
    for line in plan.splitlines():
        if "row_number()" in line and "windowspecdefinition" in line:
            assert "_seq_bkt" in line, line


def test_ordered_output_adaptive_small_convs_take_legacy_plan(spark):
    """When no conversation reaches seq_bucket rows, the adaptive check
    must fall back to the legacy single-window plan — no composite-key
    join, no _seq_bkt anywhere (VERDICT r3 #5: the small-conv common
    case paid the two-level cost unconditionally)."""
    import contextlib
    import io

    df = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 0)], "conv_id string, turn_idx int"
    ).withColumn("payload", F.lit("p"))
    turns = df.select("conv_id", "turn_idx")
    out = ordered_output(df, turns=turns, seq_bucket=64)
    got = {(r.conv_id, r.turn_idx): r.turn_seq for r in out.collect()}
    assert got == {("a", 0): 1, ("a", 1): 2, ("b", 0): 1}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(True)
    assert "_seq_bkt" not in buf.getvalue()


def test_ordered_output_sparse_turn_idx_matches_legacy(spark):
    """Gappy, non-dense turn_idx across bucket boundaries: the two-level
    rank must equal the legacy single-window row_number."""
    import pandas as pd

    rows = [
        ("a", 3), ("a", 10), ("a", 70_000), ("a", 2_000_000),
        ("b", 0), ("b", 65_536),
        ("c", 5),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx"])
    df = spark.createDataFrame(pdf).withColumn("payload", F.lit("p"))
    turns = df.select("conv_id", "turn_idx")
    legacy = {
        (r.conv_id, r.turn_idx): r.turn_seq
        for r in ordered_output(df).collect()
    }
    two_level = {
        (r.conv_id, r.turn_idx): r.turn_seq
        for r in ordered_output(df, turns=turns, seq_bucket=65536,
                                adaptive=False).collect()
    }
    assert two_level == legacy


def test_catalog_table_source(spark, tmp_path):
    """The job's --table path: transcripts registered in the session
    catalog (saveAsTable -> spark.read.table) convert identically to the
    parquet-path source — the sandbox stand-in for an Iceberg catalog
    table (SURVEY §7.6: Iceberg resolves through spark.read.table)."""
    from anytomd_spark.pipeline import run_pipeline
    from anytomd_spark.transcripts import TRANSCRIPTS_SCHEMA, fixture_transcripts

    pdf = fixture_transcripts()
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    # managed table in the session warehouse; dropped (with data) below
    df.write.mode("overwrite").saveAsTable("transcripts_tbl")
    try:
        via_table = spark.read.table("transcripts_tbl")
        result = run_pipeline(
            spark, via_table,
            output_path=str(tmp_path / "out"),
            lineage_path=str(tmp_path / "lineage"),
            n_buckets=4,
        )
        assert result["rows"] == len(pdf)
        assert result["failures"] == 0
        got = spark.read.parquet(str(tmp_path / "out"))
        assert got.filter("markdown is null").count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS transcripts_tbl")


def test_struct_udf_binding_equivalent(spark):
    """convert_transcripts_struct (scalar struct pandas_udf over
    text+tool) must produce byte-identical rows to the mapInPandas
    binding — the measured A/B and the prunability property live in
    PLANS.md round-3."""
    from anytomd_spark.pipeline import convert_transcripts_struct

    df = generate_transcripts(spark, n_convs=25, seed=21, mega_every=0,
                              partitions=3)
    key = lambda r: (r.conv_id, r.turn_idx)  # noqa: E731
    a = sorted(convert_transcripts(df).collect(), key=key)
    b = sorted(convert_transcripts_struct(df).collect(), key=key)
    assert a == b


def test_run_pipeline_empty_input(spark, tmp_path):
    """Zero input rows: run_pipeline must report zero work, append no
    lineage, and NOT crash on re-reading a nonexistent output (review
    finding: range(n_buckets) scoping + empty write)."""
    from anytomd_spark.transcripts import TRANSCRIPTS_SCHEMA

    empty = spark.createDataFrame([], schema=TRANSCRIPTS_SCHEMA)
    res = run_pipeline(spark, empty, str(tmp_path / "out"),
                       str(tmp_path / "lin"), n_buckets=4)
    assert res == {"run_id": res["run_id"], "rows": 0, "failures": 0,
                   "buckets": 0, "storage": "parquet"}
    assert not (tmp_path / "lin").exists()


def test_run_pipeline_no_resume_does_not_reattribute_stale_buckets(
    spark, tmp_path
):
    """resume=False over an output holding ANOTHER run's buckets: lineage
    for the new run must cover only the buckets it actually wrote, never
    re-attributing the stale ones (review finding)."""
    out, lin = str(tmp_path / "out"), str(tmp_path / "lin")
    df_all = generate_transcripts(spark, n_convs=30, seed=3, mega_every=0,
                                  partitions=2)
    run_pipeline(spark, df_all, out, lin, run_id="first", n_buckets=8)
    first_buckets = {
        r.bucket for r in spark.read.parquet(lin)
        .filter("run_id = 'first'").select("bucket").collect()
    }
    assert len(first_buckets) > 1

    # second run over a SUBSET of conversations, resume off
    one_conv = df_all.filter(
        F.col("conv_id") == df_all.select("conv_id").first().conv_id
    )
    res = run_pipeline(spark, one_conv, out, lin, run_id="second",
                       n_buckets=8, resume=False)
    second = spark.read.parquet(lin).filter("run_id = 'second'")
    second_buckets = {r.bucket for r in second.select("bucket").collect()}
    assert second_buckets < first_buckets  # strictly fewer
    assert res["buckets"] == len(second_buckets)
    assert second.agg(F.sum("n_rows")).collect()[0][0] == one_conv.count()


def test_ordered_output_null_conv_id_not_dropped(spark):
    """A null conv_id must survive the two-level path (null-safe join),
    exactly as the legacy window kept it (review finding)."""
    import pandas as pd

    pdf = pd.DataFrame(
        [(None, 0), (None, 1), ("c", 0)],
        columns=["conv_id", "turn_idx"],
    )
    df = spark.createDataFrame(pdf, "conv_id string, turn_idx int") \
        .withColumn("payload", F.lit("p"))
    turns = df.select("conv_id", "turn_idx")
    rows = ordered_output(df, turns=turns, seq_bucket=64,
                          adaptive=False).collect()
    assert len(rows) == 3
    got = {(r.conv_id, r.turn_idx): r.turn_seq for r in rows}
    assert got[(None, 0)] == 1 and got[(None, 1)] == 2 and got[("c", 0)] == 1


def test_convert_distinct_equals_maponly(spark):
    """convert_transcripts_distinct (dedup-before-convert) must produce
    exactly the same rows as the shuffle-free map-only path, including
    error rows, null payloads, and the duplicate-payload fast path."""
    from anytomd_spark.pipeline import convert_transcripts_distinct

    df = generate_transcripts(
        spark, n_convs=30, seed=21, mega_every=0, partitions=3
    )
    # graft duplicates and edge rows onto the generated corpus
    extra = spark.createDataFrame(
        [
            ("dup-conv", 0, "user", "<p>shared</p>", "", None),
            ("dup-conv", 1, "user", "<p>shared</p>", "", None),
            ("dup-conv", 2, "user", "<p>shared</p>", "html", None),
            ("dup-conv", 3, "user", None, "", None),
            ("dup-conv", 4, "user", None, None, None),
            ("dup-conv", 5, "user", "%PDF-1.7 x", "pdf", None),
            ("dup-conv", 6, "user", "%PDF-1.7 x", "pdf", None),
        ],
        schema=("conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp"),
    )
    df = df.unionByName(extra)
    key = lambda r: (r.conv_id, r.turn_idx)  # noqa: E731
    rows_a = sorted(convert_transcripts(df).collect(), key=key)
    rows_b = sorted(
        convert_transcripts_distinct(df, partitions=4).collect(), key=key
    )
    assert [r.asDict() for r in rows_a] == [r.asDict() for r in rows_b]


def test_job_spark_submit_py_files(spark, tmp_path):
    """The north-rule run surface, end to end: package the library as a
    --py-files zip, launch scripts/submit_job.py through a REAL
    spark-submit subprocess from a neutral cwd (so every import resolves
    from the zip, not the repo checkout), and check the converted output
    and lineage sidecar land; a second submit resumes (no bucket
    reconverted, reported via the resume summary line)."""
    import shutil
    import subprocess
    import sys
    import zipfile

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "anytomd_spark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        pkg = os.path.join(repo, "anytomd_spark")
        for root, _dirs, files in os.walk(pkg):
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    zf.write(full, os.path.relpath(full, repo))

    inp = str(tmp_path / "transcripts.parquet")
    generate_transcripts(
        spark, n_convs=25, seed=9, mega_every=0, partitions=2
    ).write.parquet(inp)

    out_dir = str(tmp_path / "converted")
    lin_dir = str(tmp_path / "lineage")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--py-files", zpath,
        os.path.join(repo, "scripts", "submit_job.py"),
        "--input", inp, "--output", out_dir, "--lineage", lin_dir,
        "--buckets", "8", "--run-id", "submit-e2e",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    def run_and_parse(label):
        p = subprocess.run(
            cmd, cwd=str(tmp_path), env=env, capture_output=True,
            text=True, timeout=600,
        )
        assert p.returncode == 0, f"{label}: {p.stderr[-4000:]}"
        summaries = [ln for ln in p.stdout.splitlines()
                     if ln.startswith('{"run_id"')]
        assert summaries, f"{label}: no summary line\n{p.stdout[-2000:]}"
        import json as _json
        return _json.loads(summaries[-1])

    n_in = spark.read.parquet(inp).count()
    first = run_and_parse("first submit")
    assert first["rows"] == n_in and first["failures"] == 0

    out = spark.read.parquet(out_dir)
    assert out.count() == n_in
    assert out.filter(F.col("error").isNotNull()).count() == 0
    lineage = spark.read.parquet(lin_dir)
    assert lineage.agg(F.sum("n_rows")).collect()[0][0] == n_in

    # resume: every bucket already committed -> zero work, zero rewrites
    second = run_and_parse("resume submit")
    assert second["rows"] == 0 and second["buckets"] == 0
