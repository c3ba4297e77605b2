"""Structured Streaming conversion: availableNow catch-up run over the
fixture conversation, checkpointed parquet sink, incremental resume."""

from __future__ import annotations

import os

import pytest

pyspark = pytest.importorskip("pyspark")

from anytomd_spark.pipeline import build_session  # noqa: E402
from anytomd_spark.streaming import start_conversion_stream  # noqa: E402
from anytomd_spark.transcripts import fixture_transcripts  # noqa: E402
from tests.conftest import FIXTURES, normalize  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    s = build_session(master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()


def test_streaming_conversion_and_resume(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    from anytomd_spark.transcripts import TRANSCRIPTS_SCHEMA

    pdf = fixture_transcripts()
    first = spark.createDataFrame(pdf.iloc[:6], schema=TRANSCRIPTS_SCHEMA)
    first.write.mode("append").parquet(inp)

    q = start_conversion_stream(spark, inp, out, ckpt, trigger_once=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 6
    assert got.filter("error is not null").count() == 0

    # append more turns -> a second availableNow pass picks up ONLY them
    second = spark.createDataFrame(pdf.iloc[6:], schema=TRANSCRIPTS_SCHEMA)
    second.write.mode("append").parquet(inp)
    q2 = start_conversion_stream(spark, inp, out, ckpt, trigger_once=True)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    assert got2.count() == len(pdf)

    # golden equality survives the streaming path
    row = got2.filter("turn_idx = 0").collect()[0]
    with open(os.path.join(FIXTURES, "expected", "sample.html.md")) as f:
        assert normalize(row.markdown) == normalize(f.read())
