"""Structured Streaming variant of the extraction pipeline.

The reference is a batch CLI (no streaming), but the transcripts table at
10^12-turn scale is append-only in practice; this module lets the same
Arrow-batched kernel run incrementally:

    readStream (file source over the transcripts directory)
      -> mapInPandas(convert_batch)          # same kernel as batch
      -> writeStream (parquet sink, checkpointed, exactly-once files)

plus a windowed extraction-metrics stream (events-per-format with
watermarked event-time windows) for monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anytomd_spark.batch import OUTPUT_SPARK_SCHEMA, convert_batch
from anytomd_spark.transcripts import TRANSCRIPTS_SCHEMA

STREAM_OUTPUT_SCHEMA = f"{TRANSCRIPTS_SCHEMA}, {OUTPUT_SPARK_SCHEMA}"


def _convert_iter(iterator):
    for pdf in iterator:
        yield convert_batch(pdf)


def read_transcripts_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def convert_stream(stream_df: DataFrame) -> DataFrame:
    """Same per-turn kernel, incremental execution."""
    return stream_df.mapInPandas(_convert_iter, schema=STREAM_OUTPUT_SCHEMA)


def start_conversion_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """Checkpointed file-to-file conversion stream. ``trigger_once`` runs
    one incremental catch-up pass (the batch-resume analogue); otherwise
    it micro-batches continuously."""
    converted = convert_stream(read_transcripts_stream(spark, input_path))
    writer = (
        converted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def metrics_stream(converted: DataFrame, watermark: str = "10 minutes",
                   window: str = "5 minutes") -> DataFrame:
    """Watermarked per-window extraction metrics (late turns tolerated up
    to the watermark; state is bounded)."""
    return (
        converted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "fmt")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("chars_out").alias("chars_out"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_failures"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "fmt", "n_turns", "bytes_in", "chars_out", "n_failures",
        )
    )
