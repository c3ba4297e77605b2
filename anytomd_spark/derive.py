"""Derive a transcripts table from the driver-provided ``documents`` table.

The driver's testdata has no transcripts table, so the flagship query
manufactures one deterministically: each document becomes one turn whose
payload format is a pure function of ``doc_id % 6``. Every payload is
constructible in ANSI SQL (simple concatenation of columns), which makes
the *converted Markdown itself* oracle-checkable in DuckDB for all six
formats — a value-level correctness gate on the real conversion kernels,
not just row counts.

Layout: conversations of 5 turns (``conv_id = 'doc-conv-' || doc_id / 5``,
``turn_idx = doc_id % 5``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURNS_PER_CONV = 5

# doc_id % 6 -> payload format
FMT_BY_MOD = ("txt", "code", "csv", "html", "json", "xml")


def documents_transcripts(spark, sf_dir: str) -> DataFrame:
    """documents.parquet -> transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm_text = F.trim(F.regexp_replace("text", r"\s+", " "))
    mod = F.pmod("doc_id", F.lit(6))

    payload = (
        F.when(mod == 0, norm_text)
        .when(mod == 1, norm_text)
        .when(mod == 2, F.concat(
            F.lit("doc_id,lang,source\n"),
            F.col("doc_id").cast("string"), F.lit(","),
            F.col("lang"), F.lit(","), F.col("source"), F.lit("\n"),
        ))
        .when(mod == 3, F.concat(
            F.lit("<html><head><title>Doc "), F.col("doc_id").cast("string"),
            F.lit("</title></head><body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"), norm_text, F.lit("</p></body></html>"),
        ))
        .when(mod == 4, F.concat(
            F.lit('{"id": '), F.col("doc_id").cast("string"),
            F.lit(', "lang": "'), F.col("lang"), F.lit('"}'),
        ))
        .otherwise(F.concat(
            F.lit("<doc><id>"), F.col("doc_id").cast("string"),
            F.lit("</id><lang>"), F.col("lang"), F.lit("</lang></doc>"),
        ))
    )
    tool = (
        F.when(mod == 0, F.lit("txt"))
        .when(mod == 1, F.lit("py"))
        .when(mod == 2, F.lit("csv"))
        .otherwise(F.lit(""))
    )
    return docs.select(
        F.concat(
            F.lit("doc-conv-"),
            F.lpad((F.col("doc_id") / TURNS_PER_CONV).cast("long").cast("string"), 6, "0"),
        ).alias("conv_id"),
        F.pmod("doc_id", F.lit(TURNS_PER_CONV)).cast("int").alias("turn_idx"),
        F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        payload.alias("text"),
        tool.alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
        F.col("doc_id"),
    )


# The same payload construction in DuckDB SQL (shared by the oracles).
SQL_NORM_TEXT = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
SQL_PAYLOAD = f"""
CASE doc_id % 6
  WHEN 0 THEN {SQL_NORM_TEXT}
  WHEN 1 THEN {SQL_NORM_TEXT}
  WHEN 2 THEN 'doc_id,lang,source' || chr(10) || doc_id || ',' || lang || ',' || source || chr(10)
  WHEN 3 THEN '<html><head><title>Doc ' || doc_id || '</title></head><body><h1>Doc '
            || doc_id || '</h1><p>' || {SQL_NORM_TEXT} || '</p></body></html>'
  WHEN 4 THEN '{{"id": ' || doc_id || ', "lang": "' || lang || '"}}'
  ELSE '<doc><id>' || doc_id || '</id><lang>' || lang || '</lang></doc>'
END
"""

SQL_FMT = (
    "CASE doc_id % 6 WHEN 0 THEN 'txt' WHEN 1 THEN 'code' WHEN 2 THEN 'csv' "
    "WHEN 3 THEN 'html' WHEN 4 THEN 'json' ELSE 'xml' END"
)

# Expected markdown per format, as DuckDB expressions over documents columns.
SQL_MARKDOWN = f"""
CASE doc_id % 6
  WHEN 0 THEN {SQL_NORM_TEXT}
  WHEN 1 THEN '```python' || chr(10) || rtrim({SQL_NORM_TEXT}, ' ' || chr(9) || chr(10) || chr(13))
            || chr(10) || '```' || chr(10)
  WHEN 2 THEN '| doc_id | lang | source |' || chr(10) || '|---|---|---|' || chr(10)
            || '| ' || doc_id || ' | ' || lang || ' | ' || source || ' |' || chr(10)
  WHEN 3 THEN '# Doc ' || doc_id || chr(10) || chr(10) || {SQL_NORM_TEXT} || chr(10)
  WHEN 4 THEN '```json' || chr(10) || '{{' || chr(10) || '  "id": ' || doc_id || ',' || chr(10)
            || '  "lang": "' || lang || '"' || chr(10) || '}}' || chr(10) || '```' || chr(10)
  ELSE '```xml' || chr(10) || '<doc>' || chr(10) || '  <id>' || doc_id || '</id>' || chr(10)
            || '  <lang>' || lang || '</lang>' || chr(10) || '</doc>' || chr(10) || '```' || chr(10)
END
"""
