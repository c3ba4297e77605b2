"""Derive a transcripts table from the driver-provided ``documents`` table.

The driver's testdata has no transcripts table, so the flagship query
manufactures one deterministically: each document becomes one turn whose
payload format is a pure function of ``doc_id % 11``. Buckets 0-5 are
plain column concatenations (txt/code/csv/html/json/xml) — constructible
in ANSI SQL, so the *converted Markdown itself* is oracle-checkable in
DuckDB. Buckets 6-10 carry FIXED payloads for the five binary formats
(base64 DOCX/PPTX/XLSX/XLS + literal IPYNB, anytomd_spark.binfixtures),
whose expected Markdown is a string constant — also ANSI-SQL-expressible,
which is what gives the OOXML/notebook converters driver-visible
value-level correctness rows (reference golden suites: tests/test_docx.rs,
test_pptx.rs, test_xlsx.rs, test_xls.rs, test_ipynb.rs).

Layout: conversations of 5 turns (``conv_id = 'doc-conv-' || doc_id / 5``,
``turn_idx = doc_id % 5``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anytomd_spark.binfixtures import BIN_FIXTURES

TURNS_PER_CONV = 5
N_BUCKETS = 11

# doc_id % 11 -> payload format
FMT_BY_MOD = (
    "txt", "code", "csv", "html", "json", "xml",
    "docx", "pptx", "xlsx", "xls", "ipynb",
)


def documents_transcripts(spark, sf_dir: str) -> DataFrame:
    """documents.parquet -> transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm_text = F.trim(F.regexp_replace("text", r"\s+", " "))
    mod = F.pmod("doc_id", F.lit(N_BUCKETS))

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
        .when(mod == 5, F.concat(
            F.lit("<doc><id>"), F.col("doc_id").cast("string"),
            F.lit("</id><lang>"), F.col("lang"), F.lit("</lang></doc>"),
        ))
        .when(mod == 6, F.lit(BIN_FIXTURES["docx"][0]))
        .when(mod == 7, F.lit(BIN_FIXTURES["pptx"][0]))
        .when(mod == 8, F.lit(BIN_FIXTURES["xlsx"][0]))
        .when(mod == 9, F.lit(BIN_FIXTURES["xls"][0]))
        .otherwise(F.lit(BIN_FIXTURES["ipynb"][0]))
    )
    tool = (
        F.when(mod == 0, F.lit("txt"))
        .when(mod == 1, F.lit("py"))
        .when(mod == 2, F.lit("csv"))
        .when(mod == 10, F.lit("ipynb"))  # JSON heuristic would win otherwise
        .otherwise(F.lit(""))             # binary formats sniff by magic
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


def _sq(s: str) -> str:
    """SQL single-quoted literal (quotes doubled; newlines are legal in
    standard SQL string literals and DuckDB keeps them verbatim)."""
    return "'" + s.replace("'", "''") + "'"


# The same payload construction in DuckDB SQL (shared by the oracles).
SQL_NORM_TEXT = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
SQL_PAYLOAD = f"""
CASE doc_id % 11
  WHEN 0 THEN {SQL_NORM_TEXT}
  WHEN 1 THEN {SQL_NORM_TEXT}
  WHEN 2 THEN 'doc_id,lang,source' || chr(10) || doc_id || ',' || lang || ',' || source || chr(10)
  WHEN 3 THEN '<html><head><title>Doc ' || doc_id || '</title></head><body><h1>Doc '
            || doc_id || '</h1><p>' || {SQL_NORM_TEXT} || '</p></body></html>'
  WHEN 4 THEN '{{"id": ' || doc_id || ', "lang": "' || lang || '"}}'
  WHEN 5 THEN '<doc><id>' || doc_id || '</id><lang>' || lang || '</lang></doc>'
  WHEN 6 THEN {_sq(BIN_FIXTURES["docx"][0])}
  WHEN 7 THEN {_sq(BIN_FIXTURES["pptx"][0])}
  WHEN 8 THEN {_sq(BIN_FIXTURES["xlsx"][0])}
  WHEN 9 THEN {_sq(BIN_FIXTURES["xls"][0])}
  ELSE {_sq(BIN_FIXTURES["ipynb"][0])}
END
"""

SQL_FMT = (
    "CASE doc_id % 11 WHEN 0 THEN 'txt' WHEN 1 THEN 'code' WHEN 2 THEN 'csv' "
    "WHEN 3 THEN 'html' WHEN 4 THEN 'json' WHEN 5 THEN 'xml' "
    "WHEN 6 THEN 'docx' WHEN 7 THEN 'pptx' WHEN 8 THEN 'xlsx' "
    "WHEN 9 THEN 'xls' ELSE 'ipynb' END"
)

# Expected markdown per format, as DuckDB expressions over documents columns
# (constants for the fixed binary payloads).
SQL_MARKDOWN = f"""
CASE doc_id % 11
  WHEN 0 THEN {SQL_NORM_TEXT}
  WHEN 1 THEN '```python' || chr(10) || rtrim({SQL_NORM_TEXT}, ' ' || chr(9) || chr(10) || chr(13))
            || chr(10) || '```' || chr(10)
  WHEN 2 THEN '| doc_id | lang | source |' || chr(10) || '|---|---|---|' || chr(10)
            || '| ' || doc_id || ' | ' || lang || ' | ' || source || ' |' || chr(10)
  WHEN 3 THEN '# Doc ' || doc_id || chr(10) || chr(10) || {SQL_NORM_TEXT} || chr(10)
  WHEN 4 THEN '```json' || chr(10) || '{{' || chr(10) || '  "id": ' || doc_id || ',' || chr(10)
            || '  "lang": "' || lang || '"' || chr(10) || '}}' || chr(10) || '```' || chr(10)
  WHEN 5 THEN '```xml' || chr(10) || '<doc>' || chr(10) || '  <id>' || doc_id || '</id>' || chr(10)
            || '  <lang>' || lang || '</lang>' || chr(10) || '</doc>' || chr(10) || '```' || chr(10)
  WHEN 6 THEN {_sq(BIN_FIXTURES["docx"][1])}
  WHEN 7 THEN {_sq(BIN_FIXTURES["pptx"][1])}
  WHEN 8 THEN {_sq(BIN_FIXTURES["xlsx"][1])}
  WHEN 9 THEN {_sq(BIN_FIXTURES["xls"][1])}
  ELSE {_sq(BIN_FIXTURES["ipynb"][1])}
END
"""

# bytes_in counts DECODED payload bytes for the base64-carried binaries
# (constants), utf-8 bytes of the text payload otherwise.
SQL_BYTES_IN = f"""
CASE doc_id % 11
  WHEN 6 THEN {BIN_FIXTURES["docx"][2]}
  WHEN 7 THEN {BIN_FIXTURES["pptx"][2]}
  WHEN 8 THEN {BIN_FIXTURES["xlsx"][2]}
  WHEN 9 THEN {BIN_FIXTURES["xls"][2]}
  ELSE strlen({SQL_PAYLOAD})
END
"""
