"""Driver-contract emulation: what CORRECTNESS_r{N}.json records.

Imports __spark_entry__ through its public surface, smoke-checks
``entry(spark)``, then runs every ``queries()`` entry side-by-side with
its ``oracle_sql()`` twin at sf0.01 (DuckDB) and reports rows_match /
schema_match / hash_match per query, where the value hash sorts columns
by name and is dtype-sensitive (pandas hash_pandas_object), mirroring
the driver. Exit code 1 if any oracle-backed query is red.

Usage: python scripts/driver_emu.py [query_name ...]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(9)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _value_hash(pdf: pd.DataFrame) -> int:
    canon = _canon(pdf)
    # stringify object columns so e.g. Python-int-boxed values hash stably
    return int(pd.util.hash_pandas_object(canon.astype(str), index=False).sum())


def main(only: list[str]) -> int:
    import __spark_entry__ as entrymod
    from anytomd_spark.pipeline import build_session

    spark = build_session(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    edf = entrymod.entry(spark)
    erows = edf.collect()
    print(f"entry: {len(erows)} rows, schema={edf.columns}")

    oracles = entrymod.oracle_sql()
    results, red = {}, []
    for name, q in entrymod.queries().items():
        if only and name not in only:
            continue
        sdf = q(spark, SF_DIR).toPandas()
        if name not in oracles:
            results[name] = {"spark_rows": len(sdf), "err": "no_oracle"}
            continue
        odf = con.execute(oracles[name]).fetchdf()
        rec = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": sorted(sdf.columns) == sorted(odf.columns),
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
        }
        rec["hash_match"] = (
            rec["rows_match"] and rec["schema_match"]
            and _value_hash(sdf) == _value_hash(odf)
        )
        if rec["hash_match"]:
            # driver hash is dtype-sensitive: also flag dtype-kind drift
            for c in sdf.columns:
                sk, dk = sdf[c].dtype.kind, odf[c].dtype.kind
                if {sk, dk} not in ({"i"}, {"f"}, {"O"}, {"b"}, {"M"}, {"i", "u"}):
                    rec["hash_match"] = False
                    rec["dtype_drift"] = f"{c}: {sdf[c].dtype} vs {odf[c].dtype}"
                    break
        results[name] = rec
        if not rec["hash_match"]:
            red.append(name)
    print(json.dumps(results, indent=1, default=str))
    print(f"RED: {red or 'none'}")
    spark.stop()
    return 1 if red else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
