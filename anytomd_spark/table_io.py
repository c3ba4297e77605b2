"""Storage backend for the pipeline output + lineage sidecar.

SURVEY §7.1 step 6 / §7.5: the north rule names Iceberg tables; this
sandbox has no iceberg-spark-runtime jar, so the pipeline runs on a
parquet shim with IDENTICAL semantics at the API surface:

  * output: partitioned by ``bucket``, idempotent per-partition overwrite
    (Iceberg ``overwritePartitions()`` <-> parquet dynamic partition
    overwrite)
  * lineage: append-only sidecar (Iceberg ``append()`` <-> parquet
    append mode)
  * reads: ``spark.read.table`` for Iceberg identifiers, with optional
    snapshot pinning; ``spark.read.parquet`` for the shim

``probe_storage`` detects the Iceberg runtime on the session classpath
at run time, so the same ``run_pipeline`` call upgrades to real Iceberg
semantics when the jar appears; the active mode is recorded in every
lineage row (``storage`` column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CLASS = "org.apache.iceberg.spark.source.IcebergSource"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is loadable by the JVM.

    Probes the driver thread's CONTEXT classloader first: jars added via
    ``--packages``/``--jars`` live in Spark's MutableURLClassLoader, which
    the system classloader (``Class.forName`` with no loader) cannot see.
    """
    try:
        loader = (
            spark._jvm.java.lang.Thread.currentThread().getContextClassLoader()
        )
        if loader is not None:
            loader.loadClass(ICEBERG_CLASS)
            return True
    except Exception:
        pass
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CLASS)
        return True
    except Exception:
        return False


def probe_storage(spark: SparkSession, requested: str | None = None) -> str:
    """Resolve the storage mode: explicit request wins (and fails loudly
    when Iceberg is requested but absent); otherwise auto-detect."""
    if requested == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "storage='iceberg' requested but no iceberg-spark-runtime "
                "jar is on the classpath (looked for %s)" % ICEBERG_CLASS
            )
        return "iceberg"
    if requested == "parquet":
        return "parquet"
    if requested is not None:
        raise ValueError(f"unknown storage mode: {requested!r}")
    return "iceberg" if iceberg_available(spark) else "parquet"


def write_output(df: DataFrame, target: str, storage: str) -> None:
    """Idempotent per-bucket overwrite of the converted output.

    ``target`` is a table identifier (``catalog.db.table``) in iceberg
    mode, a filesystem path in parquet mode.
    """
    if storage == "iceberg":
        # create-if-missing decided by an explicit catalog probe — a bare
        # try/except around overwritePartitions() would misread a commit
        # conflict or storage error as "table missing" and re-run the
        # whole job into a doomed create()
        if df.sparkSession.catalog.tableExists(target):
            df.writeTo(target).overwritePartitions()
        else:
            df.writeTo(target).partitionedBy("bucket").create()
    else:
        (
            df.write.mode("overwrite")
            # per-write, not session-level: a caller-supplied SparkSession
            # without build_session's conf would otherwise statically
            # overwrite the whole path, deleting completed buckets
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(target)
        )


def read_output(
    spark: SparkSession,
    target: str,
    storage: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the output table back; Iceberg reads can pin a snapshot
    (time-travel for audits / reproducible verification joins)."""
    if storage == "iceberg":
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(target)
    if snapshot_id is not None:
        raise ValueError("snapshot pinning requires iceberg storage")
    return spark.read.parquet(target)


def append_lineage(df: DataFrame, target: str, storage: str) -> None:
    if storage == "iceberg":
        if df.sparkSession.catalog.tableExists(target):
            df.writeTo(target).append()
        else:
            df.writeTo(target).create()
    else:
        df.write.mode("append").parquet(target)


def read_lineage(spark: SparkSession, target: str, storage: str) -> DataFrame:
    if storage == "iceberg":
        return spark.read.table(target)
    return spark.read.parquet(target)
