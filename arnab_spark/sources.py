"""Source/sink registry (SURVEY.md §2.B "Scans / sources / sinks").

Uniform entry points over Spark's readers/writers, plus honestly-stubbed
lakehouse connectors: Delta/Iceberg/Hudi need their jars on the
classpath (not present in this environment — SURVEY.md environment
notes), so requesting them raises a clear error naming the missing
piece instead of a ClassNotFoundException twenty frames deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from arnab_spark.errors import ArnabError

_NATIVE_FORMATS = {"parquet", "csv", "json", "orc", "text"}
_LAKEHOUSE_JARS = {
    "delta": "io.delta:delta-spark (+ spark.sql.extensions config)",
    "iceberg": "org.apache.iceberg:iceberg-spark-runtime (+ catalog config)",
    "hudi": "org.apache.hudi:hudi-spark-bundle",
}


def _check_lakehouse(fmt: str, spark: SparkSession) -> None:
    probe = {
        "delta": "io.delta.sql.DeltaSparkSessionExtension",
        "iceberg": "org.apache.iceberg.spark.SparkCatalog",
        "hudi": "org.apache.hudi.DefaultSource",
    }[fmt]
    try:
        spark._jvm.java.lang.Class.forName(probe)  # noqa: SLF001
    except Exception as exc:
        raise ArnabError(
            f"{fmt} support requires {_LAKEHOUSE_JARS[fmt]} on the Spark "
            f"classpath; not present in this environment"
        ) from exc


def read_source(spark: SparkSession, fmt: str, path: str, **options) -> DataFrame:
    """Read any supported source format. CSV defaults to header=true
    (matching DuckDB read_csv_auto's sniffing more closely than Spark's
    headerless default)."""
    fmt = fmt.lower()
    if fmt in _LAKEHOUSE_JARS:
        _check_lakehouse(fmt, spark)
    elif fmt not in _NATIVE_FORMATS:
        raise ArnabError(f"unknown source format '{fmt}'")
    if fmt == "csv":
        options = {"header": "true", "inferSchema": "true", **options}
    return spark.read.format(fmt).options(**options).load(path)


def write_sink(df: DataFrame, fmt: str, path: str, mode: str = "overwrite", **options) -> None:
    """COPY ... TO equivalent: write a DataFrame to any supported sink."""
    fmt = fmt.lower()
    if fmt in _LAKEHOUSE_JARS:
        _check_lakehouse(fmt, df.sparkSession)
    elif fmt not in _NATIVE_FORMATS:
        raise ArnabError(f"unknown sink format '{fmt}'")
    if fmt == "csv":
        options = {"header": "true", **options}
    df.write.format(fmt).mode(mode).options(**options).save(path)
