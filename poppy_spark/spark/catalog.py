"""Table-source seam: Iceberg when a runtime is available, parquet otherwise.

The north rule targets Iceberg tables of transcripts; this sandbox bundles no
Iceberg runtime jar (and has no network to fetch one), so the seam keeps
query code independent of the catalog binding: everything downstream takes a
DataFrame, and only this module knows where it came from.  On a real cluster,
set ``spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-...`` and
pass ``iceberg://catalog.db.table`` URIs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, uri: str) -> DataFrame:
    """Load ``iceberg://catalog.db.table``, ``parquet:///path`` or a bare
    path (treated as parquet)."""
    if uri.startswith("iceberg://"):
        ident = uri[len("iceberg://") :]
        if not iceberg_available(spark):
            raise RuntimeError(
                "no Iceberg runtime on the classpath; add "
                "spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime "
                "or use a parquet:// uri"
            )
        return spark.read.format("iceberg").load(ident)
    if uri.startswith("parquet://"):
        uri = uri[len("parquet://") :]
    return spark.read.parquet(uri)


def write_table(df: DataFrame, uri: str, mode: str = "append") -> None:
    if uri.startswith("iceberg://"):
        ident = uri[len("iceberg://") :]
        if not iceberg_available(df.sparkSession):
            raise RuntimeError("no Iceberg runtime on the classpath")
        df.writeTo(ident).append() if mode == "append" else df.writeTo(ident).createOrReplace()
        return
    if uri.startswith("parquet://"):
        uri = uri[len("parquet://") :]
    df.write.mode(mode).parquet(uri)
