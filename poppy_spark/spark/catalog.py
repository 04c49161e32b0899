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


#: formats handled by Spark's native readers, addressable as ``fmt://path``
_NATIVE_FORMATS = ("parquet", "orc", "json", "csv", "text", "avro")


def load_table(spark: SparkSession, uri: str) -> DataFrame:
    """Load ``iceberg://catalog.db.table``, any ``fmt:///path`` for Spark's
    native formats (parquet / orc / json / csv / text / avro), or a bare
    path (treated as parquet).  Line-delimited ``text://`` inputs mirror the
    reference CLI's one-entry-per-line shape (column ``value``)."""
    if uri.startswith("iceberg://"):
        ident = uri[len("iceberg://") :]
        if not iceberg_available(spark):
            raise RuntimeError(
                "no Iceberg runtime on the classpath; add "
                "spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime "
                "or use a parquet:// uri"
            )
        return spark.read.format("iceberg").load(ident)
    for fmt in _NATIVE_FORMATS:
        prefix = fmt + "://"
        if uri.startswith(prefix):
            path = uri[len(prefix) :]
            reader = spark.read
            if fmt == "csv":
                reader = reader.option("header", "true").option("inferSchema", "true")
            return reader.format(fmt).load(path)
    return spark.read.parquet(uri)


def write_table(df: DataFrame, uri: str, mode: str = "append") -> None:
    if uri.startswith("iceberg://"):
        ident = uri[len("iceberg://") :]
        if not iceberg_available(df.sparkSession):
            raise RuntimeError("no Iceberg runtime on the classpath")
        df.writeTo(ident).append() if mode == "append" else df.writeTo(ident).createOrReplace()
        return
    for fmt in _NATIVE_FORMATS:
        prefix = fmt + "://"
        if uri.startswith(prefix):
            writer = df.write.mode(mode)
            if fmt == "csv":
                writer = writer.option("header", "true")
            writer.format(fmt).save(uri[len(prefix) :])
            return
    df.write.mode(mode).parquet(uri)
