"""TripleStore — the storage seam (SURVEY §4.4).

Primary design target is Iceberg (`bucket(N, p)` partition transform, MERGE
INTO for idempotent append, snapshot metadata for resume). The Iceberg
runtime jar is not in this image, so the default implementation is plain
parquet with identical directory partitioning (`p_bucket=<i>/`) plus a JSON
manifest standing in for snapshot metadata. The interface is the contract;
swapping in Iceberg touches only this module.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kr_spark.kb import TRIPLE_KEY, TRIPLE_SCHEMA


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j package traversal never raises (it returns JavaPackage
        # stubs), so force an actual classload
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:
        return False


class ParquetTripleStore:
    """Pred-bucketed parquet triple store with snapshot manifest."""

    def __init__(self, spark: SparkSession, path: str, pred_buckets: int = 16) -> None:
        self.spark = spark
        self.path = path
        self.pred_buckets = pred_buckets

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "p_bucket", F.pmod(F.xxhash64("p"), F.lit(self.pred_buckets))
        )

    def exists(self) -> bool:
        return os.path.isdir(os.path.join(self.path, "data"))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "data")).drop("p_bucket")

    def overwrite(self, df: DataFrame) -> None:
        out = self._with_bucket(df.select(*TRIPLE_SCHEMA.fieldNames()))
        (
            out.repartition(self.pred_buckets, "p_bucket")
            .sortWithinPartitions("p", "s")  # merge-friendly scans (SURVEY §4.4)
            .write.mode("overwrite")
            .partitionBy("p_bucket")
            .parquet(os.path.join(self.path, "data"))
        )
        self._snapshot("overwrite")

    def append_idempotent(self, df: DataFrame) -> None:
        """MERGE-INTO stand-in: left-anti against current keys, append."""
        from kr_spark.kb import anti_join_null_safe

        new = df.select(*TRIPLE_SCHEMA.fieldNames()).dropDuplicates(TRIPLE_KEY)
        if self.exists():
            new = anti_join_null_safe(new, self.read(), TRIPLE_KEY)
            self._with_bucket(new).write.mode("append").partitionBy("p_bucket").parquet(
                os.path.join(self.path, "data")
            )
        else:
            self.overwrite(new)
            return
        self._snapshot("append")

    def _snapshot(self, op: str) -> None:
        os.makedirs(self.path, exist_ok=True)
        manifest = {
            "op": op,
            "ts": time.time(),
            "pred_buckets": self.pred_buckets,
            "format": "parquet",
        }
        with open(os.path.join(self.path, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    def scan_predicate(self, p: str) -> DataFrame:
        """Partition-pruned scan for a predicate-constant pattern: only the
        matching p_bucket directory is read."""
        import pyspark.sql.functions as F2

        bucket = None
        # compute the bucket driver-side with the same hash
        bucket_df = self.spark.range(1).select(
            F2.pmod(F2.xxhash64(F2.lit(p)), F2.lit(self.pred_buckets)).alias("b")
        )
        bucket = bucket_df.collect()[0].b
        path = os.path.join(self.path, "data", f"p_bucket={bucket}")
        return self.spark.read.parquet(path).filter(F2.col("p") == p)


class IcebergTripleStore:
    """Iceberg-backed store — the primary design target (SURVEY §4.4):
    `bucket(N, p)` partition transform, MERGE INTO for idempotent append,
    snapshot metadata for resume. Same interface as ParquetTripleStore but
    addressed by TABLE IDENTIFIER (catalog.db.table), not path.

    Requires iceberg-spark-runtime on the classpath and a configured
    catalog — absent from this image, so only the SQL-generation methods are
    unit-tested here; the execution paths run wherever the jar exists.
    """

    def __init__(self, spark: SparkSession, table: str, pred_buckets: int = 16) -> None:
        self.spark = spark
        self.table = table
        self.pred_buckets = pred_buckets

    # ---- pure SQL generation (unit-testable without the runtime) ----
    def create_sql(self) -> str:
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in TRIPLE_SCHEMA.fields
        )
        return (
            f"CREATE TABLE IF NOT EXISTS {self.table} ({cols}) USING iceberg "
            f"PARTITIONED BY (bucket({self.pred_buckets}, p)) "
            f"TBLPROPERTIES ('write.distribution-mode'='hash', "
            f"'sort-order'='p ASC, s ASC')"
        )

    def merge_sql(self, source_view: str) -> str:
        """Idempotent append as a single MERGE (null-safe key equality —
        o_lang/o_datatype/graph are nullable key parts)."""
        on = " AND ".join(f"t.{c} <=> s.{c}" for c in TRIPLE_KEY)
        return (
            f"MERGE INTO {self.table} t USING {source_view} s ON {on} "
            f"WHEN NOT MATCHED THEN INSERT *"
        )

    # ---- execution paths (need the Iceberg runtime) ----
    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def ensure(self) -> None:
        self.spark.sql(self.create_sql())

    def read(self) -> DataFrame:
        return self.spark.table(self.table)

    def overwrite(self, df: DataFrame) -> None:
        self.ensure()
        out = df.select(*TRIPLE_SCHEMA.fieldNames())
        out.createOrReplaceTempView("__kr_overwrite_src")
        self.spark.sql(f"INSERT OVERWRITE {self.table} SELECT * FROM __kr_overwrite_src")

    def append_idempotent(self, df: DataFrame) -> None:
        self.ensure()
        new = df.select(*TRIPLE_SCHEMA.fieldNames()).dropDuplicates(TRIPLE_KEY)
        new.createOrReplaceTempView("__kr_merge_src")
        self.spark.sql(self.merge_sql("__kr_merge_src"))

    def scan_predicate(self, p: str) -> DataFrame:
        # Iceberg prunes bucket(p) partitions from the p = const predicate
        # automatically — no driver-side bucket math needed
        return self.spark.table(self.table).filter(F.col("p") == p)


def open_store(
    spark: SparkSession,
    path: str,
    pred_buckets: int = 16,
    iceberg_table: str | None = None,
):
    """Factory: the Iceberg store when a table identifier is given and the
    runtime is on the classpath; the layout-identical parquet store
    otherwise."""
    if iceberg_table is not None and iceberg_available(spark):
        return IcebergTripleStore(spark, iceberg_table, pred_buckets)  # pragma: no cover
    return ParquetTripleStore(spark, path, pred_buckets)
