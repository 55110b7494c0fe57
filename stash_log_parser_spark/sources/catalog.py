"""Storage seam: per-analysis sinks + lineage, Iceberg or plain parquet.

In production the pipeline writes Iceberg tables
(``df.writeTo(tbl).overwritePartitions()`` — atomic per-partition
replace). This sandbox has no Iceberg jar (SURVEY.md §8.4), so the seam
falls back to partitioned parquet with
``partitionOverwriteMode=dynamic``, which gives the same idempotent
overwrite-one-day semantics. Both backends share the lineage protocol:

* every committed (sink, day) partition appends one row to the
  ``_lineage`` table: (sink, day, rows, run_id, committed_at_order);
* a restart consults ``_lineage`` and skips already-committed
  (sink, day) pairs — a partial crash (sink written, lineage not)
  simply rewrites that partition, which is safe because writes are
  whole-partition overwrites (SURVEY.md §3.1 S4, BASELINE.json:14).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = "sink string, day string, rows long, run_id string, seq long"


class SinkCatalog:
    """Catalog of per-analysis sinks rooted at ``base`` (dir or Iceberg ns)."""

    def __init__(self, spark: SparkSession, base: str, use_iceberg: bool | None = None):
        self.spark = spark
        self.base = base.rstrip("/")
        if use_iceberg is None:
            # Iceberg only when a spark catalog is actually configured.
            confs = spark.sparkContext.getConf().getAll()
            use_iceberg = any(k.startswith("spark.sql.catalog.") for k, _ in confs)
        self.use_iceberg = use_iceberg
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # -- sink I/O -----------------------------------------------------------

    def _path(self, sink: str) -> str:
        return f"{self.base}/{sink}"

    def write_partitions(self, df: DataFrame, sink: str, partition_col: str = "day") -> None:
        """Overwrite exactly the day-partitions present in ``df``."""
        if self.use_iceberg:
            df.writeTo(f"{self.base}.{sink}").overwritePartitions()
        else:
            (
                df.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(self._path(sink))
            )

    def read(self, sink: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"{self.base}.{sink}")
        return self.spark.read.parquet(self._path(sink))

    def exists(self, sink: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"{self.base}.{sink}")
        p = self._path(sink)
        return os.path.isdir(p) and any(
            n.startswith(("day=", "_SUCCESS", "part-")) for n in os.listdir(p)
        )

    # -- lineage ------------------------------------------------------------

    def committed(self) -> set[tuple[str, str]]:
        """(sink, day) pairs already committed by previous runs."""
        if not self.exists("_lineage"):
            return set()
        rows = self.read("_lineage").select("sink", "day").distinct().collect()
        return {(r.sink, r.day) for r in rows}

    def commit(self, entries: list[tuple[str, str, int]], run_id: str) -> None:
        """Append lineage rows for freshly written (sink, day, rows)."""
        if not entries:
            return
        data = [(s, d, n, run_id, i) for i, (s, d, n) in enumerate(entries)]
        df = self.spark.createDataFrame(data, LINEAGE_SCHEMA)
        if self.use_iceberg:
            df.writeTo(f"{self.base}._lineage").append()
        else:
            df.coalesce(1).write.mode("append").parquet(self._path("_lineage"))
