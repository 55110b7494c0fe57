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

    def write_batch_partitions(
        self, df: DataFrame, sink: str, batch_id: int, partition_col: str = "day"
    ) -> None:
        """Streaming-ingest write: overwrite exactly the (batch, day)
        partitions present in ``df``. Namespacing every micro-batch's
        output under its own ``batch=<id>`` partition makes a foreachBatch
        REPLAY (failure after data write, before checkpoint commit)
        idempotent — the replayed batch overwrites only its own
        partitions — without needing a transactional sink. Readers merge
        partials across batches exactly like the batch pipeline's
        mergeable daily partials."""
        out = df.withColumn("batch", F.lit(int(batch_id)))
        if self.use_iceberg:
            out.writeTo(f"{self.base}.{sink}").overwritePartitions()
        else:
            (
                out.write.mode("overwrite")
                .partitionBy("batch", partition_col)
                .parquet(self._path(sink))
            )

    def write_bucketed(
        self, df: DataFrame, sink: str, col: str = "doc_id", buckets: int = 64
    ) -> None:
        """Bucketed stage layout (SURVEY.md §8.1): co-locate a table by
        ``col`` so id-keyed joins between co-bucketed tables (e.g. the
        routed raw-row token re-attach) are EXCHANGE-FREE — each join
        task reads matching buckets from both sides. Bucket metadata
        lives in the session catalog (parquet alone can't carry it), so
        read back with :meth:`read_bucketed`, not a path read. Under
        Iceberg the equivalent is a ``bucket(N, col)`` partition
        transform + storage-partitioned joins."""
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", self._path(sink))
            .bucketBy(buckets, col)
            .sortBy(col)
            .saveAsTable(self._table_name(sink))
        )

    def compact_partitions(
        self,
        sink: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        partition_col: str = "day",
    ) -> dict:
        """Small-file compaction — the steady-state maintenance op of a
        10^12-row ingest table: day partitions accumulated from many
        incremental/streaming commits are rewritten into ~target-size
        files. Selection is driver-side FS metadata only; each selected
        day is rewritten via the same whole-partition dynamic overwrite
        as normal writes (idempotent — a crash mid-compaction leaves
        either the old or the new file set, both complete). Row
        contents, lineage, and uncompacted days are untouched. Under
        Iceberg this is `rewrite_data_files`; this is the parquet-seam
        equivalent. Returns {day: (files_before, files_after)}."""
        import math
        import shutil

        if self.use_iceberg:
            raise NotImplementedError(
                "Iceberg backend: use CALL catalog.system.rewrite_data_files "
                f"('{self.base}.{sink}') — the snapshot-atomic form of this op."
            )
        path = self._path(sink)
        todo: dict[str, tuple[list[str], int]] = {}
        for name in os.listdir(path):
            if not name.startswith(f"{partition_col}="):
                continue
            day_dir = os.path.join(path, name)
            files = [f for f in os.listdir(day_dir) if f.endswith(".parquet")]
            total = sum(os.path.getsize(os.path.join(day_dir, f)) for f in files)
            want = max(1, math.ceil(total / max(target_file_bytes, 1)))
            if len(files) > want:
                todo[name.split("=", 1)[1]] = (files, want)
        out = {}
        for day, (old_files, want) in sorted(todo.items()):
            day_dir = os.path.join(path, f"{partition_col}={day}")
            # Spark cannot overwrite a path it is lazily reading, so the
            # compacted files are written to a staging dir, MOVED in
            # (new files first — a crash in the window at worst leaves
            # duplicates a re-run cleans, never data loss), then the old
            # files are deleted. Under Iceberg rewrite_data_files makes
            # the whole swap one atomic snapshot commit.
            staging = os.path.join(path, f".compact-{partition_col}={day}")
            (
                self.read(sink)
                .filter(F.col(partition_col).cast("string") == day)
                .repartition(want)
                .drop(partition_col)
                .write.mode("overwrite")
                .parquet(staging)
            )
            moved = []
            for f in os.listdir(staging):
                if f.endswith(".parquet"):
                    dst = os.path.join(day_dir, f"compact-{f}")
                    shutil.move(os.path.join(staging, f), dst)
                    moved.append(dst)
            for f in old_files:
                os.remove(os.path.join(day_dir, f))
            shutil.rmtree(staging, ignore_errors=True)
            out[day] = (len(old_files), len(moved))
        return out

    def read_bucketed(self, sink: str) -> DataFrame:
        return self.spark.table(self._table_name(sink))

    def _table_name(self, sink: str) -> str:
        import re

        return "slp_" + re.sub(r"[^A-Za-z0-9_]", "_", f"{self.base}_{sink}").strip("_")

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
    #
    # The lineage is a tiny driver-side commit log (a handful of rows per
    # run). Writing it through a Spark job costs a full job-scheduling
    # round-trip per sink (~4s measured locally), so the parquet backend
    # appends it with pyarrow directly on the driver; the Iceberg backend
    # appends to a catalog table (one metadata commit). Readers can still
    # load it as a normal parquet directory (``read("_lineage")``).

    def committed(self) -> set[tuple[str, str]]:
        """(sink, day) pairs already committed by previous runs."""
        if self.use_iceberg:
            tbl = f"{self.base}._lineage"
            if not self.spark.catalog.tableExists(tbl):
                return set()
            rows = self.spark.read.table(tbl).select("sink", "day").distinct().collect()
            return {(r.sink, r.day) for r in rows}
        path = self._path("_lineage")
        if not os.path.isdir(path):
            return set()
        import pyarrow.dataset as ds

        t = ds.dataset(path, format="parquet").to_table(columns=["sink", "day"])
        return set(zip(t.column("sink").to_pylist(), t.column("day").to_pylist()))

    def commit(self, entries: list[tuple[str, str, int]], run_id: str) -> None:
        """Append lineage rows for freshly written (sink, day, rows)."""
        if not entries:
            return
        if self.use_iceberg:
            data = [(s, d, n, run_id, i) for i, (s, d, n) in enumerate(entries)]
            df = self.spark.createDataFrame(data, LINEAGE_SCHEMA)
            df.writeTo(f"{self.base}._lineage").append()
            return
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = self._path("_lineage")
        os.makedirs(path, exist_ok=True)
        table = pa.table(
            {
                "sink": [s for s, _, _ in entries],
                "day": [d for _, d, _ in entries],
                "rows": pa.array([int(n) for _, _, n in entries], type=pa.int64()),
                "run_id": [run_id] * len(entries),
                "seq": pa.array(range(len(entries)), type=pa.int64()),
            }
        )
        pq.write_table(table, os.path.join(path, f"commit-{run_id}-{uuid.uuid4().hex}.parquet"))
