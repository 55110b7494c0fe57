"""Structured Streaming variant of the pipeline (SURVEY.md §3.8 T2/T3).

The reference is strictly batch; this is the optional streaming twin:
the same decode/grok (mapInArrow and every Catalyst expression work
unchanged under Structured Streaming) feeding watermarked tumbling-
window aggregates. Kept small — the north rule doesn't gate on it —
but each piece is tested for batch/stream agreement:

* :func:`streaming_git_operations` — 1-hour tumbling windows on ``ts``
  with a watermark: the streaming twin of analyses A5.
* :func:`streaming_protocol_counts` — running protocol totals (A4).
* :func:`streaming_sessionize` — ``session_window`` 30-min gap
  sessions: the native streaming twin of the batch lag+prefix-sum
  sessionization in __spark_entry__._q_events_sessionize.

At scale the source is Kafka / an Iceberg CDC stream; here the file
source replays the same parquet corpus so tests can assert the
streaming results equal the batch results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.parse import parse_corpus

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def stream_corpus(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over a tokenized-corpus parquet directory."""
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def streaming_git_operations(
    stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Per-hour git-op counts over a tokenized log stream (A5 twin).

    Watermark bounds state: windows older than max(ts) − watermark are
    finalized and their state dropped — the knob that keeps a forever-
    running job at bounded memory.
    """
    parsed = parse_corpus(stream)
    ops = parsed.filter(F.col("is_parsed") & F.col("op_type").isNotNull())
    return (
        ops.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "op_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("cache_hit").cast("long")).alias("hits"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            "op_type",
            "n",
            "hits",
        )
    )


def streaming_protocol_counts(stream: DataFrame) -> DataFrame:
    parsed = parse_corpus(stream)
    return (
        parsed.filter(F.col("is_parsed"))
        .groupBy("protocol")
        .agg(F.count("*").alias("n"))
    )


def streaming_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows over an event stream: one row per
    (user, session) with its span and event count."""
    # watermarks require TIMESTAMP (with local tz); parquet event tables
    # often carry TIMESTAMP_NTZ — session tz is UTC, so the cast is exact.
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain an availableNow stream into an in-memory table; returns the
    query after completion (used by tests and demos)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
