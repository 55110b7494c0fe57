"""Streaming/batch agreement: the Structured Streaming twins produce
exactly the batch answers when replaying the same corpus."""

import pytest
from pyspark.sql import functions as F

from stash_log_parser_spark import corpus
from stash_log_parser_spark.functions.parse import parse_corpus
from stash_log_parser_spark.streaming.stream import (
    run_to_memory,
    stream_corpus,
    streaming_git_operations,
    streaming_protocol_counts,
    streaming_sessionize,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("streamcorpus")
    p = str(d / "part1.parquet")
    corpus.write_corpus(p, n_requests_per_day=300, n_days=2, seed=21)
    # re-shard into several files so maxFilesPerTrigger yields >1 microbatch
    df = spark.read.parquet(p).select("doc_id", "tokens", "n_tok", "source")
    out = str(d / "sharded")
    df.repartition(6).write.mode("overwrite").parquet(out)
    return out


def test_streaming_git_operations_equals_batch(spark, corpus_dir):
    stream = stream_corpus(spark, corpus_dir)
    run_to_memory(streaming_git_operations(stream), "sgo")
    got = {
        (r.hour, r.op_type): (r.n, r.hits)
        for r in spark.sql("select * from sgo").collect()
    }
    batch = parse_corpus(spark.read.parquet(corpus_dir)).filter(
        F.col("is_parsed") & F.col("op_type").isNotNull()
    )
    want = {
        (r.hour, r.op_type): (r.n, r.hits)
        for r in batch.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "op_type",
        )
        .agg(F.count("*").alias("n"), F.sum(F.col("cache_hit").cast("long")).alias("hits"))
        .collect()
    }
    assert got == want and len(got) > 10


def test_streaming_protocol_counts_equals_batch(spark, corpus_dir):
    stream = stream_corpus(spark, corpus_dir)
    run_to_memory(streaming_protocol_counts(stream), "spc")
    got = {r.protocol: r.n for r in spark.sql("select * from spc").collect()}
    batch = parse_corpus(spark.read.parquet(corpus_dir)).filter("is_parsed")
    want = {r.protocol: r[1] for r in batch.groupBy("protocol").count().collect()}
    assert got == want


def test_streaming_sessionize_matches_batch_session_count(spark):
    """session_window sessions == the batch lag+prefix-sum session count
    (same 30-min gap definition) on the events table."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = "/tmp/slp_stream_events"
    ev.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 2).parquet(d)
    )
    run_to_memory(streaming_sessionize(stream), "ssess")
    got = {
        r.user_id: r.n
        for r in spark.sql(
            "select user_id, count(*) n from ssess group by user_id"
        ).collect()
    }
    import __spark_entry__ as E

    want = {
        r.user_id: r.n_sessions
        for r in E.queries()["events_sessionize"](spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want


def test_stateful_pairing_across_microbatches(spark, tmp_path):
    """applyInPandasWithState pairing: pairs that straddle micro-batches
    match exactly the batch pairing result (i events land in file 1,
    their o events partly in file 2; maxFilesPerTrigger=1 forces
    sequential micro-batches)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from stash_log_parser_spark.functions.parse import parse_corpus
    from stash_log_parser_spark.operators.analyses import pair_requests
    from stash_log_parser_spark.streaming.stream import (
        run_to_memory,
        streaming_pair_requests,
    )

    p = str(tmp_path / "c.parquet")
    corpus.write_corpus(p, n_requests_per_day=150, n_days=1, seed=31)
    full = spark.read.parquet(p).select("doc_id", "tokens", "n_tok", "source")
    # time-ordered halves → many pairs straddle the file boundary
    rows = full.collect()
    half = len(rows) // 2
    d = str(tmp_path / "stream_in")
    spark.createDataFrame(rows[:half], full.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    spark.createDataFrame(rows[half:], full.schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream = (
        spark.readStream.schema(full.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = run_to_memory(
        streaming_pair_requests(parse_corpus(stream)), "spairs", output_mode="append"
    )
    assert len(q.recentProgress) >= 2  # really multiple micro-batches
    got = {
        (r.day, r.req_counter): (r.ts_in, r.ts_out, r.latency_ms)
        for r in spark.sql("select * from spairs where matched").collect()
    }
    want = {
        (str(r.day), r.req_counter): (r.ts_in, r.ts_out, r.latency_ms)
        for r in pair_requests(parse_corpus(full))
        .filter("ts_in is not null and ts_out is not null")
        .collect()
    }
    assert got == want and len(got) > 100
