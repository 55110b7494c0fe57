"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the three cost centers of the engine:
  1. the log pipeline itself (decode → grok → analyses → fan-out sinks)
     on a generated tokenized corpus (cached at data/bench_corpus.parquet);
  2. operator shapes over the sf tables (agg / window / join / top-k);
  3. training-data ops (dedup, simhash, knn) over documents/embeddings.

Each query is forced with a noop write (full execution, no driver
collect cost). Extra keys beyond the required ones report pipeline
throughput in sequences/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_CORPUS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "bench_corpus.parquet"
)
BENCH_REQ_PER_DAY = 40_000
BENCH_DAYS = 3


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> dict:
    from stash_log_parser_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )

    if not os.path.exists(BENCH_CORPUS):
        from stash_log_parser_spark.corpus import generate_spark

        from pyspark.sql import functions as F

        gen = generate_spark(spark, BENCH_REQ_PER_DAY, BENCH_DAYS, seed=42)
        # day-aligned shards so the scan parallelizes AND write tasks map
        # to single day-partitions (a real ingest table is range-partitioned)
        gen = gen.repartition(
            BENCH_DAYS * 21, "day", F.pmod(F.xxhash64("doc_id"), F.lit(21))
        )
        gen.drop("line", "day").write.mode("overwrite").parquet(BENCH_CORPUS)

    import __spark_entry__ as E
    from stash_log_parser_spark.functions.parse import parse_corpus
    from stash_log_parser_spark.operators import analyses as A
    from stash_log_parser_spark.plans.routing import run_pipeline

    corpus_rows = spark.read.parquet(BENCH_CORPUS).count()
    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    # Median of N reps per query (round-3 verdict: single-rep timings on
    # the sub-4 s queries showed ±20-40 % run-to-run variance, which made
    # round-over-round comparisons mostly noise). The median is robust to
    # one slow outlier (GC pause, concurrent JVM); `spread` records
    # max−min per query so a noisy sample is visible in the artifact.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))

    def bench(name: str, fn):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 3)
        spread[name] = round(samples[-1] - samples[0], 3)

    # 1. the pipeline itself. One untimed warmup rep first — the same
    # protocol as the scaling bench (BENCH/BASELINE.md): the first run
    # pays one-off JVM/codegen/Python-worker-fork/parquet-footer costs
    # (~8-15s here) that amortize to zero on a long-running ingest job;
    # steady-state throughput is the metric that scales.
    def run_once(tag: str):
        sink_dir = tempfile.mkdtemp(prefix="bench_sinks_")
        try:
            run_pipeline(spark, BENCH_CORPUS, sink_dir, run_id=tag, force=True)
        finally:
            shutil.rmtree(sink_dir, ignore_errors=True)

    run_once("warmup")
    bench("log_pipeline_e2e", lambda: run_once("bench"))
    raw = spark.read.parquet(BENCH_CORPUS)
    bench("log_parse_git_ops", lambda: _force(A.git_operations(parse_corpus(raw))))
    bench("log_max_concurrent", lambda: _force(A.max_concurrent(parse_corpus(raw))))

    # 2. operator shapes on the sf tables
    qs = E.queries()
    for name in [
        "tpch_pricing_summary",
        "tpch_top_customers",
        "tpch_nation_volume",
        "tpch_salted_join",
        "events_hourly_type_counts",
        "events_running_max",
        "events_sessionize",
        "events_percentiles",
    ]:
        bench(name, lambda n=name: _force(qs[n](spark, sf_dir)))

    # 3. training-data ops
    for name in [
        "docs_text_stats",
        "docs_fingerprint",
        "docs_exact_dedup",
        "docs_minhash_lsh_pairs",
        "docs_segment_dedup",
        "docs_simhash",
        "docs_simhash_pairs",
        "docs_pii_scrub",
        "emb_knn_bruteforce",
        "emb_lsh_topk",
        "emb_ivf_topk",
        "log_token_bigram_novelty",
        "docs_pmi_collocations",
        "events_mann_whitney",
        "docs_kneser_ney",
        "emb_silhouette",
        "docs_token_runs",
        "corpus_shuffle_order",
        "corpus_interleave_order",
        "corpus_curriculum_order",
        "docs_quality_auc",
        "docs_hill_tail",
        "log_repo_adamic_adar",
        "docs_prefix_filter_pairs",
        "tpch_basket_rules",
        "log_token_cdc_dedup",
        "emb_mutual_knn_ivf",
        "events_hourly_densified",
        "log_burn_multiwindow",
        "log_erlang_capacity",
        "events_winsorized_lift",
        "events_holt_winters",
        "events_shapley_attribution",
        "log_autoscale_sim",
    ]:
        bench(name, lambda n=name: _force(qs[n](spark, sf_dir)))

    total = round(sum(times.values()), 3)
    result = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "spread": spread,
        "reps": reps,
        "sf": sf_dir,
        "cpus": int(cpus),
        "pipeline_rows": corpus_rows,
        "pipeline_seq_per_sec": round(corpus_rows / times["log_pipeline_e2e"], 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
