"""Deterministic cross-engine HLL (operators/sketches.py)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from stash_log_parser_spark.operators import sketches as S


@pytest.fixture(scope="module")
def keys(spark):
    return spark.createDataFrame(
        [(f"user-{i % 700}",) for i in range(3000)], "k string"
    ).cache()


def _ref_registers(values):
    regs = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:12], 16)
        b, w = h >> 40, h & ((1 << 40) - 1)
        rho = 41 - w.bit_length() if w > 0 else 41
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_match_python_reference(keys):
    got = {r.bucket: r.register for r in S.hll_registers(keys, "k").collect()}
    assert got == _ref_registers([r.k for r in keys.collect()])


def test_hll_estimate_accuracy_and_exact_form(keys):
    """~700 distinct with 256 registers: the standard error is
    1.04/sqrt(256) ~ 6.5 %; assert within 4 sigma, and that the
    estimate equals the closed-form python computation exactly."""
    est = S.hll_estimate(keys, "k").first().hll_estimate
    assert abs(est - 700) / 700 < 0.26
    regs = _ref_registers([r.k for r in keys.collect()])
    m = 256
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    raw = (0.7213 / (1.0 + 1.079 / m)) * m * m / s
    v = m - len(regs)
    expect = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    assert est == math.floor(expect * 1e6 + 0.5) / 1e6


def test_hll_estimate_empty_and_singleton(spark):
    empty = spark.createDataFrame([], "k string")
    assert S.hll_estimate(empty, "k").first().hll_estimate == 0.0
    one = spark.createDataFrame([("x",)], "k string")
    assert 0.9 < S.hll_estimate(one, "k").first().hll_estimate < 1.1


def test_hll_registers_merge_by_elementwise_max(spark, keys):
    """Mergeability — the property that makes the sketch shardable:
    registers(union) == elementwise max of per-shard registers."""
    a = keys.limit(1500)
    b = keys.subtract(a.limit(0)).exceptAll(a)  # the complement shard
    whole = {r.bucket: r.register for r in S.hll_registers(keys, "k").collect()}
    ra = {r.bucket: r.register for r in S.hll_registers(a, "k").collect()}
    rb = {r.bucket: r.register for r in S.hll_registers(b, "k").collect()}
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole


def test_kmv_distinct_exact_below_k_and_estimates_above(spark):
    """Groups under k report exact counts (rel_err 0); groups over k
    report the KMV estimate within 4/sqrt(k) of truth; estimate equals
    the closed-form python computation."""
    rows = [("small", f"v{i}") for i in range(30)] + [
        ("big", f"x{i}") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "source string, word string")
    out = {r.source: r for r in S.kmv_distinct(df, "word", "source", k=64).collect()}
    assert out["small"].n_exact == 30
    assert out["small"].kmv_estimate == 30.0 and out["small"].rel_err == 0.0
    assert out["big"].n_exact == 2000
    assert abs(out["big"].kmv_estimate - 2000) / 2000 < 0.5
    hs = sorted(
        int(hashlib.md5(f"x{i}".encode()).hexdigest()[:12], 16) for i in range(2000)
    )
    expect = math.floor(63.0 * float(1 << 48) / hs[63] * 1e6 + 0.5) / 1e6
    assert out["big"].kmv_estimate == expect


class TestCmsHeavyHitters:
    def _df(self, spark):
        rows = [(f"k{i % 10}",) for i in range(100)] + [("hot",)] * 50
        return spark.createDataFrame(rows, "k string")

    def test_exact_counts_and_order(self, spark):
        out = S.cms_heavy_hitters(self._df(spark), "k", top_k=5).collect()
        assert out[0]["k"] == "hot" and out[0]["exact_count"] == 50
        assert all(r["exact_count"] == 10 for r in out[1:])
        # ties broken by key asc
        assert [r["k"] for r in out[1:]] == ["k0", "k1", "k2", "k3"]

    def test_estimate_never_undercounts(self, spark):
        out = S.cms_heavy_hitters(self._df(spark), "k", width=4, top_k=11).collect()
        assert all(r["cms_est"] >= r["exact_count"] for r in out)
        assert all(r["overcount"] == r["cms_est"] - r["exact_count"] for r in out)

    def test_width_one_degenerates_to_total(self, spark):
        df = self._df(spark)
        total = df.count()
        out = S.cms_heavy_hitters(df, "k", width=1, top_k=3).collect()
        assert all(r["cms_est"] == total for r in out)


class TestHllSliding:
    def test_register_merge_equals_union_registers(self, spark):
        # the mergeability law: elementwise max of two register tables
        # == registers of the union stream
        a = spark.createDataFrame([(f"u{i}",) for i in range(200)], "k string")
        b = spark.createDataFrame([(f"u{i}",) for i in range(150, 400)], "k string")
        ra = {(r["bucket"], ) : r["register"] for r in S.hll_registers(a, "k").collect()}
        rb = {(r["bucket"], ) : r["register"] for r in S.hll_registers(b, "k").collect()}
        merged = {}
        for k, v in list(ra.items()) + list(rb.items()):
            merged[k] = max(merged.get(k, 0), v)
        ru = {
            (r["bucket"],): r["register"]
            for r in S.hll_registers(a.union(b), "k").collect()
        }
        assert merged == ru

    def test_sliding_exact_matches_bruteforce(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        for h in range(30):
            for u in range(h % 5 + 1):  # varying per-hour user sets
                rows.append((base + dt.timedelta(hours=h), (h * 7 + u) % 13))
        ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
        out = {
            r["hr"]: r for r in S.hll_sliding_distinct(ev, window_hours=6).collect()
        }
        # brute force trailing-6h distinct per present hour
        hr0 = int(base.timestamp() // 3600)
        by_hr = {}
        for h in range(30):
            by_hr.setdefault(hr0 + h, set()).update(
                (h * 7 + u) % 13 for u in range(h % 5 + 1)
            )
        for hr, users in by_hr.items():
            want = set()
            for p in range(hr - 5, hr + 1):
                want |= by_hr.get(p, set())
            assert out[hr]["n_exact"] == len(want), hr

    def test_small_range_estimate_is_near_exact(self, spark):
        ev = spark.createDataFrame(
            [("2024-01-01 00:00:00", i) for i in range(50)],
            "ts string, user_id long",
        ).withColumn("ts", F.to_timestamp("ts"))
        r = S.hll_sliding_distinct(ev, window_hours=24).collect()[0]
        assert r["n_exact"] == 50
        assert abs(r["hll_estimate"] - 50) / 50 < 0.25


def test_hll_estimate_by_constant_group_equals_global(spark):
    from stash_log_parser_spark.operators import sketches as SK

    df = spark.createDataFrame([(i % 97,) for i in range(500)], "k long")
    glob = SK.hll_estimate(df, "k").collect()[0].hll_estimate
    regs = SK.hll_registers(df, "k").withColumn("_g", F.lit(1))
    by = SK.hll_estimate_by(regs, "_g").collect()[0].hll_estimate
    # the law the streaming-HLL query relies on: estimate-from-registers
    # is the same function whether grouped or global
    assert by == glob


def test_hll_set_overlap_exact_and_estimates(spark):
    rows = []
    # A = users 0..399 (click), B = users 200..699 (view): overlap 200
    for u in range(400):
        rows.append((u, "click"))
    for u in range(200, 700):
        rows.append((u, "view"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    from stash_log_parser_spark.operators.sketches import hll_set_overlap

    r = hll_set_overlap(df, "user_id", "event_type", "click", "view").collect()[0]
    assert (r.n_exact_a, r.n_exact_b, r.n_exact_both) == (400, 500, 200)
    # 256-register HLL: ~6.5% typical error; assert within 25%
    assert abs(r.est_a - 400) / 400 < 0.25
    assert abs(r.est_b - 500) / 500 < 0.25
    assert abs(r.est_union - 700) / 700 < 0.25
    assert abs(r.est_intersection - 200) / 200 < 0.6
    # inclusion-exclusion consistency of the reported numbers
    assert abs((r.est_a + r.est_b - r.est_union) - r.est_intersection) < 1e-6


def test_heavy_hitters_pigeonhole_completeness(spark):
    from stash_log_parser_spark.operators.sketches import heavy_hitters

    # adversarial spread: word "hot" appears once per doc across many
    # docs (never shard-locally dominant by a landslide) yet is a
    # global heavy hitter; filler words are shard-local noise
    rows = [(i, f"hot filler{i % 17}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = heavy_hitters(docs, k=3, n_shards=8).collect()
    # total words = 200; threshold 200/3 ≈ 66.7; only "hot" (100) passes
    assert [(r.word, r.n_total) for r in got] == [("hot", 100)]
    assert got[0].share == 0.5


def test_heavy_hitters_candidate_cap(spark):
    from stash_log_parser_spark.operators.sketches import heavy_hitters

    docs = spark.createDataFrame(
        [(i, "a b c d") for i in range(50)], "doc_id long, text string"
    )
    # uniform 4-word distribution (25 % each): all pass k=5 (>20 %),
    # none pass k=3 (>33 %)
    got = heavy_hitters(docs, k=5, n_shards=4).collect()
    assert len(got) == 4 and all(r.n_total == 50 for r in got)
    assert heavy_hitters(docs, k=3, n_shards=4).collect() == []
