"""asof_join and range_join_buckets vs brute-force reference results."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stash_log_parser_spark.operators.joins import asof_join, range_join_buckets


@pytest.fixture(scope="module")
def quotes_trades(spark):
    TS = dt.datetime
    quotes = spark.createDataFrame(
        [
            ("A", TS(2024, 1, 1, 10, 0, 0), 100.0),
            ("A", TS(2024, 1, 1, 10, 0, 5), 101.0),
            ("A", TS(2024, 1, 1, 10, 1, 0), 102.0),
            ("B", TS(2024, 1, 1, 10, 0, 3), 50.0),
        ],
        "sym string, qts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            (1, "A", TS(2024, 1, 1, 10, 0, 4)),   # → 100.0
            (2, "A", TS(2024, 1, 1, 10, 0, 5)),   # equal ts → 101.0
            (3, "A", TS(2024, 1, 1, 10, 5, 0)),   # → 102.0
            (4, "B", TS(2024, 1, 1, 10, 0, 0)),   # before any quote → null
            (5, "B", TS(2024, 1, 1, 10, 0, 30)),  # → 50.0
            (6, "C", TS(2024, 1, 1, 10, 0, 0)),   # no quotes at all → null
        ],
        "trade_id long, sym string, tts timestamp",
    )
    return quotes, trades


def test_asof_join_backward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, "tts", "qts", "sym", "sym", ["price"])
    got = {r.trade_id: r.price for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: 102.0, 4: None, 5: 50.0, 6: None}
    assert out.count() == trades.count()  # left-preserving


def test_asof_join_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, "tts", "qts", "sym", "sym", ["price"],
                    tolerance_seconds=10)
    got = {r.trade_id: r.price for r in out.collect()}
    assert got[3] is None  # 4 minutes stale > 10s tolerance
    assert got[1] == 100.0 and got[2] == 101.0


def test_asof_join_matches_bruteforce_on_real_tables(spark):
    """events × orders as-of by customer: equals the correlated-subquery
    answer computed the O(n²) way on a small slice."""
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").filter("user_id < 40").select(
        "event_id", "user_id", F.col("ts").alias("ets")
    )
    orders = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("tp"))
    )
    fast = asof_join(ev, orders, "ets", "o_orderdate", "user_id", "o_custkey", ["tp"])
    slow = (
        ev.join(orders, (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ets), "left")
        .groupBy("event_id")
        .agg(F.max_by("tp", "o_orderdate").alias("tp"))
    )
    a = {r.event_id: r.tp for r in fast.collect()}
    b = {r.event_id: r.tp for r in slow.collect()}
    assert a == b and len(a) > 50


def test_asof_plan_has_single_shuffle_no_nested_loop(spark, quotes_trades):
    quotes, trades = quotes_trades
    plan = asof_join(trades, quotes, "tts", "qts", "sym", "sym", ["price"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_buckets(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(100)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(1, 5.0, 10.0), (2, 9.5, 12.5), (3, 90.0, 200.0), (4, -5.0, -1.0)],
        "iid long, lo double, hi double",
    )
    for width in (1.0, 3.7, 50.0):
        got = {
            (r.pid, r.iid)
            for r in range_join_buckets(points, intervals, "x", "lo", "hi", width).collect()
        }
        want = {
            (p, i)
            for p in range(100)
            for i, lo, hi in [(1, 5, 10), (2, 9.5, 12.5), (3, 90, 200), (4, -5, -1)]
            if lo <= p <= hi
        }
        assert got == want, f"width={width}"


def test_fuzzy_match_pairs_vs_bruteforce(spark):
    from stash_log_parser_spark.operators.joins import fuzzy_match_pairs

    names = [
        "alice", "alicia", "alise", "bob", "bobb", "bobby",
        "carol", "carole", "karol", "dave", "davey", "davd",
    ]
    df = spark.createDataFrame([(n,) for n in names], "k string")
    got = {(r.key_a, r.key_b, r.distance)
           for r in fuzzy_match_pairs(df, "k", max_distance=2).collect()}

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    # brute force restricted to the SAME blocking contract (shared first
    # char, length band 2) — the blocking recall loss is by construction
    want = {
        (a, b, lev(a, b))
        for a in names for b in names
        if a < b and a[0] == b[0] and abs(len(a) - len(b)) <= 2
        and lev(a, b) <= 2
    }
    assert got == want and len(got) >= 5
    # and the documented miss: karol/carol differ in first char → absent
    assert not any(k == ("carol", "karol", 1) for k in got)


def test_fuzzy_match_plan_is_blocked_not_cartesian(spark):
    from stash_log_parser_spark.operators.joins import fuzzy_match_pairs

    df = spark.createDataFrame([(f"user{i}",) for i in range(50)], "k string")
    plan = (fuzzy_match_pairs(df, "k")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_semi_audit_counts_and_fp_rate(spark):
    from stash_log_parser_spark.operators.joins import bloom_semi_audit

    dim = spark.createDataFrame([(i,) for i in range(50)], "k long")
    # probe: 50 members + 200 non-members
    probe = spark.createDataFrame([(i,) for i in range(250)], "k long")
    r = bloom_semi_audit(probe, dim, "k", "k", n_hashes=4).collect()[0]
    assert r.n_dim_keys == 50 and r.n_probe_keys == 250
    assert r.n_true == 50
    # no false negatives ever: every true member passes
    assert r.n_pass >= r.n_true
    assert r.n_false_pos == r.n_pass - r.n_true
    # 16-bit buckets, 50 keys: P(single-slice collision) ~ 50/65536,
    # all-4 ~ (1e-3)^4 -> expect zero FPs on 200 negatives
    assert r.n_false_pos == 0 and r.fp_rate == 0.0


def test_bloom_semi_audit_matches_python_mirror(spark):
    import hashlib

    from stash_log_parser_spark.operators.joins import bloom_semi_audit

    dim_keys = [f"d{i}" for i in range(30)]
    probe_keys = [f"d{i}" for i in range(10, 90)]
    dim = spark.createDataFrame([(k,) for k in dim_keys], "k string")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k string")
    r = bloom_semi_audit(probe, dim, "k", "k", n_hashes=4).collect()[0]

    def slices(k):
        h = hashlib.md5(k.encode()).hexdigest()
        return {(j, h[4 * j:4 * j + 4]) for j in range(4)}

    bloom = set()
    for k in dim_keys:
        bloom |= slices(k)
    n_pass = sum(1 for k in probe_keys if slices(k) <= bloom)
    n_true = len(set(dim_keys) & set(probe_keys))
    assert (r.n_pass, r.n_true) == (n_pass, n_true)
    assert r.n_filter_entries == len(bloom)


def test_bloom_semi_audit_rejects_bad_n_hashes(spark):
    """md5 has only eight 4-hex slices; a 9th would be '' for every key
    and always hit, silently inflating the audit."""
    import pytest

    from stash_log_parser_spark.operators.joins import bloom_semi_audit

    df = spark.createDataFrame([(1,)], "k long")
    for bad in (0, 9):
        with pytest.raises(ValueError):
            bloom_semi_audit(df, df, "k", "k", n_hashes=bad)


def test_join_size_stats_hand_case(spark):
    from stash_log_parser_spark.operators.joins import join_size_stats

    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k long")
    r = join_size_stats(left, right, "k", "k").collect()[0]
    # k=1: 2*1=2; k=2: 1*2=2 -> 4 join rows, fanout max 2
    assert (r.n_keys_left, r.n_keys_right, r.n_keys_both) == (3, 3, 2)
    assert (r.join_rows, r.max_key_fanout) == (4, 2)


def test_salted_join_equals_plain_join_on_skewed_keys(spark):
    from stash_log_parser_spark.operators.joins import salted_join

    # one hot key (90% of fact rows) + a long tail
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", i * 1.5) for i in range(200)],
        "row_id long, k string, v double",
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(0, 200, 10)],
        "dk string, attr string",
    )
    got = salted_join(fact, dim, "k", "dk", "row_id", n_salt=4)
    want = fact.join(dim, fact.k == dim.dk).select(
        "row_id", "k", "v", "attr"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == ["row_id", "k", "v", "attr"]


def test_salted_join_shuffles_on_salted_key(spark):
    from stash_log_parser_spark.operators.joins import salted_join

    fact = spark.range(100).select(
        F.col("id").alias("row_id"), F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame([("hot", 1)], "dk string, attr int")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_join(fact, dim, "k", "dk", "row_id", n_salt=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the join keys must include the salt (hot key split across 4
    # partitions), and with broadcast off it must be a shuffled join
    assert "_salt" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_salted_join_rejects_bad_n_salt(spark):
    from stash_log_parser_spark.operators.joins import salted_join

    df = spark.createDataFrame([(1, "a")], "row_id long, k string")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", "k", "row_id", n_salt=0)
