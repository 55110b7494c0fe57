"""Mixture sampling and sequence packing (operators/mixture.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from stash_log_parser_spark.operators import mixture as M


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"src{i % 3}", 100 + (i * 37) % 900)  # lengths 100..999
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok long").cache()


def test_sample_mixture_matches_python_reference(docs):
    rates = {"src0": 0.5, "src1": 0.0}

    def kept(doc_id, source):
        thr = {"src0": "800000", "src1": "000000"}.get(source, "zzzzzz")
        key = hashlib.md5(f"{doc_id}:{source}".encode()).hexdigest()[:6]
        return key < thr

    want = {
        (i, f"src{i % 3}") for i in range(60) if kept(i, f"src{i % 3}")
    }
    got = {
        (r.doc_id, r.source)
        for r in M.sample_mixture(docs, rates).select("doc_id", "source").collect()
    }
    assert got == want
    assert all(s != "src1" for _, s in got)  # rate 0 drops everything
    assert {s for _, s in got} >= {"src2"}  # default rate keeps unlisted
    # deterministic: same membership on a repartitioned frame
    again = {
        (r.doc_id, r.source)
        for r in M.sample_mixture(docs.repartition(7), rates)
        .select("doc_id", "source")
        .collect()
    }
    assert again == got


def test_sample_mixture_rejects_bad_rate():
    with pytest.raises(ValueError, match="rate"):
        M.rate_threshold(1.5)


def _python_greedy(rows, budget):
    out = {}
    by_src = {}
    for doc_id, src, ln in sorted(rows):
        by_src.setdefault(src, []).append((doc_id, ln))
    for src, docs_ in by_src.items():
        pack, fill = 0, 0
        for doc_id, ln in docs_:
            if fill and fill + ln > budget:
                pack, fill = pack + 1, 0
            out[doc_id] = (pack, fill)
            fill += ln
            if fill >= budget:
                pack, fill = pack + 1, 0
    return out


def test_pack_boundary_offsets_and_ids(docs):
    got = {r.doc_id: r for r in M.pack_sequences(docs, budget=1000).collect()}
    # per source, start offsets are the exclusive prefix sums in id order
    rows = sorted((r.doc_id, r.source, r.n_tok) for r in docs.collect())
    run = {}
    for doc_id, src, ln in rows:
        start = run.get(src, 0)
        r = got[doc_id]
        assert r.start_offset == start
        assert r.pack_id == start // 1000
        assert r.offset_in_pack == start % 1000
        run[src] = start + ln


def test_pack_greedy_matches_python_reference_and_invariants(docs):
    budget = 1000
    rows = [(r.doc_id, r.source, r.n_tok) for r in docs.collect()]
    want = _python_greedy(rows, budget)
    got = {r.doc_id: r for r in M.pack_sequences_greedy(docs, budget=budget).collect()}
    assert {d: (r.pack_id, r.offset_in_pack) for d, r in got.items()} == want
    # invariant: no pack exceeds the budget (no doc here is oversized)
    fill = {}
    for r in got.values():
        key = (r.source, r.pack_id)
        fill[key] = fill.get(key, 0) + r.length
    assert max(fill.values()) <= budget
    # greedy packs at least as tightly as boundary packing never worse
    # than one pack per doc
    assert len(fill) < len(rows)


def test_pack_greedy_oversized_doc_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(1, "s", 100), (2, "s", 5000), (3, "s", 100)],
        "doc_id long, source string, n_tok long",
    )
    got = {r.doc_id: r for r in M.pack_sequences_greedy(df, budget=1000).collect()}
    assert got[1].pack_id == 0 and got[1].offset_in_pack == 0
    assert got[2].pack_id == 1 and got[2].offset_in_pack == 0  # oversized, alone
    assert got[3].pack_id == 2 and got[3].offset_in_pack == 0


def test_pack_rejects_bad_budget(docs):
    with pytest.raises(ValueError, match="budget"):
        M.pack_sequences(docs, budget=0)
    with pytest.raises(ValueError, match="budget"):
        M.pack_sequences_greedy(docs, budget=-5)


def test_quality_stratified_sample_tiers(spark):
    """Tier resolution: highest matching tier wins; default applies
    below every tier; rate 1.0 keeps everything in the tier."""
    from stash_log_parser_spark.operators.mixture import quality_stratified_sample

    rows = [(i, 0.9 if i < 40 else (0.72 if i < 80 else 0.1)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, q double")
    kept = quality_stratified_sample(
        df, "q", [(0.8, 1.0), (0.7, 0.5)], default_rate=0.0
    ).collect()
    by_tier = {"hi": 0, "mid": 0, "lo": 0}
    for r in kept:
        by_tier["hi" if r.q == 0.9 else "mid" if r.q == 0.72 else "lo"] += 1
    assert by_tier["hi"] == 40          # rate 1.0 keeps all
    assert 0 < by_tier["mid"] < 40      # rate 0.5 keeps roughly half
    assert by_tier["lo"] == 0           # default 0.0 drops all
    # determinism: exact same rows on a re-run
    again = quality_stratified_sample(
        df, "q", [(0.8, 1.0), (0.7, 0.5)], default_rate=0.0
    ).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)


# ---------------------------------------------------------------------------
# select_token_budget
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def scored_docs(spark):
    rows = [
        (i, round((i * 17 % 100) / 100.0, 6), 100 + (i * 37) % 900)
        for i in range(80)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, quality_score double, n_chars long"
    ).cache()


def test_select_token_budget_equals_global_window(scored_docs):
    """The two-level parallel scan must be row-identical to the naive
    single global prefix sum (the SQL oracle's form)."""
    from pyspark.sql import Window

    budget = 9_000
    out = {
        r.doc_id: (r.cum_before, r.n_chars)
        for r in M.select_token_budget(scored_docs, budget=budget).collect()
    }
    w = Window.orderBy(F.desc("quality_score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = {
        r.doc_id: (r.cb, r.n_chars)
        for r in scored_docs.withColumn(
            "cb", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        )
        .filter(F.col("cb") < budget)
        .collect()
    }
    assert out == naive
    # greedy-prefix property: kept docs are exactly a prefix of the
    # quality-ordered corpus, and the budget is respected pre-overflow
    kept_tot = sum(v[1] for v in out.values())
    max_start = max(v[0] for v in out.values())
    assert max_start < budget <= kept_tot + max(v[1] for v in out.values())


def test_select_token_budget_edges(scored_docs):
    # zero budget keeps nothing; huge budget keeps everything
    assert M.select_token_budget(scored_docs, budget=0).count() == 0
    assert (
        M.select_token_budget(scored_docs, budget=10**12).count()
        == scored_docs.count()
    )


# ---------------------------------------------------------------------------
# dsir_importance
# ---------------------------------------------------------------------------


def _dsir_reference(rows, target_source, n_buckets=64):
    """Pure-python mirror of dsir_importance's exact integer-micro
    arithmetic."""
    import math
    import re

    def grams_of(text):
        ws = re.split(r"\s+", text.strip().lower())
        gs = list(ws)
        if len(ws) >= 2:
            gs += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        return gs

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:6], 16) % n_buckets

    cb: dict[int, int] = {}
    tb: dict[int, int] = {}
    feats = []
    for doc_id, source, text in rows:
        bs = [bucket(g) for g in grams_of(text)]
        feats.append((doc_id, bs))
        for b in bs:
            cb[b] = cb.get(b, 0) + 1
            if source == target_source:
                tb[b] = tb.get(b, 0) + 1
    llr = {
        b: math.floor(
            (math.log(tb.get(b, 0) + 1.0) - math.log(c + 1.0)) * 1e6 + 0.5
        )
        for b, c in cb.items()
    }
    C, T = sum(cb.values()), sum(tb.values())
    k = math.floor(
        (math.log(C + float(n_buckets)) - math.log(T + float(n_buckets))) * 1e6
        + 0.5
    )
    return {
        doc_id: (len(bs), (sum(llr[b] for b in bs) + len(bs) * k) / 1e6)
        for doc_id, bs in feats
    }


def test_dsir_importance_matches_python_reference(spark):
    rows = [
        (i, f"src{i % 3}", " ".join(f"w{(i * 7 + j) % 23}" for j in range(6)))
        for i in range(45)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: (r.n_grams, r.dsir_score)
        for r in M.dsir_importance(df, "src0", n_buckets=64).collect()
    }
    assert got == _dsir_reference(rows, "src0", n_buckets=64)


def test_dsir_importance_upweights_target_domain(spark):
    """Docs sharing the target domain's distinctive vocabulary must
    score above docs that don't."""
    rows = (
        [(i, "tgt", "alpha beta gamma delta") for i in range(20)]
        + [(100 + i, "crawl", "foo bar baz qux") for i in range(20)]
        + [(200, "crawl", "alpha beta gamma delta"), (201, "crawl", "foo bar baz qux")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    s = {r.doc_id: r.dsir_score for r in M.dsir_importance(df, "tgt").collect()}
    assert s[200] > s[201]  # target-looking crawl doc outranks off-domain
    assert min(s[i] for i in range(20)) > max(
        s[100 + i] for i in range(20)
    )  # every target doc outranks every off-domain doc


def test_weighted_sample_is_weight_proportional_and_deterministic(spark):
    """Heavier rows are sampled more often (checked across disjoint
    id-salted repetitions), and the same input yields the same
    sample."""
    rows = [(i, "s", 10 if i % 2 == 0 else 1000) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out1 = [r.doc_id for r in M.weighted_sample(df, k=40, weight_col="n_chars").collect()]
    out2 = [r.doc_id for r in M.weighted_sample(df, k=40, weight_col="n_chars").collect()]
    assert out1 == out2 and len(out1) == 40
    heavy = sum(1 for i in out1 if i % 2 == 1)
    assert heavy >= 35  # 100x weight ratio -> overwhelmingly heavy picks
    with pytest.raises(ValueError):
        M.weighted_sample(df, k=0, weight_col="n_chars")


def test_weighted_sample_matches_python_reference(spark):
    import hashlib
    import math

    rows = [(i, 50 + (i * 13) % 200) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [(r.doc_id, r.race_key) for r in M.weighted_sample(df, k=10, weight_col="w").collect()]
    keys = []
    for i, w in rows:
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) + 1.0) / 16777217.0
        keys.append((math.floor(-math.log(u) / w * 1e6 + 0.5), i))
    expect = [(i, k) for k, i in sorted(keys)[:10]]
    assert got == expect


class TestChunkDocuments:
    def _chunks(self, spark, text, window=4, stride=2):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return (
            M.chunk_documents(df, window=window, stride=stride)
            .orderBy("chunk_idx")
            .collect()
        )

    def test_even_division_all_full_windows(self, spark):
        words = [f"w{i}" for i in range(10)]
        rows = self._chunks(spark, " ".join(words))  # last=6, 6%2==0
        assert [(r["chunk_idx"], r["start_word"], r["n_words"]) for r in rows] == [
            (0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4),
        ]

    def test_final_window_right_anchored(self, spark):
        words = [f"w{i}" for i in range(11)]  # last=7, 7%2==1 -> extra start 7
        rows = self._chunks(spark, " ".join(words))
        assert [r["start_word"] for r in rows] == [0, 2, 4, 6, 7]
        assert all(r["n_words"] == 4 for r in rows)

    def test_short_doc_single_partial_chunk(self, spark):
        rows = self._chunks(spark, "a b c")
        assert len(rows) == 1
        assert rows[0]["start_word"] == 0 and rows[0]["n_words"] == 3

    def test_md5_binds_chunk_text(self, spark):
        words = [f"tok{i}" for i in range(6)]
        rows = self._chunks(spark, " ".join(words), window=4, stride=2)
        want = hashlib.md5(" ".join(words[2:6]).encode()).hexdigest()
        assert rows[1]["chunk_md5"] == want

    def test_every_word_covered(self, spark):
        words = [f"w{i}" for i in range(23)]
        rows = self._chunks(spark, " ".join(words), window=7, stride=5)
        covered = set()
        for r in rows:
            covered.update(range(r["start_word"], r["start_word"] + r["n_words"]))
        assert covered == set(range(23))


def test_source_temperature_mix_exact(spark):
    import math

    from stash_log_parser_spark.operators.mixture import source_temperature_mix

    rows = [("a",)] * 64 + [("b",)] * 4 + [("c",)] * 1
    df = spark.createDataFrame(rows, "source string")
    out = {r.source: r for r in source_temperature_mix(df).collect()}
    s = {k: math.floor(math.sqrt(n) * 1e6 + 0.5) for k, n in
         {"a": 64, "b": 4, "c": 1}.items()}
    st, nt = sum(s.values()), 69
    for k, n in {"a": 64, "b": 4, "c": 1}.items():
        assert out[k].raw_share == math.floor(n / nt * 1e6 + 0.5) / 1e6
        assert out[k].temp_weight == math.floor(s[k] / st * 1e6 + 0.5) / 1e6
    # temperature compresses the range: the rare source is upsampled
    assert out["c"].upsample_factor > 1 > out["a"].upsample_factor
    assert out["c"].upsample_factor == pytest.approx(
        (s["c"] * nt) / (st * 1), abs=1e-5
    )


def test_mixture_epoch_plan_hand_case(spark):
    from stash_log_parser_spark.operators.mixture import mixture_epoch_plan

    docs = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 300), (3, "b", 1000), (4, "c", 50)],
        "doc_id long, source string, n_chars long",
    )
    out = {
        r.source: r
        for r in mixture_epoch_plan(
            docs, {"a": 0.5, "b": 0.25}, token_budget=2000
        ).collect()
    }
    a = out["a"]
    assert (a.n_docs, a.n_tokens, a.weight_micro, a.target_tokens) == (
        2, 400, 500000, 1000,
    )
    assert a.epochs == 2.5 and a.oversampled
    b = out["b"]
    assert (b.target_tokens, b.epochs, bool(b.oversampled)) == (500, 0.5, False)
    # unlisted source -> weight 0, no target
    c = out["c"]
    assert (c.weight_micro, c.target_tokens, c.epochs) == (0, 0, 0.0)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    """Zero weight = zero selection probability (the raw race key would
    be +inf); a NEGATIVE weight would sort FIRST and invert the
    weight-proportional contract — both are filtered up front."""
    rows = [(1, 0), (2, -5), (3, 100), (4, 100), (5, 100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(r.doc_id for r in M.weighted_sample(df, k=5, weight_col="w").collect())
    assert got == [3, 4, 5]


def test_shard_rebalance_counts_and_ring_stability(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    got = {r.strategy: r for r in M.shard_rebalance(docs, 8, 9).collect()}
    assert got["mod"].n_docs == got["ring"].n_docs == 200
    # consistent hashing's whole point: adding one shard moves far
    # fewer docs than mod re-hashing (mod moves ~8/9 of them)
    assert got["ring"].n_moved < got["mod"].n_moved
    assert got["mod"].n_moved > 100
    # every moved_frac = n_moved / n_docs round6
    for r in got.values():
        assert r.moved_frac == round(r.n_moved / r.n_docs, 6)


def test_shard_rebalance_ring_matches_python_reference(spark):
    # brute-force the ring assignment in pure python for a few ids
    ids = [3, 17, 42]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    anchors9 = M._ring_anchors(9)
    anchors8 = M._ring_anchors(8)

    def ring(h, anchors):
        return min(
            range(len(anchors)),
            key=lambda s: (((anchors[s] - h) % M.RING_SPACE) * 1024 + s),
        )

    moved = 0
    for i in ids:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        if ring(h, anchors8) != ring(h, anchors9):
            moved += 1
    got = {r.strategy: r for r in M.shard_rebalance(docs, 8, 9).collect()}
    assert got["ring"].n_moved == moved


def _unimax_ref(caps: dict, budget: int) -> dict:
    """Iterative real-waterfilling reference: repeatedly give every
    unfinished source an equal integer share, capping as they fill."""
    alloc = {s: 0 for s in caps}
    live = sorted(caps, key=lambda s: (caps[s], s))
    remaining = budget
    # iterate: cap ascending — once a source is capped, redistribute
    while live:
        share = remaining // len(live)
        s = live[0]
        if caps[s] <= share:
            alloc[s] = caps[s]
            remaining -= caps[s]
            live.pop(0)
        else:
            # nobody else caps either (caps ascending): equal split
            for t in live:
                alloc[t] = share
            break
    return alloc


@pytest.mark.parametrize(
    "budget", [1_000, 50_000, 10_000_000, 100_000_000]
)
def test_unimax_plan_matches_waterfilling_reference(spark, budget):
    rows = [
        (i, f"s{j}", ln)
        for i, (j, ln) in enumerate(
            [(0, 50), (0, 70), (1, 5000), (1, 9000), (2, 400),
             (3, 120000), (3, 80000), (4, 20)]
        )
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    got = {
        r.source: r
        for r in M.unimax_plan(docs, budget, epochs_cap=4.0).collect()
    }
    caps = {s: 4 * n for s, n in
            [("s0", 120), ("s1", 14000), ("s2", 400), ("s3", 200000),
             ("s4", 20)]}
    ref = _unimax_ref(caps, budget)
    for s, want in ref.items():
        assert got[s].cap_toks == caps[s]
        assert got[s].alloc_toks == want, (s, budget)
    assert sum(r.alloc_toks for r in got.values()) <= budget \
        or all(r.capped for r in got.values())


def test_unimax_all_capped_when_budget_exceeds_capacity(spark):
    docs = spark.createDataFrame(
        [(0, "a", 10), (1, "b", 30)], "doc_id long, source string, n_chars long"
    )
    got = {r.source: r for r in
           M.unimax_plan(docs, 10**9, epochs_cap=2.0).collect()}
    assert got["a"].alloc_toks == 20 and got["a"].capped
    assert got["b"].alloc_toks == 60 and got["b"].capped


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_shuffle_order_is_a_permutation_and_deterministic(spark):
    docs = _mk_docs(spark, [(i, "s") for i in range(40)])
    a = M.shuffle_order(docs, n_shards=4, seed=7).collect()
    b = M.shuffle_order(docs, n_shards=4, seed=7).collect()
    assert a == b  # same seed -> identical order, any run
    assert sorted(r.doc_id for r in a) == list(range(40))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert poss == list(range(1, len(poss) + 1)), shard
    # different seed -> different permutation (overwhelmingly)
    c = M.shuffle_order(docs, n_shards=4, seed=8).collect()
    assert [r.doc_id for r in c] != [r.doc_id for r in a]


def test_shuffle_order_stable_under_corpus_growth(spark):
    small = _mk_docs(spark, [(i, "s") for i in range(30)])
    grown = _mk_docs(spark, [(i, "s") for i in range(45)])
    o1 = M.shuffle_order(small, n_shards=4, seed=42).collect()
    o2 = M.shuffle_order(grown, n_shards=4, seed=42).collect()
    rel1 = {}
    for r in o1:
        rel1.setdefault(r.shard, []).append(r.doc_id)
    rel2 = {}
    for r in o2:
        if r.doc_id < 30:
            rel2.setdefault(r.shard, []).append(r.doc_id)
    # new docs never reorder existing pairs within a shard
    assert rel1 == rel2


def test_shuffle_order_rejects_bad_n_shards(spark):
    docs = _mk_docs(spark, [(1, "s")])
    with pytest.raises(ValueError):
        M.shuffle_order(docs, n_shards=0)


def _interleave_ref(rows, seed):
    import hashlib

    per = {}
    for doc_id, source in rows:
        pr = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
        per.setdefault(source, []).append((pr, doc_id))
    out = []
    for source, lst in per.items():
        lst.sort()
        n = len(lst)
        for i, (_, doc_id) in enumerate(lst, 1):
            out.append(((2 * i - 1) / (2 * n), source, i, doc_id))
    out.sort()
    return [(p + 1, doc_id, source, r)
            for p, (_, source, r, doc_id) in enumerate(out)]


def test_interleave_order_matches_python_reference(spark):
    rows = [(i, f"s{i % 3}") for i in range(31)] + [(100 + i, "rare") for i in range(3)]
    docs = _mk_docs(spark, rows)
    got = [(r.pos, r.doc_id, r.source, r.src_rank)
           for r in M.interleave_order(docs, seed=5).collect()]
    assert got == _interleave_ref(rows, 5)


def test_interleave_order_spreads_sources_proportionally(spark):
    # 8 of "a", 8 of "b": stride order must strictly alternate
    rows = [(i, "a") for i in range(8)] + [(10 + i, "b") for i in range(8)]
    got = M.interleave_order(_mk_docs(spark, rows), seed=1).collect()
    sources = [r.source for r in sorted(got, key=lambda r: r.pos)]
    assert all(sources[i] != sources[i + 1] for i in range(0, 16, 2))
    # and a 1-in-4 source appears once in every 4-slot stripe
    rows = [(i, "big") for i in range(12)] + [(50 + i, "small") for i in range(4)]
    got = M.interleave_order(_mk_docs(spark, rows), seed=1).collect()
    order = [r.source for r in sorted(got, key=lambda r: r.pos)]
    for stripe in range(4):
        assert order[stripe * 4 : stripe * 4 + 4].count("small") == 1


def test_order_audit_exact_small(spark):
    # hand-built order: a a b a b b  (positions 1..6)
    order = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "a"), (5, "b"), (6, "b")],
        "pos long, source string",
    )
    got = {r.source: r for r in M.order_audit(order).collect()}
    assert got["a"].n_docs == 3 and got["a"].n_runs == 2
    assert got["a"].max_run == 2 and got["a"].adj_same == 1
    assert got["b"].n_docs == 3 and got["b"].n_runs == 2
    assert got["b"].max_run == 2 and got["b"].adj_same == 1
    # E[adj same] = n_s(n_s-1)/n = 3*2/6 = 1.0 for both
    assert got["a"].exp_adj_same == 1.0


def test_order_audit_flags_unshuffled_order(spark):
    # fully sorted-by-source order: one run each, maximal adjacency
    rows = [(i + 1, "a") for i in range(5)] + [(6 + i, "b") for i in range(5)]
    got = {r.source: r
           for r in M.order_audit(
               spark.createDataFrame(rows, "pos long, source string")
           ).collect()}
    for s in ("a", "b"):
        assert got[s].n_runs == 1 and got[s].max_run == 5
        assert got[s].adj_same == 4
        assert got[s].adj_same > got[s].exp_adj_same  # clumpier than random


def test_domain_cap_equals_single_window_and_caps(spark):
    # 1 hot domain (30 docs), 1 small domain (3 docs), 5 domain-free docs
    rows = (
        [(i, f"x https://hot.example.com/p{i}", 100 + i) for i in range(30)]
        + [(100 + i, "y http://tiny.example.net/q", 50 + i) for i in range(3)]
        + [(200 + i, "no urls here", 10) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    got = M.domain_cap(df, k=4, n_salt=8).collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r.domain, []).append(r)
    # hot domain capped to exactly k, tiny kept whole, url-free absent
    assert len(by_dom["hot.example.com"]) == 4
    assert len(by_dom["tiny.example.net"]) == 3
    assert set(by_dom) == {"hot.example.com", "tiny.example.net"}
    # survivors = single-window reference: top-k by (n_chars DESC, id ASC)
    assert [r.doc_id for r in sorted(by_dom["hot.example.com"],
                                     key=lambda r: r.cap_rank)] == [29, 28, 27, 26]
    assert all(r.n_docs == 30 for r in by_dom["hot.example.com"])
    assert all(r.n_docs == 3 for r in by_dom["tiny.example.net"])


def test_domain_cap_salted_phase_drops_no_winner(spark):
    # adversarial: every doc in ONE domain, n_salt > k so winners spread
    # across salt buckets — two-phase must still equal the global top-k
    rows = [(i, "z https://one.example.org/", 1000 - i) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    got = sorted(
        (r.cap_rank, r.doc_id)
        for r in M.domain_cap(df, k=6, n_salt=16).collect()
    )
    # longest docs are the LOWEST ids here (n_chars = 1000 - i)
    assert got == [(rk, rk - 1) for rk in range(1, 7)]


class TestCurriculumOrder:
    def _docs(self, spark, n=16):
        return spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "doc_id long, n_chars long"
        )

    def test_stages_are_exact_quartiles_and_monotone(self, spark):
        from stash_log_parser_spark.operators.mixture import curriculum_order

        out = curriculum_order(self._docs(spark, 16), n_shards=2).collect()
        stage_of = {r.doc_id: r.stage for r in out}
        # n=16: cuts at cum >= 4, 8, 12 -> values 4, 8, 12
        # doc_id i has n_chars i+1
        assert all(stage_of[i] == 0 for i in range(0, 4))
        assert all(stage_of[i] == 1 for i in range(4, 8))
        assert all(stage_of[i] == 2 for i in range(8, 12))
        assert all(stage_of[i] == 3 for i in range(12, 16))

    def test_positions_contiguous_and_deterministic(self, spark):
        from stash_log_parser_spark.operators.mixture import curriculum_order

        a = curriculum_order(self._docs(spark), n_shards=3, seed=7).collect()
        b = curriculum_order(self._docs(spark), n_shards=3, seed=7).collect()
        assert a == b
        cells = {}
        for r in a:
            cells.setdefault((r.stage, r.shard), []).append(r.pos)
        for ps in cells.values():
            assert sorted(ps) == list(range(1, len(ps) + 1))

    def test_ties_never_straddle_a_cut(self, spark):
        from stash_log_parser_spark.operators.mixture import curriculum_order

        df = spark.createDataFrame(
            [(i, 5) for i in range(8)] + [(100 + i, 9) for i in range(8)],
            "doc_id long, n_chars long",
        )
        out = curriculum_order(df, n_shards=2).collect()
        stages = {r.doc_id: r.stage for r in out}
        assert len({stages[i] for i in range(8)}) == 1
        assert len({stages[100 + i] for i in range(8)}) == 1

    def test_validation(self, spark):
        import pytest as _pytest

        from stash_log_parser_spark.operators.mixture import curriculum_order

        with _pytest.raises(ValueError):
            curriculum_order(self._docs(spark), n_stages=1)
        with _pytest.raises(ValueError):
            curriculum_order(self._docs(spark), n_shards=0)
