"""Token-ID-level diagnostics (operators/tokens.py) — hand cases."""

from pyspark.sql import functions as F

from stash_log_parser_spark.operators.tokens import (
    token_bigram_novelty,
    token_vocab_census,
)


def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_vocab_census_hand_case(spark):
    corpus = _corpus(
        spark,
        [
            ("d1", [65, 65, 66], 3, "s1"),
            ("d2", [65, 67], 2, "s1"),
            ("d3", [200], 1, "s2"),
        ],
    )
    got = {r.source: r for r in token_vocab_census(corpus, top_k=2).collect()}
    s1 = got["s1"]
    assert (s1.n_docs, s1.n_tokens, s1.n_distinct_ids) == (2, 5, 3)
    assert (s1.min_id, s1.max_id, s1.top_id, s1.top_count) == (65, 67, 65, 3)
    assert s1.coverage_topk == 0.8  # top-2 = {65:3, 66:1} → 4/5
    s2 = got["s2"]
    assert (s2.n_tokens, s2.top_id, s2.coverage_topk) == (1, 200, 1.0)


def test_vocab_census_modal_tie_breaks_to_smallest_id(spark):
    corpus = _corpus(spark, [("d1", [9, 3, 3, 9], 4, "s")])
    r = token_vocab_census(corpus).collect()[0]
    assert r.top_id == 3 and r.top_count == 2


def test_bigram_novelty_hand_case(spark):
    corpus = _corpus(
        spark,
        [
            ("d1", [1, 2, 1, 2], 4, "s1"),  # bigrams (1,2),(2,1),(1,2) → 2 distinct / 3
            ("d2", [7], 1, "s1"),           # <2 tokens → no bigrams
            ("d3", [5, 5], 2, "s2"),        # 1/1
        ],
    )
    got = {r.source: r for r in token_bigram_novelty(corpus).collect()}
    assert (got["s1"].n_bigrams, got["s1"].n_distinct_bigrams) == (3, 2)
    assert got["s1"].novelty == 0.666667
    assert got["s2"].novelty == 1.0


def test_bigram_novelty_all_short_docs_is_null(spark):
    corpus = _corpus(spark, [("d1", [1], 1, "s")])
    r = token_bigram_novelty(corpus).collect()[0]
    assert r.n_bigrams == 0 and r.n_distinct_bigrams == 0 and r.novelty is None


def test_bigrams_never_span_documents(spark):
    # two docs ending/starting with the same token: the cross-doc pair
    # (9,9) must NOT appear
    corpus = _corpus(
        spark, [("d1", [1, 9], 2, "s"), ("d2", [9, 2], 2, "s")]
    )
    r = token_bigram_novelty(corpus).collect()[0]
    assert r.n_bigrams == 2 and r.n_distinct_bigrams == 2

def test_prefix_groups_hand_case(spark):
    from stash_log_parser_spark.operators.tokens import token_prefix_groups

    # d1/d2 share the 4-token prefix with different bodies; d3 differs
    # at position 4; d4 is too short to be eligible.
    corpus = _corpus(
        spark,
        [
            ("d1", [1, 2, 3, 4, 99], 5, "s1"),
            ("d2", [1, 2, 3, 4, 7, 8], 6, "s2"),
            ("d3", [1, 2, 3, 5], 4, "s1"),
            ("d4", [1, 2, 3], 3, "s1"),
        ],
    )
    rows = token_prefix_groups(corpus, k=4, top_n=10).collect()
    assert len(rows) == 2  # two eligible prefix groups
    top = rows[0]
    assert (top.n_docs, top.n_sources, top.first_doc) == (2, 2, "d1")
    assert rows[1].n_docs == 1


def test_prefix_groups_top_n_and_tiebreak(spark):
    from stash_log_parser_spark.operators.tokens import token_prefix_groups

    corpus = _corpus(
        spark,
        [("a", [1, 1], 2, "s"), ("b", [2, 2], 2, "s"), ("c", [3, 3], 2, "s")],
    )
    rows = token_prefix_groups(corpus, k=2, top_n=2).collect()
    # all groups size 1 → tie broken by prefix hex ascending, limit 2
    assert len(rows) == 2
    assert rows[0].prefix < rows[1].prefix


def test_token_ngram_decontam_hand_case(spark):
    from stash_log_parser_spark.operators.tokens import token_ngram_decontam

    rows = [
        # eval day d2: one doc with gram (1,2,3)
        ("e1", [1, 2, 3], 3, "s", "d2"),
        # train d1: t1 contains the eval gram (shifted), t2 doesn't,
        # t3 is too short to produce any 3-gram
        ("t1", [9, 1, 2, 3], 4, "s", "d1"),
        ("t2", [4, 5, 6, 7], 4, "s", "d1"),
        ("t3", [1, 2], 2, "s", "d1"),
    ]
    corpus = spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, day string",
    )
    r = token_ngram_decontam(corpus, n=3).collect()[0]
    assert (r.n_train, r.n_contaminated) == (3, 1)
    assert r.contamination_rate == 0.333333


def test_token_ngram_decontam_short_docs_produce_no_grams(spark):
    from stash_log_parser_spark.operators.tokens import token_ngram_decontam

    # the sequence(1, n_tok-n+1) guard: a 1-token doc must not build a
    # descending sequence (Spark counts DOWN on sequence(1, 0))
    rows = [("e", [5], 1, "s", "d2"), ("t", [5], 1, "s", "d1")]
    corpus = spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, day string",
    )
    r = token_ngram_decontam(corpus, n=2).collect()[0]
    assert (r.n_train, r.n_contaminated, r.contamination_rate) == (1, 0, 0.0)


def test_token_day_drift_identical_days_is_zero(spark):
    from stash_log_parser_spark.operators.tokens import token_day_drift

    rows = [
        ("a", [1, 2, 2], 3, "s", "d1"),
        ("b", [1, 2, 2], 3, "s", "d2"),  # identical distribution → PSI 0
        ("c", [9, 9, 9], 3, "s", "d3"),  # disjoint vocab → all skipped
    ]
    corpus = spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, day string",
    )
    got = {r.day: r for r in token_day_drift(corpus).collect()}
    assert set(got) == {"d2", "d3"}
    assert got["d2"].psi_micro == 0 and got["d2"].n_skipped_ids == 0
    assert got["d3"].psi_micro is None and got["d3"].n_skipped_ids == 1


def test_token_truncation_audit_hand_case(spark):
    from stash_log_parser_spark.operators.tokens import token_truncation_audit

    rows = [
        ("a", [0] * 10, 10, "s"),
        ("b", [0] * 3, 3, "s"),
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    r = token_truncation_audit(corpus, max_len=8).collect()[0]
    assert (r.n_docs, r.n_docs_truncated, r.n_tokens, r.n_tokens_lost) == (
        2, 1, 13, 2,
    )
    assert r.loss_rate == 0.153846


def test_token_cdc_alignment_robust(spark):
    """The CDC property fixed-width blocking lacks: prepending ONE token
    shifts every fixed frame, but content-defined boundaries re-sync,
    so the shifted copy still shares most interior chunks with the
    original. An exact copy dedups in full."""
    from stash_log_parser_spark.operators.tokens import token_cdc_chunks

    import hashlib

    # strictly increasing: base has no internal repeats, so every dup
    # chunk below is attributable to the copy or the re-synced shift
    base = list(range(10_000, 10_400))
    shifted = [199] + base
    rows = [
        ("a", base, len(base), "s1"),
        ("b", shifted, len(shifted), "s1"),   # 1-token prepend
        ("c", base, len(base), "s1"),          # exact copy of a
    ]
    out = {r.source: r for r in token_cdc_chunks(_corpus(spark, rows)).collect()}
    r = out["s1"]
    # token conservation: every token lands in exactly one chunk
    assert r.n_tokens == len(base) * 2 + len(shifted)
    # the exact copy alone guarantees >= len(base) dup tokens; the
    # shifted copy must contribute strictly more via re-synced chunks
    assert r.dup_tokens > len(base)
    assert r.n_dup_chunks > 0 and r.n_distinct_chunks < r.n_chunks
    assert abs(r.dup_token_share - r.dup_tokens / r.n_tokens) <= 5e-7


def test_token_cdc_no_dups_distinct_streams(spark):
    """Two unrelated token streams share no chunk; census stays clean."""
    from stash_log_parser_spark.operators.tokens import token_cdc_chunks

    # strictly increasing, disjoint value ranges: no window content can
    # ever recur, within or across docs (a modular sequence would
    # self-repeat past its period and legitimately dedup)
    rows = [
        ("a", list(range(120)), 120, "s1"),
        ("b", list(range(1000, 1120)), 120, "s1"),
    ]
    r = token_cdc_chunks(_corpus(spark, rows)).collect()[0]
    assert r.n_dup_chunks == 0 and r.dup_tokens == 0 and r.dup_token_share == 0.0
    assert r.n_tokens == 240 and r.n_distinct_chunks == r.n_chunks


def test_token_surprisal_hand_case(spark):
    """Census N=5, c(1)=4, c(2)=1: term(1)=floor(ln(1.25)e6+.5)=223144,
    term(2)=floor(ln(5)e6+.5)=1609438; doc b (rarer mix) outranks a."""
    from stash_log_parser_spark.operators.tokens import token_surprisal

    corpus = _corpus(
        spark, [("a", [1, 1, 1], 3, "s"), ("b", [1, 2], 2, "s")]
    )
    rows = token_surprisal(corpus, top_k=5).collect()
    assert [(r.rank, r.doc_id) for r in rows] == [(1, "b"), (2, "a")]
    b, a = rows[0], rows[1]
    assert a.surprisal_e6 == 3 * 223144
    assert b.surprisal_e6 == 223144 + 1609438
    assert b.mean_surprisal == 0.916291
    assert a.n_tok == 3


def test_token_surprisal_topk_and_empty_docs(spark):
    from stash_log_parser_spark.operators.tokens import token_surprisal

    corpus = _corpus(
        spark,
        [("a", [1], 1, "s"), ("b", [2], 1, "s"), ("e", [], 0, "s")],
    )
    rows = token_surprisal(corpus, top_k=1).collect()
    assert len(rows) == 1  # top-1 only; the 0-token doc never scores


def test_token_pmi_hand_case(spark):
    """[5,6,5,6,7]: PMI(5,6)=PMI(6,7)=ln(3.125) tie broken by t1 asc;
    PMI(6,5)=ln(25/16)."""
    from stash_log_parser_spark.operators.tokens import token_pmi

    corpus = _corpus(spark, [("d", [5, 6, 5, 6, 7], 5, "s")])
    rows = token_pmi(corpus, top_k=20, min_count=1).collect()
    got = [(r.rank, r.t1, r.t2, r.pair_count, r.pmi) for r in rows]
    assert got == [
        (1, 5, 6, 2, 1.139434),
        (2, 6, 7, 1, 1.139434),
        (3, 6, 5, 1, 0.446287),
    ]


def test_token_pmi_min_count_gate(spark):
    from stash_log_parser_spark.operators.tokens import token_pmi

    corpus = _corpus(spark, [("d", [5, 6, 5, 6, 7], 5, "s")])
    rows = token_pmi(corpus, min_count=2).collect()
    assert [(r.t1, r.t2) for r in rows] == [(5, 6)]


def test_token_coverage_curve_exact_thresholds(spark):
    """90/9/1 distribution: the permille targets cross at vocab sizes
    1, 1, 2, 3 with exact integer threshold tests."""
    from stash_log_parser_spark.operators.tokens import token_coverage_curve

    tokens = [1] * 90 + [2] * 9 + [3] * 1
    df = spark.createDataFrame(
        [(0, "s", tokens[:50]), (1, "s", tokens[50:])],
        "doc_id long, source string, tokens array<int>",
    )
    out = {r.target_permille: r for r in token_coverage_curve(df).collect()}
    assert out[500].vocab_size == 1 and out[500].cum_count == 90
    assert out[900].vocab_size == 1
    assert out[990].vocab_size == 2 and out[990].cum_count == 99
    assert out[999].vocab_size == 3 and out[999].cum_count == 100
    assert out[999].coverage == 1.0
    assert all(r.total_tokens == 100 for r in out.values())
