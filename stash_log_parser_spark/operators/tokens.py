"""Token-ID-level diagnostics over the pre-tokenized corpus itself.

Every other operator family works on DECODED text or parsed fields;
these two work directly on the ``tokens:array<int32>`` payload — the
audits a training pipeline runs on the token stream it will actually
feed the model, before/without decoding anything:

* :func:`token_vocab_census` — which token ids appear, how often, and
  how concentrated the distribution is (a vocab-coverage audit: a
  byte-level corpus whose top-16 ids cover 95 % of the stream packs
  very differently from a flat one).
* :func:`token_bigram_novelty` — corpus-level distinct/total token
  BIGRAMS per source (the token-level analog of n-gram novelty over
  text: near-zero novelty means the source is template spam).

Exactness: token ids are small ints; bigram ids are ``t1*256 + t2``
(int, collision-free for a byte vocab); every reported count is an
integer and every ratio is one int/int IEEE division, round6-quantized
— value-hash oracled against DuckDB on the same parquet.

Scale shape: both collapse the token stream map-side — the bigram
census exchange carries (source, int32) pairs bounded by
|sources| x 65536 regardless of corpus size, and the vocab census by
|sources| x 256; the token arrays themselves never enter an Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stash_log_parser_spark.operators.textstats import round6


def token_vocab_census(corpus: DataFrame, top_k: int = 16) -> DataFrame:
    """Per-source token-id census: stream size, distinct ids, id range,
    the modal id (ties -> smallest id), and top-``top_k`` coverage.

    Returns one row per source: n_docs, n_tokens, n_distinct_ids,
    min_id, max_id, top_id, top_count, coverage_topk (round6).
    """
    tok = corpus.select(
        "source", "doc_id", F.explode("tokens").alias("t")
    )
    census = tok.groupBy("source", "t").agg(
        F.count("*").cast("long").alias("c"),
        F.countDistinct("doc_id").cast("long").alias("nd"),
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("c"), F.asc("t")
    )
    ranked = census.withColumn("rk", F.row_number().over(w_rank))
    docs_per_source = corpus.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    agg = ranked.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct_ids"),
        F.min("t").cast("int").alias("min_id"),
        F.max("t").cast("int").alias("max_id"),
        F.max(F.when(F.col("rk") == 1, F.col("t"))).cast("int").alias("top_id"),
        F.max(F.when(F.col("rk") == 1, F.col("c"))).cast("long").alias("top_count"),
        F.sum(F.when(F.col("rk") <= top_k, F.col("c")).otherwise(0))
        .cast("long")
        .alias("topk_count"),
    )
    return (
        agg.join(docs_per_source, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_distinct_ids",
            "min_id",
            "max_id",
            "top_id",
            "top_count",
            round6(
                F.col("topk_count").cast("double") / F.col("n_tokens")
            ).alias("coverage_topk"),
        )
        .orderBy("source")
    )


def token_bigram_novelty(corpus: DataFrame) -> DataFrame:
    """Per-source token-bigram novelty: distinct bigrams / total
    bigrams over the whole source's token stream (within-document
    adjacency only — bigrams never span documents).

    Returns one row per source: n_docs, n_bigrams,
    n_distinct_bigrams, novelty (round6). Docs with < 2 tokens
    contribute zero bigrams (guarded — ``sequence(1, 0)`` would count
    DOWN in Spark, not return empty).
    """
    bg = F.when(
        F.col("n_tok") >= 2,
        F.expr("transform(sequence(1, n_tok - 1), k -> tokens[k-1] * 256 + tokens[k])"),
    ).otherwise(F.expr("array()"))
    pairs = corpus.select("source", bg.alias("bg")).select(
        "source", F.explode("bg").alias("b")
    )
    per_doc = corpus.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.greatest(F.col("n_tok").cast("long") - 1, F.lit(0)))
        .cast("long")
        .alias("n_bigrams"),
    )
    agg = pairs.groupBy("source").agg(
        F.countDistinct("b").cast("long").alias("n_distinct_bigrams")
    )
    return (
        per_doc.join(agg, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_bigrams",
            F.coalesce("n_distinct_bigrams", F.lit(0))
            .cast("long")
            .alias("n_distinct_bigrams"),
            F.when(
                F.col("n_bigrams") > 0,
                round6(
                    F.coalesce("n_distinct_bigrams", F.lit(0)).cast("double")
                    / F.col("n_bigrams")
                ),
            ).alias("novelty"),
        )
        .orderBy("source")
    )


def token_prefix_groups(
    corpus: DataFrame, k: int = 16, top_n: int = 20
) -> DataFrame:
    """Shared token-PREFIX boilerplate detection: group docs by the md5
    of their first ``k`` token ids and surface the ``top_n`` largest
    groups.  Exact dedup only catches whole-array equality; this finds
    the "same header, different body" family — templated boilerplate,
    per-client log preambles, copy-pasted licence blocks — which at
    curation time usually means "strip the prefix" rather than "drop
    the doc".  (On the synthetic access-log corpus the prefix is the
    first 16 line bytes, so groups land on remote-IP/protocol
    templates — a realistic boilerplate shape.)

    Key = ``md5(array_join(transform(slice(tokens,1,k), cast str)))``
    rather than xxhash64 so the DuckDB twin reproduces it exactly
    (md5 is 128-bit: at 10^12 docs the collision expectation is
    ~10^-14, vs ~1e-7 for a 64-bit key — same budget note as
    segment_dedup).  Docs shorter than ``k`` tokens are excluded (a
    short doc IS its prefix — that's exact dedup's job).

    Scale shape: only the 32-hex key + source shuffle (≤ ~40 B/row);
    the tokens array never enters an Exchange.  Top-n via
    TakeOrderedAndProject on (n_docs desc, prefix asc)."""
    eligible = corpus.filter(F.col("n_tok") >= k)
    key = F.md5(
        F.array_join(
            F.transform(F.slice("tokens", 1, k), lambda x: x.cast("string")),
            ",",
        )
    )
    groups = (
        eligible.select(key.alias("prefix"), "source", "doc_id")
        .groupBy("prefix")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").alias("first_doc"),
        )
    )
    return groups.orderBy(
        F.col("n_docs").desc(), F.col("prefix").asc()
    ).limit(top_n)


def token_ngram_decontam(
    corpus: DataFrame, n: int = 13, eval_day: str | None = None
) -> DataFrame:
    """Token-level n-gram decontamination census — the canonical
    "does my training set leak the benchmark" check (13-token overlap,
    the GPT-3/PaLM convention), restated over the raw
    ``tokens:array<int32>`` payload so it needs no decode step: a
    TRAIN doc is contaminated iff it shares at least one n-token
    contiguous gram with any EVAL doc.  Here eval = the corpus's last
    ``day`` (a time-based holdout); pass ``eval_day`` to override.

    Devices: each doc's grams are md5 hashes of the comma-joined id
    slice — computed INSIDE the scan projection via
    ``transform(sequence(1, n_tok-n+1), i -> md5(...slice(tokens,i,n)))``
    so only 32-hex gram keys ever reach an Exchange, never the token
    arrays.  Docs shorter than ``n`` tokens produce no grams (filtered
    BEFORE building the sequence — Spark's ``sequence(1, 0)`` counts
    DOWN rather than yielding empty).  Train-side grams dedup per doc
    before the semi join; the eval gram set stays distributed (a
    day-sized dimension can exceed broadcast budgets at 10^12 scale,
    so this is a hash semi join on the gram key, not a broadcast).

    Output per source: n_train docs, n_contaminated, contamination
    rate (round6).  The DuckDB oracle regenerates every gram with
    generate_series + list slicing — full-algorithm mirror."""
    md = eval_day or corpus.agg(F.max("day")).collect()[0][0]
    grams = F.transform(
        F.sequence(F.lit(1), F.col("n_tok") - (n - 1)),
        lambda i: F.md5(
            F.array_join(
                F.transform(
                    F.slice("tokens", i, n), lambda x: x.cast("string")
                ),
                ",",
            )
        ),
    )
    eligible = corpus.filter(F.col("n_tok") >= n)
    train = corpus.filter(F.col("day") != md)
    train_grams = (
        eligible.filter(F.col("day") != md)
        .select("doc_id", "source", F.explode(grams).alias("g"))
        .distinct()
    )
    eval_grams = (
        eligible.filter(F.col("day") == md)
        .select(F.explode(grams).alias("g"))
        .distinct()
    )
    contaminated = (
        train_grams.join(eval_grams, "g", "leftsemi")
        .select("doc_id", "source")
        .distinct()
    )
    per_source = train.groupBy("source").agg(
        F.count("*").cast("long").alias("n_train")
    )
    hit = contaminated.groupBy("source").agg(
        F.count("*").cast("long").alias("n_contaminated")
    )
    return (
        per_source.join(hit, "source", "left")
        .select(
            "source",
            "n_train",
            F.coalesce("n_contaminated", F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            round6(
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_train")
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


def token_day_drift(corpus: DataFrame) -> DataFrame:
    """Per-day Population Stability Index of the TOKEN-ID distribution
    against the corpus's first day — the trainer-side drift alarm that
    catches a tokenizer/encoding change or an upstream content shift
    before it poisons a training run, computed straight off the
    ``tokens`` payload.

    Same engine-exact discipline as psi_value_drift: fixed buckets
    (the token ids themselves — a byte vocab is <= 256 bins), each
    PSI term ``(p_d − p_base)·ln(p_d/p_base)`` quantized to 1e-6
    BEFORE summing, so the per-day total is a BIGINT sum of integers
    (no float-order risk); ids with no base-day count are skipped
    (classic PSI epsilon-dodge) and counted in ``n_skipped_ids``
    (day-side only — base ids absent from day d contribute no row; on
    a byte vocab both cases are vanishingly rare).

    Scale shape: the token explode collapses map-side into a
    (day, token) census bounded by |days| × 256 rows; day totals and
    the base-day histogram join are census-sized."""
    tok = corpus.select("day", F.explode("tokens").alias("t"))
    census = tok.groupBy("day", "t").agg(
        F.count("*").cast("long").alias("n")
    )
    day_tot = census.groupBy("day").agg(
        F.sum("n").cast("long").alias("tot")
    )
    base_day = corpus.agg(F.min("day").alias("d0"))
    base = (
        census.join(F.broadcast(base_day), F.col("day") == F.col("d0"))
        .select(F.col("t"), F.col("n").alias("n_b"))
    )
    base_tot = base.agg(F.sum("n_b").cast("long").alias("tot_b"))
    cur = (
        census.join(F.broadcast(base_day), F.col("day") != F.col("d0"))
        .drop("d0")
        .join(base, "t", "full")
        .filter(F.col("day").isNotNull())
        .join(day_tot, "day")
        .crossJoin(F.broadcast(base_tot))
    )
    p_d = F.col("n") / F.col("tot")
    p_b = F.col("n_b") / F.col("tot_b")
    both = F.col("n").isNotNull() & F.col("n_b").isNotNull()
    term = F.when(
        both,
        F.floor((p_d - p_b) * F.log(p_d / p_b) * 1e6 + F.lit(0.5)).cast(
            "long"
        ),
    )
    return (
        cur.select("day", "tot", term.alias("e6"), both.alias("b"))
        .groupBy("day")
        .agg(
            F.max("tot").cast("long").alias("n_tokens"),
            F.sum("e6").cast("long").alias("psi_micro"),
            F.sum((~F.col("b")).cast("long")).cast("long").alias("n_skipped_ids"),
        )
        .orderBy("day")
    )


def token_truncation_audit(corpus: DataFrame, max_len: int = 150) -> DataFrame:
    """Truncation-loss audit for a fixed sequence budget: if training
    truncates every sequence at ``max_len`` tokens, how many tokens —
    and which sources — does the cut actually discard?  The question
    every max-seq-len decision should be costed with, answerable from
    (n_tok, source) alone: a pure scan projection + |sources|-group
    rollup, no token array ever read.

    Per source: n_docs, n_docs_truncated, n_tokens, n_tokens_lost,
    loss_rate (round6)."""
    over = F.greatest(F.col("n_tok").cast("long") - max_len, F.lit(0))
    return (
        corpus.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("n_tok") > max_len).cast("long"))
            .cast("long")
            .alias("n_docs_truncated"),
            F.sum(F.col("n_tok").cast("long")).cast("long").alias("n_tokens"),
            F.sum(over).cast("long").alias("n_tokens_lost"),
        )
        .select(
            "source",
            "n_docs",
            "n_docs_truncated",
            "n_tokens",
            "n_tokens_lost",
            round6(
                F.col("n_tokens_lost").cast("double") / F.col("n_tokens")
            ).alias("loss_rate"),
        )
        .orderBy("source")
    )


def token_cdc_chunks(
    corpus: DataFrame, window: int = 4, boundary_hex: str = "0"
) -> DataFrame:
    """Content-defined-chunking dedup census over the raw token stream
    (the FastCDC/LBFS rolling-boundary idea — Muthitacharoen et al.
    SOSP'01; public technique): a chunk boundary falls AFTER position i
    whenever the hash of the ``window`` tokens ending at i lands in the
    boundary class (md5 hex prefix ``boundary_hex`` — p = 16^-len,
    mean chunk ≈ 16 tokens for one hex char).  Because boundaries
    depend only on CONTENT, two sequences sharing a long token run
    produce identical interior chunks regardless of alignment — the
    dedup that fixed-width blocking misses when one token shifts the
    frame (and what line/segment dedup misses when templates differ in
    a field mid-line).

    Per source: n_docs, n_tokens, n_chunks, n_distinct_chunks,
    n_dup_chunks (occurrences that are not the GLOBAL first of their
    chunk hash, ordered by (doc_id, chunk)), dup_tokens,
    dup_token_share (round6).

    Exactness: boundaries and chunk identities are md5-of-decimal-CSV
    strings — engine-portable, no xxhash in the contract; every count
    is a BIGINT; one division, round6.

    Scale shape: the posexplode is fact×seq_len but embarrassingly
    parallel; both windows (lag hash, boundary prefix-sum) share ONE
    per-doc sort bounded by seq_len; the chunk census exchanges
    (32-hex, long) pairs at ~1/16 of token volume.  The global
    first-occurrence window partitions by chunk hash — the same
    hash-keyed shape as segment_dedup, with the same 128-bit-md5
    no-collision guarantee exact dedup relies on."""
    tok = corpus.select(
        "source", "doc_id", F.posexplode("tokens").alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lags = [F.lag("t", i).over(w) for i in range(window - 1, 0, -1)]
    bh = F.md5(F.concat_ws(",", *[c.cast("string") for c in lags],
                           F.col("t").cast("string")))
    flag = (
        (F.col("pos") >= F.lit(window - 1))
        & bh.startswith(boundary_hex)
    ).cast("long")
    flagged = tok.withColumn("_b", flag)
    cum = F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, -1))
    chunked = flagged.withColumn("chunk", F.coalesce(cum, F.lit(0)))
    chunks = chunked.groupBy("source", "doc_id", "chunk").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "t"))),
                    lambda x: x["t"].cast("string"),
                ),
            )
        ).alias("h"),
        F.count("*").cast("long").alias("chunk_len"),
    )
    first = Window.partitionBy("h").orderBy("doc_id", "chunk")
    occ = chunks.withColumn(
        "_dup", (F.row_number().over(first) > 1).cast("long")
    )
    return (
        occ.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("chunk_len").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_chunks"),
            F.countDistinct("h").cast("long").alias("n_distinct_chunks"),
            F.sum("_dup").cast("long").alias("n_dup_chunks"),
            F.sum(F.col("_dup") * F.col("chunk_len"))
            .cast("long")
            .alias("dup_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chunks",
            "n_distinct_chunks",
            "n_dup_chunks",
            "dup_tokens",
            round6(F.col("dup_tokens") / F.col("n_tokens")).alias(
                "dup_token_share"
            ),
        )
        .orderBy("source")
    )


def token_surprisal(corpus: DataFrame, top_k: int = 5) -> DataFrame:
    """Top-``top_k`` most SURPRISING sequences per source under the
    corpus-global unigram token LM — the data-selection readout a
    training pipeline runs to mine hard/novel sequences (and, inverted,
    to spot template spam whose every token is maximally predictable).

    Per token id ``t`` with global count ``c`` over ``N`` total tokens,
    the surprisal is ``ln(N/c)`` nats, e6-quantized to a BIGINT term
    ``floor(ln(N/c)·1e6 + 0.5)`` so per-doc accumulation is EXACT
    integer addition (order-independent — the same discipline as every
    other float-adjacent census here). A doc's score is the mean term,
    ranked by the integer ``floor(sum_e6 / n_tok)`` with doc_id
    tie-break so both engines agree bit-for-bit.

    Returns (source, rank, doc_id, n_tok, surprisal_e6, mean_surprisal)
    — ``surprisal_e6`` the exact BIGINT sum, ``mean_surprisal`` the
    readable nats/token (round6).

    Scale shape: the vocab census is one explode + hash-agg collapsing
    map-side to ≤ |vocab| rows (256 for a byte vocab) and re-enters as
    a broadcast; per-doc scoring shuffles (doc_id, partial-sum) pairs —
    the doc-count-sized exchange any per-sequence score needs — and the
    top-k is a source-keyed window over the narrow score frame. Token
    arrays never enter an Exchange. Ln parity: one division then one
    IEEE ln, identical on the JVM and DuckDB (the tfidf/bigram-LM
    oracle convention).
    """
    docs = corpus.filter(F.col("n_tok") > 0)
    tok = docs.select("doc_id", F.explode("tokens").alias("t"))
    census = tok.groupBy("t").agg(F.count("*").cast("long").alias("c"))
    n_total = census.agg(F.sum("c").cast("long").alias("N"))
    term = census.crossJoin(F.broadcast(n_total)).select(
        "t",
        F.floor(
            F.log(F.col("N").cast("double") / F.col("c")) * 1e6 + F.lit(0.5)
        )
        .cast("long")
        .alias("term_e6"),
    )
    scored = (
        tok.join(F.broadcast(term), "t")
        .groupBy("doc_id")
        .agg(F.sum("term_e6").cast("long").alias("surprisal_e6"))
        .join(docs.select("doc_id", "source", "n_tok"), "doc_id")
        .withColumn(
            "mean_e6",
            F.floor(
                F.col("surprisal_e6").cast("double") / F.col("n_tok")
            ).cast("long"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("mean_e6"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "source",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tok"),
            "surprisal_e6",
            round6(
                F.col("surprisal_e6").cast("double")
                / F.col("n_tok")
                / F.lit(1000000.0)
            ).alias("mean_surprisal"),
        )
        .orderBy("source", "rank")
    )


def token_pmi(
    corpus: DataFrame, top_k: int = 20, min_count: int = 5
) -> DataFrame:
    """Top-``top_k`` token-bigram collocations per source by pointwise
    mutual information — which token pairs co-occur far above chance in
    each source's stream (the collocation mining that surfaces protocol
    idioms in a byte-tokenized log corpus and multi-token units in
    text). ``PMI(x,y) = ln( p(xy) / (p(x)·p(y)) )`` with p(xy) over
    within-doc adjacent pairs and p(x) over unigrams, per source.

    Exactness: all counts are BIGINT census sums; the PMI ratio is ONE
    double expression ``(c_xy·N·N) / (N_bg·c_x·c_y)`` evaluated
    left-to-right identically on both engines, then one IEEE ln,
    e6-quantized. Low-count noise (PMI's known failure mode) is gated
    by ``min_count``.

    Scale shape: the bigram census collapses map-side to at most
    |sources|·|vocab|² rows regardless of corpus size; the unigram
    census and per-source totals are vocab-/source-sized broadcasts;
    ranking is a window over the census. No token array in any
    Exchange.
    """
    docs = corpus.filter(F.col("n_tok") > 0)
    pair = F.when(
        F.col("n_tok") >= 2,
        F.expr(
            "transform(sequence(1, n_tok - 1),"
            " k -> struct(tokens[k-1] AS t1, tokens[k] AS t2))"
        ),
    ).otherwise(F.expr("array()"))
    bg = (
        docs.select("source", F.explode(pair).alias("p"))
        .select("source", F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .groupBy("source", "t1", "t2")
        .agg(F.count("*").cast("long").alias("c_xy"))
    )
    uni = (
        docs.select("source", F.explode("tokens").alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = docs.groupBy("source").agg(
        F.sum(F.col("n_tok").cast("long")).alias("N"),
        F.sum(F.greatest(F.col("n_tok").cast("long") - 1, F.lit(0))).alias(
            "N_bg"
        ),
    )
    joined = (
        bg.join(
            F.broadcast(uni.select("source", F.col("t").alias("t1"), F.col("c").alias("c_x"))),
            ["source", "t1"],
        )
        .join(
            F.broadcast(uni.select("source", F.col("t").alias("t2"), F.col("c").alias("c_y"))),
            ["source", "t2"],
        )
        .join(F.broadcast(tot), "source")
        .filter(F.col("c_xy") >= min_count)
        .withColumn(
            "pmi_e6",
            F.floor(
                F.log(
                    (F.col("c_xy").cast("double") * F.col("N") * F.col("N"))
                    / (
                        F.col("N_bg").cast("double")
                        * F.col("c_x")
                        * F.col("c_y")
                    )
                )
                * 1e6
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("pmi_e6"), F.asc("t1"), F.asc("t2")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "source",
            F.col("rank").cast("int").alias("rank"),
            F.col("t1").cast("int").alias("t1"),
            F.col("t2").cast("int").alias("t2"),
            F.col("c_xy").alias("pair_count"),
            round6(F.col("pmi_e6").cast("double") / F.lit(1000000.0)).alias(
                "pmi"
            ),
        )
        .orderBy("source", "rank")
    )


def token_coverage_curve(
    corpus: DataFrame,
    targets_permille: tuple[int, ...] = (500, 900, 990, 999),
) -> DataFrame:
    """Vocab-SIZING curve over the corpus-global token-id distribution:
    for each coverage target, the minimal vocabulary size (token ids
    kept, most-frequent first) whose cumulative frequency mass reaches
    the target. The inverse question of token_vocab_census's fixed
    top-k coverage — this is the number a tokenizer designer actually
    reads off ("99 % of the stream is N ids") when trading vocab size
    against OOV/byte-fallback rate.

    Returns one row per target: (target_permille, vocab_size,
    cum_count, total_tokens, coverage) — coverage = cum/total round6;
    ranking ties break by smaller id so the curve is deterministic.

    Exactness: the threshold test is pure int64 — cum·1000 ≥ p·total —
    so no float ever decides a rank; the reported coverage is one
    int/int IEEE division.

    Scale shape: the only corpus-scale stage is the token census
    (map-side partials bound the exchange by |vocab| per partition);
    the ranked cumsum window runs on the VOCAB-sized census (the same
    documented dimension-sized global window as word_rarity), and the
    target join broadcasts a literal ≤4-row frame.
    """
    census = (
        corpus.select(F.explode("tokens").alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = (
        Window.orderBy(F.desc("c"), F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = census.select(
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("t")))
        .cast("long")
        .alias("rk"),
        F.sum("c").over(w).cast("long").alias("cum"),
    )
    total = ranked.agg(F.max("cum").cast("long").alias("total"))
    targets = corpus.sparkSession.createDataFrame(
        [(int(p),) for p in sorted(targets_permille)], "p long"
    )
    hit = (
        ranked.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(targets))
        .filter(F.col("cum") * 1000 >= F.col("p") * F.col("total"))
        .groupBy("p")
        .agg(F.min("rk").cast("long").alias("vocab_size"))
    )
    return (
        hit.join(ranked, hit["vocab_size"] == ranked["rk"])
        .crossJoin(F.broadcast(total))
        .select(
            F.col("p").alias("target_permille"),
            "vocab_size",
            F.col("cum").alias("cum_count"),
            F.col("total").alias("total_tokens"),
            round6(F.col("cum").cast("double") / F.col("total").cast("double")).alias(
                "coverage"
            ),
        )
        .orderBy("target_permille")
    )
