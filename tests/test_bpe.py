"""Frozen-merges BPE encoder (functions/bpe.py): the expression chain
must reproduce an independent textbook greedy encoder, both Spark- and
DuckDB-rendered, and the merges table must satisfy the rank-order ≡
greedy precondition the module proves."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_drone_sense_spark.functions import bpe

# Deliberately adversarial inputs: overlapping self-pairs, chained
# merges (th→the→ther), digits, case/punctuation stripping, empties.
CASES = [
    "the theory of things",
    "lll llll hello",
    "ababab",
    "and 2000 19 200",
    "question whether",
    "",
    "INGESTING ingesting",
    "root 2000000 stress bee",
    "a",
    "thththe",
    "   !!! ",
    "mixed CASE-42x",
    "oooo sss eeee",
    "conditioner andantino",
    None,
]


def _expected(text: str | None) -> tuple[str, int]:
    toks = [
        tok
        for w in re.findall("[a-z0-9]+", (text or "").lower())
        for tok in bpe.encode_word_reference(w)
    ]
    return " ".join(toks), len(toks)


def test_merges_table_is_valid():
    # import already ran _validate; re-run explicitly so a registry
    # refactor that drops the import-time check still fails here
    bpe._validate(bpe.MERGES)


def test_validate_rejects_unformed_constituent():
    with pytest.raises(ValueError, match="not formed"):
        bpe._validate((("th", "e"),))


def test_validate_rejects_duplicate_pair():
    with pytest.raises(ValueError, match="duplicate"):
        bpe._validate((("t", "h"), ("t", "h")))


def test_validate_rejects_result_consumed_earlier():
    # The one reachable divergence shape: a later merge whose RESULT
    # string was a CONSTITUENT of an earlier merge. A 2-char result can
    # only come from its unique char pair (which would be a duplicate),
    # so the construction needs a 3-char result formed two ways:
    # "abc" = ("ab","c") at rank 2, consumed by ("abc","d") at rank 3,
    # then RE-PRODUCED by the distinct pair ("a","bc") at rank 4 —
    # applying rank 4 could now create rank-3 pairs after rank 3 ran.
    with pytest.raises(ValueError, match="diverge"):
        bpe._validate(
            (("a", "b"), ("b", "c"), ("ab", "c"), ("abc", "d"), ("a", "bc"))
        )
    # sanity: without the re-production the same prefix is accepted
    bpe._validate((("a", "b"), ("b", "c"), ("ab", "c"), ("abc", "d")))


@pytest.mark.parametrize("text", CASES, ids=lambda t: repr(t)[:24])
def test_duckdb_rendering_matches_reference(text):
    con = duckdb.connect()
    state = bpe.doc_state_sql("t")
    sql = (
        f"SELECT {bpe.render_sql(state)} AS r, "
        f"{bpe.token_count_sql(state)} AS n FROM (SELECT ?::VARCHAR AS t)"
    )
    r, n = con.execute(sql, [text]).fetchone()
    exp_r, exp_n = _expected(text)
    assert r == exp_r
    assert n == exp_n


def test_spark_rendering_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    st = bpe.doc_state(F.col("text"))
    rows = df.select(
        "text", bpe.render(st).alias("r"), bpe.token_count(st).alias("n")
    ).collect()
    for row in rows:
        exp_r, exp_n = _expected(row["text"])
        assert row["r"] == exp_r, row["text"]
        assert row["n"] == exp_n, row["text"]


def test_encoder_is_one_narrow_projection(spark, sf_dir):
    """The 100 TB shape claim: text_bpe_tokenize is one narrow projection
    — no hash/range exchange, no Python boundary. The single permitted
    Exchange is the ROUND-ROBIN spread of an under-split source
    (rebalance_for_compute, r16): on a splittable production lake the
    partition-count probe makes it a no-op and the plan is exchange-free;
    on the one-row-group fixture it buys the merge-replace chain full
    parallelism."""
    import io
    import re
    from contextlib import redirect_stdout

    from etl_drone_sense_spark.plans.registry import get

    df = get("text_bpe_tokenize").fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # formatted explain names each node twice (tree + details) — count
    # the numbered detail headers so one Exchange node counts once
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 1, plan
    if n_exchange:
        assert "RoundRobinPartitioning" in plan, plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_twin_shuffles_once_on_source(spark, sf_dir):
    """corpus_pack_sequences_bpe keeps the whitespace twin's shape: ONE
    hash exchange, keyed on source, for the packing window."""
    import io
    import re as _re
    from contextlib import redirect_stdout

    from etl_drone_sense_spark.plans.registry import get

    df = get("corpus_pack_sequences_bpe").fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1, plan
    assert _re.search(r"hashpartitioning\(source#", plan), plan


def _train_reference(texts, rounds):
    """Independent sequential BPE trainer: count adjacent pairs
    (overlapping, word-local), merge the (count DESC, lexicographic)
    argmax leftmost-exhaustively, repeat."""
    from collections import Counter

    words_lists = [
        list(w)
        for t in texts
        for w in re.findall("[a-z0-9]+", (t or "").lower())
    ]
    merges = []
    for k in range(1, rounds + 1):
        counts: Counter = Counter()
        for toks in words_lists:
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += 1
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, a, b, a + b, cnt))
        for toks in words_lists:
            i = 0
            while i < len(toks) - 1:
                if toks[i] == a and toks[i + 1] == b:
                    toks[i : i + 2] = [a + b]
                i += 1
    return merges


def test_bpe_train_matches_reference_trainer(spark, sf_dir):
    """text_bpe_train vs an independent sequential trainer over the
    real fixture corpus — counts, tie-breaks, and the leftmost merge
    application must all agree for the learned tables to be equal."""
    from etl_drone_sense_spark.plans.curation import BPE_TRAIN_ROUNDS
    from etl_drone_sense_spark.plans.registry import get
    from etl_drone_sense_spark.sources.readers import read_table

    texts = [
        r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    want = _train_reference(texts, BPE_TRAIN_ROUNDS)
    got = sorted(
        (r["merge_rank"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in get("text_bpe_train").fn(spark, sf_dir).collect()
    )
    assert got == want


def test_bpe_train_degenerate_corpora():
    """Leftmost-exhaustive application inside one round: 'aaaa' counts
    (a,a) x3, merges to [aa, aa]; next round counts (aa,aa) x1."""
    want = _train_reference(["aaaa"], 2)
    assert want == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)]
    assert _train_reference(["", "   "], 4) == []

def test_bpe_train_sampled_matches_reference_trainer(spark, sf_dir):
    """text_bpe_train_sampled vs the independent sequential trainer run
    on the SAME deterministic 20% sample — certifies the word-frequency
    collapse (reference counts per occurrence, trainer per distinct
    word x count) and the delta maintenance (any drift in the
    maintained pair relation changes an argmax and diverges the merge
    sequence)."""
    from etl_drone_sense_spark.plans.curation import (
        BPE_SAMPLE_MOD,
        BPE_SAMPLED_ROUNDS,
    )
    from etl_drone_sense_spark.plans.registry import get
    from etl_drone_sense_spark.sources.readers import read_table

    texts = [
        r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BPE_SAMPLE_MOD == 0)
        .select("text")
        .collect()
    ]
    want = _train_reference(texts, BPE_SAMPLED_ROUNDS)
    got = sorted(
        (r["merge_rank"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in get("text_bpe_train_sampled").fn(spark, sf_dir).collect()
    )
    assert got == want


def test_bpe_train_sampled_checkpoint_cadence_invariant(spark):
    """The vocab checkpoint cadence is an execution knob, not a
    semantic one: every cadence must learn the identical table,
    including the early-stop round (pairs exhausted)."""
    from etl_drone_sense_spark.operators.bpetrain import train_merges_delta

    df = spark.createDataFrame(
        [("the theory of things the the",), ("ababab theory abab",), ("",)],
        "text string",
    )
    runs = [
        train_merges_delta(df, rounds=30, vocab_checkpoint_every=c)
        for c in (1, 4, 64)
    ]
    assert runs[0] == runs[1] == runs[2]
    # 30 rounds requested, but the tiny corpus exhausts first: the
    # early-stop must have fired (every word fully collapsed)
    assert 0 < len(runs[0]) < 30
    want = _train_reference(
        ["the theory of things the the", "ababab theory abab", ""], 30
    )
    assert runs[0] == want


def test_bpe_train_sampled_empty_sample(spark):
    from etl_drone_sense_spark.operators.bpetrain import train_merges_delta

    df = spark.createDataFrame([("   ",), (None,)], "text string")
    assert train_merges_delta(df, rounds=4) == []


def _train_reference_batched(texts, rounds, k):
    """Independent batched-greedy BPE trainer (pure python): per round,
    count adjacent pairs per occurrence, rank by (count DESC, lexicographic),
    walk the top-k greedily keeping token-disjoint triples {a, b, a+b},
    apply every kept merge leftmost-exhaustively, append in rank order."""
    from collections import Counter

    words_lists = [
        list(w)
        for t in texts
        for w in re.findall("[a-z0-9]+", (t or "").lower())
    ]
    merges = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for toks in words_lists:
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += 1
        if not counts:
            break
        frontier = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        used: set = set()
        sel = []
        for (a, b), cnt in frontier:
            trip = {a, b, a + b}
            if not (trip & used):
                sel.append((a, b, cnt))
                used |= trip
        for a, b, cnt in sel:
            merges.append((len(merges) + 1, a, b, a + b, cnt))
            for toks in words_lists:
                i = 0
                while i < len(toks) - 1:
                    if toks[i] == a and toks[i + 1] == b:
                        toks[i : i + 2] = [a + b]
                    i += 1
    return merges


def test_bpe_train_batched_matches_reference_trainer(spark, sf_dir):
    """text_bpe_train_batched vs the independent batched-greedy trainer
    on the SAME deterministic 20% sample — certifies the frontier
    ranking, the greedy disjoint walk (triples including merged
    outputs), the commuting batch application, and the recorded
    round-start counts."""
    from etl_drone_sense_spark.plans.curation import (
        BPE_BATCH_K,
        BPE_BATCH_ROUNDS,
        BPE_SAMPLE_MOD,
    )
    from etl_drone_sense_spark.plans.registry import get
    from etl_drone_sense_spark.sources.readers import read_table

    texts = [
        r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BPE_SAMPLE_MOD == 0)
        .select("text")
        .collect()
    ]
    want = _train_reference_batched(texts, BPE_BATCH_ROUNDS, BPE_BATCH_K)
    got = sorted(
        (r["merge_rank"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in get("text_bpe_train_batched").fn(spark, sf_dir).collect()
    )
    assert got == want


def test_bpe_train_batched_k1_equals_sequential(spark):
    """A batch width of 1 degenerates to the sequential argmax: the
    greedy walk keeps exactly the top-1 pair, so the learned table must
    equal train_merges_delta's merge for merge — counts, tie-breaks,
    ranks."""
    from etl_drone_sense_spark.operators.bpetrain import (
        train_merges_batched,
        train_merges_delta,
    )

    df = spark.createDataFrame(
        [("the theory of things the the",), ("ababab theory abab",), ("",)],
        "text string",
    )
    want = train_merges_delta(df, rounds=30)
    got = train_merges_batched(df, batch_rounds=30, batch_k=1)
    assert got == want
    assert 0 < len(got) < 30  # early-stop fired in both


def test_bpe_train_batched_empty_sample(spark):
    from etl_drone_sense_spark.operators.bpetrain import train_merges_batched

    df = spark.createDataFrame([("   ",), (None,)], "text string")
    assert train_merges_batched(df, batch_rounds=4, batch_k=8) == []


def test_bpe_train_apply_matches_sequential_replay(spark):
    """train_apply = train on the sample, rank-order replay on every
    doc. Pinned against a pure-python replay: train with the reference
    trainer on the sampled docs, then apply each learned merge
    leftmost-exhaustively in rank order to all docs."""
    from etl_drone_sense_spark.functions import bpe
    from etl_drone_sense_spark.operators.bpetrain import train_merges_delta
    from pyspark.sql import functions as F

    texts = [
        "the theory of things the the",
        "ababab theory abab",
        "theory of the ab",
        "",
    ]
    # sample = doc_id % 2 == 0 for this test (drive the trainer directly)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    learned = train_merges_delta(
        df.filter(F.col("doc_id") % 2 == 0), rounds=10
    )
    want_merges = _train_reference([texts[0], texts[2]], 10)
    assert learned == want_merges

    state = bpe.initial_state(F.col("text"))
    for _, a, b, _, _ in learned:
        pat, rep = bpe.merge_pattern(a, b)
        state = F.replace(state, F.lit(pat), F.lit(rep))
    got = {
        r["doc_id"]: r["r"]
        for r in df.select("doc_id", bpe.render(state).alias("r")).collect()
    }

    # python replay
    for i, t in enumerate(texts):
        words = [list(w) for w in re.findall("[a-z0-9]+", t.lower())]
        for _, a, b, _, _ in learned:
            for toks in words:
                j = 0
                while j < len(toks) - 1:
                    if toks[j] == a and toks[j + 1] == b:
                        toks[j : j + 2] = [a + b]
                    j += 1
        assert got[i] == " ".join(tok for w in words for tok in w), i


def test_bpe_train_batched_concentrated_frontier_not_degenerate(spark):
    """r16 (r15 VERDICT item 7): pin the failure mode that killed the
    non-recursive dominance variant with a CONCENTRATED frontier — a
    conflict CHAIN (a,a) >> (a,b) > (b,c) > (c,d) > (d,e) > (e,f) where
    each candidate shares a token with the one above it. Dominance
    (conflict vs every higher-ranked row, kept or not) degenerates to
    EXACTLY 1 merge/round — one unkept row poisons everything below it
    — while the shipped greedy walk admits every odd-ranked candidate.
    The Spark trainer must (1) match the pure-python greedy reference
    on this regime bit-for-bit and (2) drain the fixture's merge space
    in HALF the rounds the dominance rule needs."""
    import re as _re
    from collections import Counter

    from etl_drone_sense_spark.operators.bpetrain import train_merges_batched

    text = " ".join(
        ["aa"] * 60 + ["ab"] * 50 + ["bc"] * 40
        + ["cd"] * 30 + ["de"] * 20 + ["ef"] * 10
    )
    df = spark.createDataFrame([(text,)], "text string")

    def rounds_with(rule: str, nrounds: int, k: int):
        words_lists = [
            list(w)
            for w in _re.findall("[a-z0-9]+", text.lower())
        ]
        merges, per_round = [], []
        for _ in range(nrounds):
            counts: Counter = Counter()
            for toks in words_lists:
                for i in range(len(toks) - 1):
                    counts[(toks[i], toks[i + 1])] += 1
            if not counts:
                break
            frontier = sorted(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )[:k]
            sel = []
            if rule == "greedy":
                used: set = set()
                for (a, b), cnt in frontier:
                    trip = {a, b, a + b}
                    if not (trip & used):
                        sel.append((a, b, cnt))
                        used |= trip
            else:  # dominance: conflict vs every HIGHER-RANKED row
                for i, ((a, b), cnt) in enumerate(frontier):
                    trip = {a, b, a + b}
                    higher: set = set()
                    for (a2, b2), _ in frontier[:i]:
                        higher |= {a2, b2, a2 + b2}
                    if not (trip & higher):
                        sel.append((a, b, cnt))
            per_round.append(len(sel))
            for a, b, cnt in sel:
                merges.append((len(merges) + 1, a, b, a + b, cnt))
                for toks in words_lists:
                    i = 0
                    while i < len(toks) - 1:
                        if toks[i] == a and toks[i + 1] == b:
                            toks[i : i + 2] = [a + b]
                        i += 1
            if not any(len(t) > 1 for t in words_lists):
                break
        return merges, per_round

    greedy_ref, greedy_rounds = rounds_with("greedy", 4, 8)
    dom_ref, dom_rounds = rounds_with("dominance", 4, 8)

    # The pinned degeneracy: dominance admits exactly ONE merge per
    # round on the chain; greedy admits 3 per round and drains the
    # whole 6-merge space in 2 rounds vs dominance's 4-for-4.
    assert dom_rounds == [1, 1, 1, 1]
    assert greedy_rounds == [3, 3]
    assert len(greedy_ref) == 6 and len(dom_ref) == 4

    got = train_merges_batched(df, batch_rounds=4, batch_k=8)
    assert got == greedy_ref
