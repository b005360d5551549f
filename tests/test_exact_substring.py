"""duplicated_span_stats (operators/dedup.py): ExactSubstr-style
duplicated-span audit on a hand-built corpus — verbatim shared runs,
intra-doc-only repeats (must NOT count), short docs, and the
fully-duplicated document. Plus the scale-shape assertion: the plan
joins on the span hash (equi-join), never a nested-loop pair product."""

from __future__ import annotations

from etl_drone_sense_spark.operators.dedup import duplicated_span_stats

W = 4  # small width so hand-authored docs stay readable

SHARED = "alpha bravo charlie delta echo foxtrot"  # 6 tokens -> 3 spans at W=4


def _docs(spark):
    return spark.createDataFrame(
        [
            # doc 1 and 2 share the 6-token run (3 shared spans each); the
            # surrounding tokens differ so only the run's spans collide.
            (1, f"one two {SHARED} three four"),
            (2, f"nine ten {SHARED} eleven twelve"),
            # doc 3 repeats a 4-token phrase TWICE internally but shares
            # nothing across docs: cross-doc dup count must be 0.
            (3, "golf hotel india juliet kilo golf hotel india juliet"),
            # doc 4: exact full-text duplicate of doc 5 -> every span dup.
            (4, "lima mike november oscar papa"),
            (5, "lima mike november oscar papa"),
            # doc 6: shorter than the span width -> zero spans.
            (6, "quebec romeo"),
        ],
        "doc_id long, text string",
    )


def test_duplicated_span_semantics(spark):
    out = {
        r.doc_id: r
        for r in duplicated_span_stats(_docs(spark), "doc_id", "text", width=W)
        .collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6}

    # docs 1/2: 10 tokens -> 7 spans; the shared 6-token run contributes
    # exactly 3 duplicated spans (its interior W-grams).
    for d in (1, 2):
        assert out[d].n_spans == 7
        assert out[d].n_dup_spans == 3
        assert abs(out[d].dup_frac - round(3 / 7, 6)) < 1e-9

    # intra-doc repetition alone is not cross-doc duplication.
    assert out[3].n_dup_spans == 0

    # full duplicates: every span duplicated, frac 1.0.
    for d in (4, 5):
        assert out[d].n_spans == 2
        assert out[d].n_dup_spans == 2
        assert out[d].dup_frac == 1.0

    # short doc: no spans, frac 0 (not NULL, not NaN).
    assert out[6].n_spans == 0
    assert out[6].n_dup_spans == 0
    assert out[6].dup_frac == 0.0


def test_duplicated_span_plan_is_hash_join(spark):
    plan = (
        duplicated_span_stats(_docs(spark), "doc_id", "text", width=W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The dup-hash probe must be an equi-join on h — a nested-loop pair
    # product here would be the O(n^2) shape this operator exists to avoid.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicated_span_matches_bruteforce(spark):
    """Property: the distributed hashed-span counts equal a sequential
    brute-force over the same tokenization, on a randomized-ish corpus of
    overlapping word sequences (seeded, no hypothesis needed — the doc
    builder enumerates the collision-prone shapes directly)."""
    import random

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → natural collisions
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for i in range(25)
    ]
    W = 3

    def toks(s):
        return [t for t in s.lower().split() if t]

    spans = {}  # (doc, tuple) occurrences
    for i, text in docs:
        tk = toks(text)
        for p in range(max(len(tk) - W + 1, 0)):
            spans.setdefault(tuple(tk[p : p + W]), []).append(i)
    dup = {s for s, occ in spans.items() if len(set(occ)) >= 2}
    expect = {}
    for i, text in docs:
        tk = toks(text)
        n = max(len(tk) - W + 1, 0)
        nd = sum(1 for p in range(n) if tuple(tk[p : p + W]) in dup)
        expect[i] = (n, nd)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in duplicated_span_stats(df, "doc_id", "text", width=W).collect()
    }
    assert got == expect
