"""Unit tests for the text-operator library paths (the registered queries
are covered by the oracle-parity gate; these pin LIBRARY semantics against
pure-Python references)."""

from __future__ import annotations

from collections import Counter


def test_bpe_train_steps_matches_python_reference(spark):
    """bpe_train_steps vs classic BPE (Sennrich): count adjacent symbol
    pairs weighted by token frequency (overlapping pairs counted), argmax
    with (count desc, pair asc) tiebreak, greedy left-to-right
    non-overlapping merge-apply — including the [a,a,a,a] -> [aa,aa]
    overlap case the fenced string replace must get right."""
    from bert_etl_spark.operators.text import bpe_train_steps

    texts = [
        "aaaa abab low lower lowest",
        "low low lower newest newest",
        "aaaa aaaa widest newest",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    k = 4
    got = bpe_train_steps(df, k)

    # pure-Python classic BPE over the same whitespace vocabulary
    vocab = Counter()
    for t in texts:
        vocab.update(tok for tok in t.strip().split(" ") if len(tok) >= 2)
    state = {tok: tuple(tok) for tok in vocab}
    want = []
    for step in range(1, k + 1):
        counts: Counter = Counter()
        for tok, syms in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += vocab[tok]
        if not counts:
            break
        # argmax with (count desc, pair asc) tiebreak
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        want.append((step, left, right, left + right, n))
        merged = left + right
        new_state = {}
        for tok, syms in state.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tok] = tuple(out)
        state = new_state
    assert got == want
    assert len(got) == k  # non-vacuous: the toy corpus trains all k steps
    # the overlap case actually exercised: "aaaa" must have merged pairwise
    assert ("a", "a") in {(l, r) for _, l, r, _, _ in got}


def test_bpe_encode_vocab_matches_python_reference(spark):
    """bpe_encode_vocab: after k trained merges, each token's symbol
    count equals applying the same merges greedily in pure Python."""
    from bert_etl_spark.operators.text import bpe_encode_vocab, bpe_train_steps

    texts = [
        "aaaa abab low lower lowest",
        "low low lower newest newest",
        "aaaa aaaa widest newest",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    k = 4
    merges = bpe_train_steps(df, k)
    got = {r.token: r.n_syms for r in bpe_encode_vocab(df, k).collect()}

    def encode(tok: str) -> int:
        syms = list(tok)
        for _, left, right, merged, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    vocab = {t for s in texts for t in s.split(" ") if len(t) >= 2}
    assert got == {t: encode(t) for t in vocab}
    assert got["aaaa"] == 2  # aa+aa after the (a,a) merge


def test_boilerplate_prefix_detects_planted_template(spark):
    """LCP(min,max) equals the group-wide longest common prefix: a planted
    per-source template prefix is recovered exactly, a clean source
    reports 0, and a doc missing the template caps the group's LCP."""
    from bert_etl_spark.operators.registry import ALL_QUERIES, load_all

    load_all()
    from pyspark.sql import functions as F

    import bert_etl_spark.operators.text as T

    rows = [
        (1, "sA", "COPYRIGHT 2024 ACME | the quick brown fox"),
        (2, "sA", "COPYRIGHT 2024 ACME | lazy dogs sleep all day"),
        (3, "sA", "COPYRIGHT 2024 ACME | zebras graze at dawn"),
        (4, "sB", "alpha beta gamma"),
        (5, "sB", "zeta eta theta"),
        (6, "sC", "PREFIX shared here"),
        (7, "sC", "PREFIX shared also"),
        (8, "sC", "no template on this one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    ext = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.min("text").alias("lo"), F.max("text").alias("hi")
    )
    cap = T.BOILERPLATE_PREFIX_CAP
    lcp_len = F.expr(
        f"array_min(transform(sequence(0, {cap - 1}), i -> "
        f"CASE WHEN i >= LEAST(length(lo), length(hi)) "
        f"OR substr(lo, i + 1, 1) != substr(hi, i + 1, 1) "
        f"THEN i ELSE {cap} END))"
    )
    got = {
        r.source: (r.l, r.p)
        for r in ext.select(
            "source",
            lcp_len.alias("l"),
            F.expr("substr(lo, 1, "
                   f"array_min(transform(sequence(0, {cap - 1}), i -> "
                   f"CASE WHEN i >= LEAST(length(lo), length(hi)) "
                   f"OR substr(lo, i + 1, 1) != substr(hi, i + 1, 1) "
                   f"THEN i ELSE {cap} END)))").alias("p"),
        ).collect()
    }
    assert got["sA"] == (22, "COPYRIGHT 2024 ACME | ")
    assert got["sB"][0] == 0
    assert got["sC"][0] == 0  # the clean doc caps the group LCP at 0


def test_phrase_and_proximity_edges_vs_python_reference(spark):
    """Phrase/proximity HOF expressions vs a plain-Python scan on
    adversarial shapes: the first term at the LAST token (the ANSI
    out-of-bounds edge Spark's descending-sequence quirk would hit),
    single-token docs, docs shorter than the phrase, stacked overlaps."""
    from bert_etl_spark.operators.text import (
        PHRASE_TERMS,
        PROXIMITY_SLOP,
        phrase_count,
    )
    from bert_etl_spark.operators import registry
    import tempfile

    a, b = PHRASE_TERMS
    texts = [
        f"{a} {b}",                     # exact phrase
        f"{b} {a}",                     # reversed: first term LAST token
        f"{a}",                         # shorter than the phrase
        "",                             # degenerate
        f"{a} x {b} {a} {b} {b}",       # slop hits + phrase + double second
        f"{a} {a} {b}",                 # overlapping starts
        f"x {a} y z {b}",               # outside slop (gap 3 = within 3? pos diff 3)
    ]
    rows = [(i, t) for i, t in enumerate(texts)]

    def py_phrase(t):
        toks = t.strip().split(" ")
        return sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == a and toks[i + 1] == b
        )

    def py_prox(t):
        # slop semantics = the oracle's BETWEEN: position diff <= SLOP
        toks = t.strip().split(" ")
        return sum(
            1
            for i in range(len(toks))
            for j in range(i + 1, min(i + PROXIMITY_SLOP, len(toks) - 1) + 1)
            if toks[i] == a and toks[j] == b
        )

    d = tempfile.mkdtemp()
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    registry.load_all()
    got_phrase = {
        r["doc_id"]: r["n_occurrences"]
        for r in registry.ALL_QUERIES["text_phrase_search"](spark, d).collect()
    }
    got_prox = {
        r["doc_id"]: r["n_pairs"]
        for r in registry.ALL_QUERIES["text_proximity_search"](spark, d).collect()
    }
    want_phrase = {i: py_phrase(t) for i, t in rows if py_phrase(t) > 0}
    want_prox = {i: py_prox(t) for i, t in rows if py_prox(t) > 0}
    assert got_phrase == want_phrase
    assert got_prox == want_prox
