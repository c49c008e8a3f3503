"""Dedup operator unit tests: SimHash vs brute-force oracle, LSH recall,
idempotence (the reference's ETLState re-ingest semantics)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from bert_etl_spark.functions.identity import dedup_exact as dedup_exact_rows
from bert_etl_spark.operators import registry
from bert_etl_spark.operators.dedup import (
    simhash_near_pairs,
    simhash_signatures,
)

registry.load_all()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_simhash_identical_docs_collide(spark):
    df = _docs(spark, ["alpha beta gamma delta", "alpha beta gamma delta", "zeta eta theta iota"])
    sigs = simhash_signatures(df)
    pairs = simhash_near_pairs(sigs, max_hamming=0).collect()
    assert [(r.doc_i, r.doc_j, r.hamming) for r in pairs] == [(0, 1, 0)]


def test_simhash_blocking_matches_bruteforce(spark):
    # deterministic word-soup corpus with built-in near-dups
    vocab = ["scan", "join", "agg", "sort", "hash", "merge", "row", "col", "batch", "spill"]
    rng = np.random.RandomState(7)
    texts = []
    for i in range(40):
        words = [vocab[j] for j in rng.randint(0, len(vocab), 12)]
        texts.append(" ".join(words))
        if i % 5 == 0:  # near-dup: one word changed
            mutated = list(words)
            mutated[3] = vocab[(vocab.index(mutated[3]) + 1) % len(vocab)]
            texts.append(" ".join(mutated))

    sigs = simhash_signatures(_docs(spark, texts))
    rows = {r.doc_id: np.array(r.bits) for r in sigs.collect()}

    expected = set()
    for i, j in itertools.combinations(sorted(rows), 2):
        if int(np.abs(rows[i] - rows[j]).sum()) <= 3:
            expected.add((i, j))

    got = {
        (r.doc_i, r.doc_j)
        for r in simhash_near_pairs(sigs, max_hamming=3).collect()
    }
    # band blocking is exact for hamming<=3 on 4x16 bands (pigeonhole)
    assert got == expected
    assert expected, "fixture should contain at least one near-dup pair"


def test_lsh_finds_all_high_jaccard_pairs(spark, sf_small):
    exact = registry.ALL_QUERIES["dedup_ngram_jaccard"](spark, sf_small).collect()
    lsh = registry.ALL_QUERIES["dedup_minhash_lsh"](spark, sf_small).collect()
    high = {(r.doc_i, r.doc_j) for r in exact if r.jaccard >= 0.9}
    found = {(r.doc_i, r.doc_j) for r in lsh}
    assert high, "fixture should contain near-dup pairs at jaccard>=0.9"
    assert high <= found, f"LSH missed high-jaccard pairs: {high - found}"


def test_exact_dedup_idempotent(spark):
    df = _docs(spark, ["a b c", "a b c", "x y z"])
    once = dedup_exact_rows(df, cols=["text"])
    twice = dedup_exact_rows(once, cols=["text"])
    assert once.count() == 2
    assert twice.count() == 2
    # re-ingesting the same batch and deduping again yields the same table
    assert dedup_exact_rows(df.union(df), cols=["text"]).count() == 2


# ---------------------------------------------------------------------------
# cosine_tile_pairs: the 2-D tiled Arrow-batch pair generator
# ---------------------------------------------------------------------------


def _bruteforce_pairs(rows, threshold):
    import math

    out = set()
    for i, (ida, blka, ea) in enumerate(rows):
        for idb, blkb, eb in rows[i + 1 :]:
            if blka != blkb:
                continue
            dot = sq_a = sq_b = 0.0
            for x, y in zip(ea, eb):
                dot += x * y
                sq_a += x * x
                sq_b += y * y
            cos = dot / (math.sqrt(sq_a) * math.sqrt(sq_b))
            if cos >= threshold:
                out.add((min(ida, idb), max(ida, idb), round(cos, 6)))
    return out


def test_cosine_tile_pairs_matches_bruteforce_across_chunkings(spark):
    """The tile decomposition is a plan choice — results must be identical
    for every chunk size, including chunk=1 (all off-diagonal tiles) and
    chunk >= n (one diagonal tile per block)."""
    import random

    from bert_etl_spark.operators.dedup import cosine_tile_pairs

    rng = random.Random(7)
    rows = []
    for vid in range(60):
        blk = vid % 3
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((vid, blk, base))
        # plant a near-duplicate for every 10th vector (same block)
        if vid % 10 == 0:
            dup = [x + rng.uniform(-0.01, 0.01) for x in base]
            rows.append((1000 + vid, blk, dup))
    df = spark.createDataFrame(
        [(i, b, e) for i, b, e in rows],
        "vec_id long, label int, embedding array<double>",
    )
    expected = _bruteforce_pairs(rows, 0.8)
    assert expected, "fixture must plant at least one near-pair"
    for chunk in (1, 4, 16, 1000):
        # MULTISET compare: a duplicate-pair emission bug (e.g. an empty
        # off-diagonal tile misread as diagonal) must fail, not collapse
        # away in a set.
        got = sorted(
            (r.vec_i, r.vec_j, round(r.cosine, 6))
            for r in cosine_tile_pairs(
                df, 0.8, chunk_rows=chunk
            ).collect()
        )
        assert got == sorted(expected), f"chunk_rows={chunk} diverged"


def test_cosine_tile_pairs_no_duplicates_on_empty_cj_chunks(spark):
    """Regression: 40 identical vectors at chunk_rows=1 creates many
    off-diagonal tiles whose cj chunk is hash-empty; the old side-presence
    diagonal inference re-emitted ci self-pairs there (826 rows vs the 780
    distinct pairs). Each unordered pair must appear exactly once."""
    from bert_etl_spark.operators.dedup import cosine_tile_pairs

    df = spark.createDataFrame(
        [(i, 0, [1.0, 2.0, 3.0]) for i in range(40)],
        "vec_id long, label int, embedding array<double>",
    )
    rows = cosine_tile_pairs(df, 0.99, chunk_rows=1).collect()
    pairs = [(r.vec_i, r.vec_j) for r in rows]
    assert len(pairs) == len(set(pairs)) == 40 * 39 // 2


def test_cosine_tile_pairs_never_crosses_blocks(spark):
    from bert_etl_spark.operators.dedup import cosine_tile_pairs

    # identical vectors in DIFFERENT blocks must not pair
    df = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 1, [1.0, 0.0]), (3, 1, [1.0, 0.0])],
        "vec_id long, label int, embedding array<double>",
    )
    got = cosine_tile_pairs(df, 0.99).collect()
    assert [(r.vec_i, r.vec_j) for r in got] == [(2, 3)]


def test_cosine_tile_pairs_empty_and_singleton_blocks(spark):
    from bert_etl_spark.operators.dedup import cosine_tile_pairs

    df = spark.createDataFrame(
        [(1, 0, [1.0, 2.0])], "vec_id long, label int, embedding array<double>"
    )
    assert cosine_tile_pairs(df, 0.5).count() == 0


def test_minhash_incremental_only_cross_side_pairs(spark, sf_small):
    """The incremental probe must never emit batch x batch or
    corpus x corpus pairs — that is the whole point of the shape."""
    import __spark_entry__ as e

    rows = e.queries()["dedup_minhash_incremental"](spark, sf_small).collect()
    for r in rows:
        assert r.new_doc % 7 == 0, r
        assert r.corpus_doc % 7 != 0, r
        assert r.jaccard >= 0.5


def test_global_shuffle_is_a_deterministic_permutation(spark, sf_small):
    import __spark_entry__ as e

    q = e.queries()["corpus_global_shuffle"]
    a = q(spark, sf_small).collect()
    ranks = sorted(r.shuffle_rank for r in a)
    assert ranks == list(range(1, len(a) + 1))  # exact permutation
    b = q(spark, sf_small).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    # and genuinely shuffled: not simply ordered by doc_id
    by_rank = sorted(a, key=lambda r: r.shuffle_rank)
    assert [r.doc_id for r in by_rank] != sorted(r.doc_id for r in a)


# ---------------------------------------------------------------------------
# exact substring dedup (duplicated k-window spans)
# ---------------------------------------------------------------------------


def _spans(spark, texts, k=8):
    from bert_etl_spark.operators.dedup import duplicated_spans, window_hashes

    df = _docs(spark, texts)
    return sorted(
        map(tuple, duplicated_spans(window_hashes(df, k=k), k=k).collect())
    )


def test_substring_span_recovers_shared_run(spark):
    shared = " ".join(f"P{i}" for i in range(10))
    out = _spans(
        spark,
        [
            f"u0 u1 {shared} u2 u3",  # run at token offsets 2..11
            f"v0 {shared} v1 v2 v3",  # run at token offsets 1..10
            " ".join(f"z{i}" for i in range(14)),  # all unique
        ],
    )
    # 3 duplicated 8-windows inside each 10-token run merge to one span/doc
    assert out == [(0, 2, 11, 10, 3), (1, 1, 10, 10, 3)]


def test_substring_within_doc_repetition_is_duplicated(spark):
    q = " ".join(f"Q{i}" for i in range(8))
    # the run repeats INSIDE one document, separated by w1: two disjoint
    # spans (gap 10 > 1+8 breaks the island)
    out = _spans(spark, [f"w0 {q} w1 {q} w2"])
    assert out == [(0, 1, 8, 8, 1), (0, 10, 17, 8, 1)]


def test_substring_adjacent_windows_merge(spark):
    q = " ".join(f"Q{i}" for i in range(8))
    # doubled run with no separator: duplicated windows at pos 1 and 9
    # touch (9 <= 1+8) and fuse into one 16-token span
    out = _spans(spark, [f"w0 {q} {q} w2"])
    assert out == [(0, 1, 16, 16, 2)]


def test_substring_doc_stats_includes_clean_docs(spark, sf_small, tmp_path):
    import __spark_entry__ as e

    rows = e.queries()["dedup_substring_doc_stats"](spark, sf_small).collect()
    n_docs = e.queries()["dedup_exact"](spark, sf_small).agg(
        {"n_docs": "sum"}
    ).collect()[0][0]
    assert len(rows) == n_docs  # every document appears
    assert any(r.dup_tokens == 0 and r.dup_fraction == 0.0 for r in rows)
    assert any(r.dup_tokens > 0 for r in rows)
    for r in rows:
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.dup_tokens <= r.n_tokens


def test_substring_remove_cuts_exactly_the_spans(spark):
    from bert_etl_spark.operators.dedup import (
        duplicated_spans,
        window_hashes,
    )
    from bert_etl_spark.operators import dedup as D
    from pyspark.sql import functions as F

    shared = " ".join(f"P{i}" for i in range(10))
    texts = [
        f"u0 u1 {shared} u2 u3",          # span covers tokens 2..11
        f"v0 {shared} v1 v2 v3",          # span covers tokens 1..10
        " ".join(f"z{i}" for i in range(14)),  # untouched
        shared,                            # fully duplicated vs docs 0/1? (10 tokens)
    ]
    df = _docs(spark, texts)
    spans = duplicated_spans(window_hashes(df, k=8), k=8)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toked = df.select("doc_id", D.tokenize(F.col("text")).alias("toks"))
    joined = toked.join(per_doc, "doc_id", "left").withColumn(
        "spans", F.coalesce(F.col("spans"), F.array())
    )
    kept = F.filter(
        F.transform(
            F.col("toks"), lambda t, i: F.struct(t.alias("tok"), i.alias("pos"))
        ),
        lambda s: ~F.exists(
            F.col("spans"),
            lambda sp: s["pos"].cast("long").between(
                sp["span_start"], sp["span_end"]
            ),
        ),
    )
    out = {
        r.doc_id: r.clean
        for r in joined.select(
            "doc_id", F.array_join(F.transform(kept, lambda s: s["tok"]), " ").alias("clean")
        ).collect()
    }
    assert out[0] == "u0 u1 u2 u3"
    assert out[1] == "v0 v1 v2 v3"
    assert out[2] == texts[2]
    assert out[3] == ""  # doc 3 is entirely one duplicated span


def test_substring_spans_match_pure_python_reference(spark):
    """30 seeded random corpora (token namespaced per corpus so one Spark
    job covers all of them independently) vs a brute-force reference."""
    import random

    from bert_etl_spark.operators.dedup import duplicated_spans, window_hashes

    K = 3
    rng = random.Random(0)
    texts = {}  # doc_id -> text
    for c in range(30):
        for i in range(rng.randint(1, 5)):
            n = rng.randint(0, 12)
            toks = [f"c{c}_{rng.choice('abc')}" for _ in range(n)]
            texts[c * 100 + i] = " ".join(toks)

    def ref_spans(k):
        from collections import Counter

        wins = []
        for d, t in texts.items():
            toks = t.strip().split(" ") if t.strip() else []
            for p in range(max(0, len(toks) - k + 1)):
                wins.append((d, p, " ".join(toks[p : p + k])))
        cnt = Counter(g for _, _, g in wins)
        dup = sorted((d, p) for d, p, g in wins if cnt[g] > 1)
        out = []
        by_doc = {}
        for d, p in dup:
            by_doc.setdefault(d, []).append(p)
        for d, ps in by_doc.items():
            start, last, n = ps[0], ps[0], 1
            for p in ps[1:]:
                if p <= last + k:
                    last, n = p, n + 1
                else:
                    out.append((d, start, last + k - 1, last + k - start, n))
                    start, last, n = p, p, 1
            out.append((d, start, last + k - 1, last + k - start, n))
        return sorted(out)

    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    got = sorted(map(tuple, duplicated_spans(window_hashes(df, k=K), k=K).collect()))
    assert got == ref_spans(K)


def test_substring_remove_keep_first_spares_earliest_copy(spark):
    from bert_etl_spark.operators.dedup import (
        cut_spans,
        keep_first_dup_windows,
        merge_window_spans,
        window_hashes,
    )

    body = " ".join(f"B{i}" for i in range(12))
    texts = [
        body,                      # doc 0: the canonical copy — survives whole
        body,                      # doc 1: exact duplicate — fully cut
        f"x0 x1 {body} x2",        # doc 2: contains the run — run cut, xs kept
        " ".join(f"y{i}" for i in range(10)),  # doc 3: untouched
    ]
    df = _docs(spark, texts)
    dw = keep_first_dup_windows(window_hashes(df, k=8))
    out = {
        r.doc_id: (r.clean_text, r.n_tokens_kept)
        for r in cut_spans(df, merge_window_spans(dw, k=8)).collect()
    }
    assert out[0] == (body, 12)       # first copy intact
    assert 1 not in out               # exact duplicate fully removed
    assert out[2] == ("x0 x1 x2", 3)  # embedded run cut, context kept
    assert out[3] == (texts[3], 10)   # clean doc untouched


def test_substring_keep_first_order_key_survives_huge_positions(spark):
    """A multi-million-token document (real in a 100 TB web corpus) must
    not confuse the keep-first arg-min: the retired doc_id*1e6+pos packing
    keyed (0, 1_500_000) ABOVE (1, 3) and exempted the wrong occurrence —
    the composite struct min keeps (doc_id, pos) lexicographic at any
    position."""
    from bert_etl_spark.operators.dedup import keep_first_dup_windows

    win = spark.createDataFrame(
        [(0, 1_500_000, "h1"), (1, 3, "h1"), (2, 7, "h2")],
        "doc_id long, pos long, h string",
    )
    got = sorted(
        (r.doc_id, r.pos) for r in keep_first_dup_windows(win).collect()
    )
    # (0, 1_500_000) is the minimal (doc_id, pos) of class h1 → exempt;
    # the (1, 3) copy is cut; the unduplicated h2 window is untouched
    assert got == [(1, 3)]


def test_substring_dedup_survives_corpus_wide_hot_window(spark):
    # boilerplate pathology: ONE 8-gram prefix shared by EVERY doc. The
    # dup-detection is a partial-agg count (no row fan-out), so this must
    # stay correct — each doc gets exactly one span over the shared prefix,
    # and the unique tails survive the cut untouched.
    from pyspark.sql import functions as F

    from bert_etl_spark.operators.dedup import (
        cut_spans,
        duplicated_spans,
        window_hashes,
    )

    boiler = " ".join(f"H{i}" for i in range(8))
    texts = [f"{boiler} u{d}a u{d}b u{d}c" for d in range(200)]
    df = _docs(spark, texts)
    spans = duplicated_spans(window_hashes(df, k=8), k=8)
    rows = spans.collect()
    assert len(rows) == 200
    assert all((r.span_start, r.span_end) == (0, 7) for r in rows)
    out = cut_spans(df, spans).collect()
    assert len(out) == 200
    assert all(r.clean_text == f"u{r.doc_id}a u{r.doc_id}b u{r.doc_id}c" for r in out)


def test_substring_keep_first_matches_pure_python_reference(spark):
    """Seeded random corpora vs a brute-force keep-first implementation:
    minimal (doc_id, pos) occurrence of each duplicated k-window is
    exempted, remaining hits merge and cut exactly like remove-all."""
    import random
    from collections import Counter

    from bert_etl_spark.operators.dedup import (
        cut_spans,
        keep_first_dup_windows,
        merge_window_spans,
        window_hashes,
    )

    K = 3
    rng = random.Random(7)
    texts = {}
    for c in range(20):
        for i in range(rng.randint(1, 4)):
            toks = [f"c{c}_{rng.choice('ab')}" for _ in range(rng.randint(0, 10))]
            texts[c * 100 + i] = " ".join(toks)

    def ref():
        wins = []
        for d, t in sorted(texts.items()):
            toks = t.strip().split(" ")  # "" -> [''], matching split(trim(text))
            for p in range(max(0, len(toks) - K + 1)):
                wins.append((d, p, " ".join(toks[p : p + K])))
        cnt = Counter(g for _, _, g in wins)
        first = {}
        for d, p, g in sorted(wins):
            first.setdefault(g, (d, p))
        dup = sorted(
            (d, p) for d, p, g in wins if cnt[g] > 1 and first[g] != (d, p)
        )
        by_doc = {}
        for d, p in dup:
            by_doc.setdefault(d, []).append(p)
        spans = {}
        for d, ps in by_doc.items():
            cur = [[ps[0], ps[0]]]
            for p in ps[1:]:
                if p <= cur[-1][1] + K:
                    cur[-1][1] = p
                else:
                    cur.append([p, p])
            spans[d] = [(s, e + K - 1) for s, e in cur]
        out = {}
        for d, t in sorted(texts.items()):
            toks = t.strip().split(" ")
            kept = [
                tok
                for i, tok in enumerate(toks)
                if not any(s <= i <= e for s, e in spans.get(d, []))
            ]
            if kept:
                out[d] = (" ".join(kept), len(kept))
        return out

    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")
    dw = keep_first_dup_windows(window_hashes(df, k=K))
    got = {
        r.doc_id: (r.clean_text, r.n_tokens_kept)
        for r in cut_spans(df, merge_window_spans(dw, k=K)).collect()
    }
    assert got == ref()
