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
