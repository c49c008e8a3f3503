"""Training-corpus construction operators: benchmark-contamination check,
context-window chunking, deterministic train/val/test split, stratified
sampling, and token-budget sequence packing.

These extend the LLM-data-pipeline families (dedup / similarity / text /
multimodal) with the corpus-ASSEMBLY steps a pretraining pipeline runs
after filtering: decide what leaks from eval sets, cut documents into
model-sized windows, split and sample reproducibly, and pack tokens into
fixed budgets. Reference parity: the reference's only corpus tooling is
the ETLState identity ledger (/root/reference/bert/etl/__init__.py:57-80);
everything here is new surface a reference user gains.

Cross-engine determinism: every randomized step (split, sample) derives
from md5 over stable keys — no seeded RNG — so DuckDB oracles check exact
values. Token counts are integers; packing uses integer cumulative sums.

Scale design:
- contamination: shingle inverted index SEMI-joined against the (small)
  eval-set shingles — the eval side broadcasts, the corpus side never
  self-joins, so cost is one scan + one broadcast probe at 100 TB.
- chunking: pure per-row explode (no shuffle at all until a consumer
  aggregates); output partitioning inherits the scan.
- split/sample: per-row hash predicates — embarrassingly parallel, push
  no data across the network except the final per-stratum counts.
- packing: one window cumsum per source partition (single shuffle on
  source); bins are derived arithmetically from the running total, not by
  a sequential driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bert_etl_spark.operators.dedup import (
    _SQL_MINHASH as _DEDUP_SQL_MINHASH,
    _SQL_SHINGLES as _DEDUP_SQL_SHINGLES,
    shingles_df,
    tokenize,
)
from bert_etl_spark.operators.global_order import with_global_rank
from bert_etl_spark.operators.registry import query, spread, tbl

# eval-set membership: 1 doc in ~41 (survives sf0.001's 50-doc corpus)
EVAL_MOD = 41
CONTAM_NGRAM = 3  # synthetic docs are short (~50 tokens); 3-gram overlap
CHUNK_SIZE = 32
CHUNK_STRIDE = 24
PACK_BUDGET = 256


# ---------------------------------------------------------------------------
# contamination check
# ---------------------------------------------------------------------------


# Shared oracle fragment: training/eval gram tables for the contamination
# check and its removal counterpart — ONE definition of "shared gram" so
# the two oracles can never diverge about what contaminated means.
_SQL_CONTAM = f"""
toks AS (
    SELECT doc_id, string_split(trim(text), ' ') AS t
    FROM documents
),
grams AS (
    -- scalar generate_series + unnest: the table-function form cannot
    -- take lateral column arguments in DuckDB
    SELECT DISTINCT doc_id,
           array_to_string(t[i:i+{CONTAM_NGRAM - 1}], ' ') AS shingle
    FROM (
        SELECT doc_id, t,
               unnest(generate_series(1, len(t) - {CONTAM_NGRAM - 1}))
                   AS i
        FROM toks
        WHERE len(t) >= {CONTAM_NGRAM}
    )
),
eval_grams AS (
    SELECT DISTINCT shingle FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
sev AS (
    SELECT g.doc_id, COUNT(*) AS n_shared_grams
    FROM grams g
    JOIN eval_grams e ON g.shingle = e.shingle
    WHERE g.doc_id % {EVAL_MOD} <> 0
    GROUP BY g.doc_id
)
"""


# An n-gram shared with a benchmark/eval document marks a training doc as
# contaminated (the decontamination step of any serious pretraining run).
# The eval side is tiny by construction → broadcast; the corpus side is one
# shingle scan. No self-join anywhere: at 100 TB this is scan + probe.
@query(
    "corpus_contamination_check",
    oracle=f"""
    WITH {_SQL_CONTAM}
    SELECT doc_id, n_shared_grams FROM sev
    """,
)
def corpus_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    grams = shingles_df(docs, n=CONTAM_NGRAM)
    eval_grams = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select("shingle")
        .distinct()
    )
    return (
        grams.filter(F.col("doc_id") % EVAL_MOD != 0)
        # inner join (not semi) because the count of shared grams is the
        # contamination severity signal; eval_grams stays broadcast-sized
        .join(F.broadcast(eval_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


# Drop threshold for the removal pass: a training doc sharing this many
# n-grams with the eval set is cut from the corpus (the PaLM/GPT-3 style
# decontamination step applied as a filter, not just a report). 4 sits at
# ~p90 of the synthetic severity distribution, so the filter bites at
# every SF without gutting the corpus.
CONTAM_DROP_AT = 4


@query(
    "corpus_decontaminate",
    oracle=f"""
    WITH {_SQL_CONTAM}
    SELECT d.doc_id,
           COALESCE(s.n_shared_grams, CAST(0 AS BIGINT)) AS n_shared_grams
    FROM documents d LEFT JOIN sev s USING (doc_id)
    WHERE d.doc_id % {EVAL_MOD} <> 0
      AND COALESCE(s.n_shared_grams, 0) < {CONTAM_DROP_AT}
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal counterpart of corpus_contamination_check: the surviving
    training corpus after dropping docs that share >= CONTAM_DROP_AT
    n-grams with the (broadcast-sized) eval set. Every clean training doc
    appears with its severity (0 for no overlap) — the output is the
    post-decontamination corpus roster, joinable back to text by doc_id.

    Scale: identical to the check (one shingle scan + broadcast probe +
    per-doc count); the roster join is doc_id-keyed against the severity
    aggregate, which is at most one row per contaminated doc.
    """
    docs = tbl(spark, sf_dir, "documents")
    sev = corpus_contamination_check(spark, sf_dir)
    return (
        docs.filter(F.col("doc_id") % EVAL_MOD != 0)
        .select("doc_id")
        .join(sev, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared_grams"), F.lit(0).cast("long")).alias(
                "n_shared_grams"
            ),
        )
        .filter(F.col("n_shared_grams") < CONTAM_DROP_AT)
    )


# ---------------------------------------------------------------------------
# context-window chunking
# ---------------------------------------------------------------------------


# Cut each document into overlapping CHUNK_SIZE-token windows advancing by
# CHUNK_STRIDE (the standard sliding-context preprocessing for fixed-window
# models). A chunk is emitted for every start offset 0, stride, 2*stride...
# that is strictly inside the document; the final chunk may be short.
# Pure narrow transformation: sequence + transform + explode, zero shuffles.
@query(
    "corpus_chunk_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(
               t[i * {CHUNK_STRIDE} + 1 :
                 least(i * {CHUNK_STRIDE} + {CHUNK_SIZE}, len(t))], ' ')
               AS chunk_text,
           CAST(least(i * {CHUNK_STRIDE} + {CHUNK_SIZE}, len(t))
                - i * {CHUNK_STRIDE} AS INTEGER) AS n_tokens
    FROM (
        SELECT doc_id, t,
               unnest(generate_series(
                   0, (len(t) - 1) // {CHUNK_STRIDE})) AS i
        FROM toks
    )
    """,
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(tbl(spark, sf_dir, "documents"))
    toked = docs.select("doc_id", tokenize(F.col("text")).alias("t"))
    n = F.size("t")
    chunks = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / CHUNK_STRIDE).cast("int")),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("t"), i * CHUNK_STRIDE + 1, CHUNK_SIZE), " "
            ).alias("chunk_text"),
            F.least(i * CHUNK_STRIDE + CHUNK_SIZE, n)
            .cast("int")
            .alias("chunk_end"),
        ),
    )
    return toked.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        (F.col("c.chunk_end") - F.col("c.chunk_idx") * CHUNK_STRIDE)
        .cast("int")
        .alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------


# Hash-bucket split on md5(doc_id): first hex nibble 0..b -> train (75%),
# c..d -> val (12.5%), e..f -> test (12.5%). Content-independent, stable
# under corpus growth (a doc's split never changes when others are added) —
# the property a reproducible pipeline needs. Per-row predicate, no
# shuffle except the per-split aggregate.
@query(
    "corpus_split_train_val_test",
    oracle="""
    WITH tagged AS (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                   THEN 'val'
                 ELSE 'test'
               END AS split,
               len(string_split(trim(text), ' ')) AS n_tokens
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM tagged
    GROUP BY split
    """,
)
def corpus_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(tbl(spark, sf_dir, "documents"))
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nibble < "c", "train").when(nibble < "e", "val").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            F.size(tokenize(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


# Per-stratum deterministic downsampling: non-English strata keep every
# doc (low-resource upweighting), English keeps the md5 quarter. The
# sample membership is a per-row hash predicate (portable, pushes to the
# scan); only the audit aggregate shuffles. Output is the per-stratum
# audit table a pipeline records next to the sampled corpus.
@query(
    "corpus_stratified_sample",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN lang <> 'en'
                          OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0','1','2','3')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY source, lang
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(tbl(spark, sf_dir, "documents"))
    keep = (F.col("lang") != "en") | F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1", "2", "3")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_total"),
        F.sum(keep.cast("int")).cast("bigint").alias("n_sampled"),
    )


# ---------------------------------------------------------------------------
# token-budget sequence packing
# ---------------------------------------------------------------------------


# Concatenate-and-split packing: within each source, documents are laid
# end-to-end in doc_id order and cut into PACK_BUDGET-token bins; a doc's
# bin is the bin its first token lands in (docs straddle boundaries, as in
# real sequence packing where the tokenizer stream is cut mid-document).
# One window cumsum per source = one shuffle; bin assignment is arithmetic
# on the running total, never a sequential driver loop.
@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id,
               len(string_split(trim(text), ' ')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS offset_tokens
        FROM sized
    )
    SELECT source,
           -- // : DuckDB integer division (plain / is float division and a
           -- later CAST would ROUND, not floor — off-by-one bins)
           offset_tokens // {PACK_BUDGET} AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY source, offset_tokens // {PACK_BUDGET}
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(tbl(spark, sf_dir, "documents"))
    sized = docs.select(
        "source",
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "offset_tokens", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    )
    return (
        packed.groupBy(
            "source",
            F.floor(F.col("offset_tokens") / PACK_BUDGET).alias("bin"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


REBALANCE_FRAC = 0.15  # per-source cap as a fraction of total corpus size


# Domain-mix rebalancing: cap every source at a fixed share of the corpus so
# one crawl domain can't dominate the training mix (the "data mixture" step
# of a pretraining run). Selection is md5-ranked within source — fully
# deterministic, engine-portable, and stable under re-runs — with the kept
# set proven identical via an id-sum checksum, not just counts.
#
# Scale: the cap is one broadcast scalar; ranking is one window shuffle on
# source (same cost class as any per-source pass); no self-joins. Skewed
# sources are exactly the case the cap exists for — the window partition for
# a hot source is large, but emits rank-only state, and the downstream keep
# predicate prunes it to the cap.
@query(
    "corpus_domain_rebalance",
    oracle=f"""
    WITH r AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
        FROM documents
    ),
    t AS (
        SELECT CAST(CEIL(COUNT(*) * {REBALANCE_FRAC}) AS BIGINT) AS cap
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE rn <= cap) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) FILTER (WHERE rn <= cap) AS BIGINT) AS kept_checksum
    FROM r CROSS JOIN t
    GROUP BY source
    """,
)
def corpus_domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    cap = docs.agg(
        F.ceil(F.count("*") * F.lit(REBALANCE_FRAC)).cast("bigint").alias("cap")
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.withColumn("rn", F.row_number().over(w)).crossJoin(F.broadcast(cap))
    kept = F.col("rn") <= F.col("cap")
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(kept, True)).alias("n_kept"),
        F.sum(F.when(kept, F.col("doc_id"))).alias("kept_checksum"),
    )


MIX_ALPHA = 0.3  # temperature exponent (alpha < 1 upweights small sources)


# Temperature-scaled source mixing: the multilingual-pretraining recipe
# (sample source i proportional to p_i^alpha) that flattens the natural
# size distribution so low-resource sources aren't drowned out. Everything
# after the per-source count agg runs on |sources| rows, so the whole mix
# computation is free at any corpus size; the count agg itself is one
# partial-agg pass. pow() is transcendental (last-bit differs across
# libm), so weights are rounded to 6 dp BEFORE the normalizing decimal
# sum — both engines then reduce identical values exactly.
@query(
    "corpus_mix_temperature",
    oracle=f"""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM s),
    w AS (
        SELECT source, n_docs,
               ROUND(POWER(CAST(n_docs AS DOUBLE) / total, {MIX_ALPHA}), 6)
                   AS w_raw
        FROM s CROSS JOIN t
    ),
    z AS (
        SELECT CAST(SUM(CAST(w_raw AS DECIMAL(25,6))) AS DOUBLE) AS z FROM w
    )
    SELECT source, n_docs,
           ROUND(w_raw / z, 6) AS mix_weight,
           CAST(ROUND(w_raw / z * (SELECT total FROM t)) AS BIGINT)
               AS expected_docs
    FROM w CROSS JOIN z
    """,
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        tbl(spark, sf_dir, "documents").groupBy("source").agg(F.count("*").alias("n_docs"))
    )
    total = counts.agg(F.sum("n_docs").alias("total"))
    w = counts.crossJoin(F.broadcast(total)).withColumn(
        "w_raw",
        F.round(F.pow(F.col("n_docs").cast("double") / F.col("total"), MIX_ALPHA), 6),
    )
    z = w.agg(F.sum(F.col("w_raw").cast("decimal(25,6)")).cast("double").alias("z"))
    return w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(F.col("w_raw") / F.col("z"), 6).alias("mix_weight"),
        F.round(F.col("w_raw") / F.col("z") * F.col("total"))
        .cast("bigint")
        .alias("expected_docs"),
    )


TOKEN_BUDGET = 20_000  # training-token budget for the selection demo


# Greedy token-budget selection: rank the corpus by a quality score and
# keep the best documents until a token budget is exhausted — how a
# fixed-size pretraining mix is actually filled. The cumulative sum runs
# over a GLOBAL ordering, but not through a single-task window: the
# distributed exact prefix-sum (operators/global_order.py — range
# exchange + per-partition running sum + metadata-scale partition
# offsets) gives identical results with every core participating.
# Quality score: stopword-free token share (cheap, deterministic).
@query(
    "corpus_token_budget_select",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, len(string_split(trim(text), ' ')) AS n_tokens,
               ROUND(CAST(n_chars AS DOUBLE)
                     / len(string_split(trim(text), ' ')), 6) AS score
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, n_tokens, score,
               CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS cum_tokens
        FROM scored
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS selected_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS selected_checksum
    FROM ranked WHERE cum_tokens <= {TOKEN_BUDGET}
    GROUP BY lang
    """,
)
def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(tokenize(F.col("text"))).alias("n_tokens"),
        F.round(
            F.col("n_chars").cast("double") / F.size(tokenize(F.col("text"))), 6
        ).alias("score"),
    )
    from bert_etl_spark.operators.global_order import with_global_cumsum
    from bert_etl_spark.operators.registry import persist_once

    # the cumsum's range exchange reads its input twice (boundary sampling
    # + shuffle map); cache the 4-column scored projection so the regex
    # tokenize — the expensive part — runs once, not twice. Released at
    # the next release_internals().
    scored = persist_once(scored)
    ranked = with_global_cumsum(
        scored, [F.desc("score"), F.asc("doc_id")], "n_tokens", "cum_tokens"
    )
    return (
        ranked.filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("n_tokens").alias("selected_tokens"),
            F.sum("doc_id").alias("selected_checksum"),
        )
    )


PREP_CAP_PER_SOURCE = 30  # absolute per-source cap for the pipeline demo


# End-to-end corpus preparation THROUGH the pipeline surface: the stages
# are wired with `pipeline.follow` (the reference's binding.follow chain,
# SURVEY §2A#1-2) and composed by build_job_chain — a driver-visible proof
# that the framework surface and the analytics operators are one system.
# Stage boundaries are pure plan composition (df.transform), so Catalyst
# fuses them: quality gate's filter pushes INTO the scan even though it
# was declared three stages upstream of the final aggregate.
# quality gate -> exact-dedup keep-first -> per-source cap -> mix stats.
@query(
    "corpus_prep_pipeline",
    oracle=f"""
    WITH gated AS (
        SELECT doc_id, lang, source, text,
               len(string_split(trim(text), ' ')) AS n_tokens
        FROM documents
        WHERE len(string_split(trim(text), ' ')) >= 20
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn_dup
            FROM gated
        ) WHERE rn_dup = 1
    ),
    capped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn_cap
            FROM deduped
        ) WHERE rn_cap <= {PREP_CAP_PER_SOURCE}
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM capped GROUP BY source, lang
    """,
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark import pipeline as P

    P.clear_registry()

    @P.follow()
    def gate_quality(df: DataFrame) -> DataFrame:
        out = df.withColumn("n_tokens", F.size(tokenize(F.col("text"))))
        return out.filter(F.col("n_tokens") >= 20)

    @P.follow(gate_quality, schema="doc_id bigint, lang string, source string, text string, n_tokens int")
    def dedup_keep_first(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        return (
            df.withColumn("rn_dup", F.row_number().over(w))
            .filter(F.col("rn_dup") == 1)
            .drop("rn_dup")
        )

    @P.follow(dedup_keep_first)
    def cap_per_source(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
        return (
            df.withColumn("rn_cap", F.row_number().over(w))
            .filter(F.col("rn_cap") <= PREP_CAP_PER_SOURCE)
            .drop("rn_cap")
        )

    @P.follow(cap_per_source)
    def mix_stats(df: DataFrame) -> DataFrame:
        return df.groupBy("source", "lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("doc_id").alias("id_checksum"),
        )

    out = tbl(spark, sf_dir, "documents")
    for stage in P.build_job_chain():
        out = out.transform(stage)
    return out


PASSAGE_SIZE = 16  # tokens per non-overlapping passage


# Passage-level dedup (the C4-style sub-document pass): exact dedup at
# document granularity misses boilerplate repeated INSIDE distinct
# documents, so the corpus is re-keyed to non-overlapping 16-token
# passages and deduped by passage hash. One tokenize/slice pass (zero
# shuffle — same stage shape as corpus_chunk_windows), one groupBy on the
# uniformly-distributed md5 key. Reports only duplicated passages with
# their spread (copies vs distinct docs) and the canonical occurrence.
@query(
    "corpus_passage_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ),
    p AS (
        SELECT doc_id,
               md5(array_to_string(
                   t[i * {PASSAGE_SIZE} + 1 : i * {PASSAGE_SIZE} + {PASSAGE_SIZE}],
                   ' ')) AS passage_hash
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(0, (len(t) - 1) // {PASSAGE_SIZE})) AS i
            FROM toks
        )
        WHERE len(t) >= (i + 1) * {PASSAGE_SIZE}
    )
    SELECT passage_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
    FROM p GROUP BY passage_hash
    HAVING COUNT(*) > 1
    """,
)
def corpus_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(tbl(spark, sf_dir, "documents"))
    toked = docs.select("doc_id", tokenize(F.col("text")).alias("t")).filter(
        F.size("t") >= PASSAGE_SIZE
    )
    passages = F.transform(
        F.sequence(
            F.lit(0), (F.floor(F.size("t") / PASSAGE_SIZE) - 1).cast("int")
        ),
        lambda i: F.md5(
            F.array_join(F.slice(F.col("t"), i * PASSAGE_SIZE + 1, PASSAGE_SIZE), " ")
        ),
    )
    p = toked.select("doc_id", F.explode(passages).alias("passage_hash"))
    return (
        p.groupBy("passage_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )


EPOCH_TARGET_FRAC = 0.1  # every source should supply >= 10% of the mix


# Epoch upsampling plan: when a source is smaller than its target share,
# it is repeated for multiple epochs (the Hoffmann-style "how many times
# may I repeat this data" knob). Output per source: natural share, the
# epoch multiplier ceil(target/n), and the docs contributed after
# repetition — everything computed on the per-source count table, so the
# whole plan costs one partial-agg pass at any corpus size.
@query(
    "corpus_epoch_upsampling",
    oracle=f"""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM s)
    SELECT source, n_docs,
           ROUND(CAST(n_docs AS DOUBLE) / total, 6) AS natural_share,
           CAST(CEIL(total * {EPOCH_TARGET_FRAC} / n_docs) AS BIGINT)
               AS n_epochs,
           CAST(n_docs * CAST(CEIL(total * {EPOCH_TARGET_FRAC} / n_docs)
                AS BIGINT) AS BIGINT) AS docs_after_repeat
    FROM s CROSS JOIN t
    """,
)
def corpus_epoch_upsampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        tbl(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    total = counts.agg(F.sum("n_docs").alias("total"))
    j = counts.crossJoin(F.broadcast(total))
    epochs = F.ceil(
        F.col("total") * F.lit(EPOCH_TARGET_FRAC) / F.col("n_docs")
    ).cast("bigint")
    return j.select(
        "source",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias(
            "natural_share"
        ),
        epochs.alias("n_epochs"),
        (F.col("n_docs") * epochs).cast("bigint").alias("docs_after_repeat"),
    )


# Importance resampling toward a TARGET mixture (the DSIR/DoReMi-family
# reweighting step, reduced to its deterministic core): each doc's
# acceptance weight is min(1, target_share / corpus_share) for its group,
# and acceptance itself is a deterministic md5-uniform draw on doc_id —
# reproducible across engines and runs, no RNG state. One agg for shares
# (broadcast back), one scan for the accept flag: nothing here grows
# super-linear. The target is uniform-over-langs; swap the constant for
# any target vector in production.
@query(
    "corpus_importance_resample",
    oracle="""
    WITH s AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        GROUP BY lang
    ),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_langs FROM s),
    w AS (
        SELECT lang, n_docs,
               LEAST(1.0, (CAST(total AS DOUBLE) / n_langs) / n_docs) AS w
        FROM s CROSS JOIN t
    )
    SELECT d.lang, w.n_docs,
           ROUND(w.w, 6) AS accept_rate,
           CAST(count_if(
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) / 4294967296.0 < w.w
           ) AS BIGINT) AS n_selected
    FROM documents d JOIN w ON d.lang = w.lang
    GROUP BY d.lang, w.n_docs, w.w
    """,
)
def corpus_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    t = s.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_langs")
    )
    w = s.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        F.least(
            F.lit(1.0),
            (F.col("total").cast("double") / F.col("n_langs")) / F.col("n_docs"),
        ).alias("w"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(w), "lang")
        .groupBy("lang", "n_docs", "w")
        .agg(F.count_if(u < F.col("w")).alias("n_selected"))
        .select(
            "lang",
            "n_docs",
            F.round("w", 6).alias("accept_rate"),
            "n_selected",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle: assign every document a reproducible
# pseudo-random training-order rank. Pretraining dataloaders need the
# corpus in a fixed shuffled order (same order every restart, different
# order per epoch salt); driver-side shuffling or seeded RNG can't give
# that across engines or cluster sizes. md5 over the stable key IS the
# shuffle: ordering by the digest is a uniform permutation, the epoch
# salt re-permutes per epoch, and both engines agree bit-for-bit.
# Scale: rides with_global_rank (range exchange + per-partition windows +
# metadata-scale offsets — no single-task global window); the writer
# would then repartitionByRange(shuffle_rank) so downstream readers get
# contiguous shards in training order. Reference parity: the reference
# has no ordering surface at all (items drain from Redis/Dynamo queues
# in arrival order, bert/queues.py) — this is new capability its users
# gain.
# ---------------------------------------------------------------------------


@query(
    "corpus_global_shuffle",
    oracle="""
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':epoch1'), doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    keyed = spread(docs).select(
        "doc_id",
        "source",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":epoch1"))
        ).alias("_shuf"),
    )
    out = with_global_rank(keyed, [F.asc("_shuf"), F.asc("doc_id")], "shuffle_rank")
    return out.select("doc_id", "source", "shuffle_rank")


FUZZY_CONTAM_TAU = 0.5  # drop a training doc whose best eval Jaccard >= this


# FUZZY decontamination — the production form of corpus_decontaminate:
# exact n-gram overlap misses PARAPHRASED or lightly-edited eval leakage
# (the overlap the field actually worries about), so the probe here is
# the dedup family's minhash banding: candidates are band collisions
# BETWEEN the eval split and the training split (never train x train —
# the same split-probing shape as dedup_minhash_incremental), verified
# with exact Jaccard on the df-capped family shingle table, and a
# training doc survives iff its WORST eval-set Jaccard stays under tau.
# Output is the surviving roster with that worst score (0 for docs no
# band ever matched), joinable back to text by doc_id. Scale: the
# eval side of the band join is the small split (broadcastable), so
# per-corpus cost is O(train bands x collision rate) + verification on
# candidates only — the LSH economics, not all-pairs.
@query(
    "corpus_decontaminate_fuzzy",
    oracle=f"""
    WITH {_DEDUP_SQL_SHINGLES}, {_DEDUP_SQL_MINHASH},
    xc AS (
        SELECT doc_i, doc_j FROM cand
        WHERE (doc_i % {EVAL_MOD} = 0) != (doc_j % {EVAL_MOD} = 0)
    ),
    scored AS (
        SELECT CASE WHEN doc_i % {EVAL_MOD} = 0 THEN doc_j ELSE doc_i END
                   AS train_doc,
               j.jaccard
        FROM xc JOIN jac j USING (doc_i, doc_j)
    ),
    worst AS (
        SELECT train_doc, MAX(jaccard) AS mj FROM scored GROUP BY 1
    )
    SELECT d.doc_id, ROUND(COALESCE(w.mj, 0), 6) AS max_eval_jaccard
    FROM documents d LEFT JOIN worst w ON d.doc_id = w.train_doc
    WHERE d.doc_id % {EVAL_MOD} <> 0
      AND COALESCE(w.mj, 0) < {FUZZY_CONTAM_TAU}
    """,
)
def corpus_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bert_etl_spark.operators.dedup import (
        family_shingles,
        lsh_bands,
        minhash_signatures,
        pair_jaccard,
    )
    from bert_etl_spark.operators.registry import persist_once

    capped = family_shingles(spark, sf_dir)
    bands = persist_once(lsh_bands(minhash_signatures(capped)))
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eb = bands.filter(is_eval).select(
        F.col("doc_id").alias("e_doc"), "band", "h"
    )
    tb = bands.filter(~is_eval).select(
        F.col("doc_id").alias("t_doc"), "band", "h"
    )
    cand = persist_once(
        tb.join(F.broadcast(eb), ["band", "h"])
        .select("e_doc", "t_doc")
        .distinct()
    )
    cand_docs = (
        cand.select(F.col("e_doc").alias("doc_id"))
        .unionByName(cand.select(F.col("t_doc").alias("doc_id")))
        .distinct()
    )
    sh_cand = persist_once(
        capped.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    )
    jac = pair_jaccard(sh_cand, max_doc_freq=None)
    oriented = cand.select(
        "t_doc",
        F.least("e_doc", "t_doc").alias("doc_i"),
        F.greatest("e_doc", "t_doc").alias("doc_j"),
    )
    worst = (
        oriented.join(jac, ["doc_i", "doc_j"])
        .groupBy(F.col("t_doc").alias("doc_id"))
        .agg(F.max("jaccard").alias("mj"))
    )
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.filter(~is_eval)
        .select("doc_id")
        .join(worst, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce(F.col("mj"), F.lit(0.0)), 6).alias(
                "max_eval_jaccard"
            ),
        )
        .filter(F.coalesce(F.col("mj"), F.lit(0.0)) < FUZZY_CONTAM_TAU)
    )


# ---------------------------------------------------------------------------
# T5-style span corruption: deterministically select ~19% of each
# document's tokens, merge adjacent selections into SPANS, and emit the
# span table (doc, span ordinal, start, length, text, sentinel) — the
# artifact a denoising-pretraining pipeline consumes to build
# (input-with-sentinels, target) pairs. Selection is md5 over
# (doc_id, position) — the family's no-seeded-RNG rule — so the mask is
# reproducible across engines, runs, and partitionings. One shuffle
# (window by doc for the adjacency merge) + one aggregation; span
# assembly is an ordered in-group reduce, never Python.
# ---------------------------------------------------------------------------

SPAN_MASK_HEX = ("0", "1", "2")  # 3/16 of positions ≈ 19% corruption


@query(
    "corpus_span_corruption",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token,
               unnest(range(len(string_split(trim(text), ' ')))) AS pos
        FROM documents
    ),
    flagged AS (
        SELECT doc_id, pos, token,
               substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                          CAST(pos AS VARCHAR)), 1, 1)
                   IN ({", ".join(f"'{h}'" for h in SPAN_MASK_HEX)}) AS m
        FROM tok
    ),
    runs AS (
        SELECT *,
               CASE WHEN m AND NOT COALESCE(
                   LAG(m) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
                   THEN 1 ELSE 0 END AS is_start
        FROM flagged
    ),
    numbered AS (
        SELECT *,
               SUM(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS span_id
        FROM runs
    )
    SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
           CAST(MIN(pos) AS BIGINT) AS start_pos,
           CAST(COUNT(*) AS BIGINT) AS span_len,
           string_agg(token, ' ' ORDER BY pos) AS span_text,
           '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '>' AS sentinel
    FROM numbered WHERE m
    GROUP BY doc_id, span_id
    """,
)
def corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    tok = spread(docs).select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "token")
    )
    m = F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos"))), 1, 1
    ).isin(*SPAN_MASK_HEX)
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = tok.withColumn("m", m)
    runs = flagged.withColumn(
        "is_start",
        (
            F.col("m")
            & ~F.coalesce(F.lag("m").over(w), F.lit(False))
        ).cast("int"),
    )
    numbered = runs.withColumn("span_id", F.sum("is_start").over(w))
    ordered_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token"))),
            lambda s: s["token"],
        ),
        " ",
    )
    return (
        numbered.filter("m")
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            F.count("*").alias("span_len"),
            ordered_text.alias("span_text"),
        )
        .select(
            "doc_id",
            F.col("span_id").cast("long").alias("span_id"),
            "start_pos",
            "span_len",
            "span_text",
            F.concat(
                F.lit("<extra_id_"),
                (F.col("span_id") - 1).cast("string"),
                F.lit(">"),
            ).alias("sentinel"),
        )
    )
