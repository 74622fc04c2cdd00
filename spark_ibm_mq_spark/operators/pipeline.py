"""Composite LLM-data-pipeline query (north-star): the classic
clean-corpus pass — quality-gate → exact-dedup → per-language token budget —
as one chained DataFrame program, oracle-checked end to end.

Scale notes: the three stages fuse into scan → filter (codegen) →
hash-groupBy on a 32-byte hash → hash-groupBy on lang. Two small shuffles;
the document bodies never shuffle (only hashes and counts after stage 1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.functions.text import STOPWORDS_EN, tokens
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import (
    durable_checkpoint,
    load_table,
    size_gated_broadcast,
    spread,
)

_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS_EN) + "]"

_TOKS = "string_split_regex(trim(text), '\\s+')"
_QUALITY_PRED = f"""
      (len({_TOKS}) BETWEEN 10 AND 5000)
  AND (length(text) * 1.0 / greatest(len({_TOKS}), 1) BETWEEN 3 AND 12)
  AND (len(list_filter({_TOKS}, t -> list_contains({_STOP_SQL}, lower(t)))) * 1.0
         / greatest(len({_TOKS}), 1) BETWEEN 0.01 AND 0.6)
"""


@register(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH gated AS (
        SELECT * FROM documents WHERE {_QUALITY_PRED}
    ),
    deduped AS (
        SELECT lang, min(doc_id) AS keep_id,
               any_value(len({_TOKS})) AS n_toks
        FROM gated
        GROUP BY sha256(text), lang
    )
    SELECT lang,
           count(*)      AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           min(keep_id)  AS first_doc
    FROM deduped
    GROUP BY lang
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate (length / word-shape / stopword-density) → exact dedup
    on content hash (keep lowest doc_id) → per-language doc + token budget.
    The shape every pretraining-data pipeline runs before tokenization."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    stop = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t)))) / F.greatest(
        n, F.lit(1)
    )
    avg_word = F.length("text") / F.greatest(n, F.lit(1))
    gated = d.filter(
        n.between(10, 5000) & avg_word.between(3, 12) & stop_ratio.between(0.01, 0.6)
    )
    deduped = (
        gated.groupBy(F.sha2("text", 256).alias("h"), "lang")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.any_value(F.size(tokens("text"))).alias("n_toks"),
        )
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.min("keep_id").alias("first_doc"),
    )


@register(
    "pipeline_train_test_split",
    oracle="""
    SELECT split,
           count(*)          AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           min(doc_id)       AS min_id,
           max(doc_id)       AS max_id
    FROM (
        SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train' ELSE 'test' END AS split,
               doc_id, text
        FROM documents
    )
    GROUP BY split
    """,
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/test split — the assignment every training
    pipeline needs to be reproducible across runs, engines, and reshuffles:
    hash the stable key (never `rand()` or row position, which change under
    repartitioning) and threshold the digest. md5 is bit-identical in Spark
    and DuckDB, so the split itself is oracle-checked, not just the counts;
    the first hex byte < 'e6' puts 230/256 ≈ 89.8 % in train.

    Scale: one narrow scan, a codegen'd hash+compare per row, one tiny
    aggregate — no shuffle of document bodies; the split column is what a
    real pipeline writes back as a partition key."""
    d = load_table(spark, sf_dir, "documents")
    split = (
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "e6", "train"
        ).otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@register(
    "pipeline_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          CASE WHEN lang = 'en' THEN '80' ELSE '40' END
    """,
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language sampling rates
    (50 % of 'en', 25 % of everything else — the downsample-the-head /
    keep-the-tail move every corpus-mixing pipeline makes) implemented as a
    hash threshold per stratum, NOT `df.sample()` — rand()-based sampling
    changes membership under retries, repartitioning, and engine swaps,
    which silently breaks train-data reproducibility. md5 is bit-identical
    across engines, so the driver verifies the exact sample membership,
    not just its size.

    Scale: expression-only filter on a narrow scan — no shuffle, no state;
    the predicate pushes down to the parquet scan's row-group filter for
    the lang column."""
    d = load_table(spark, sf_dir, "documents")
    thresh = F.when(F.col("lang") == "en", "80").otherwise("40")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < thresh
    ).select("doc_id", "lang")


@register(
    "pipeline_domain_mix",
    oracle="""
    WITH counts AS (
        SELECT source, count(*) AS n,
               1 + (ascii(substr(md5(source), 1, 1)) % 4) AS w
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS t, CAST(sum(w) AS BIGINT) AS sw
        FROM counts
    ),
    th AS (
        SELECT source,
               printf('%08x',
                      CAST(least(floor(least(CAST(1.0 AS DOUBLE),
                                             CAST(0.4 AS DOUBLE) * t * w / sw / n)
                                       * 4294967296.0),
                                 4294967295.0) AS BIGINT)) AS hx
        FROM counts, tot
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN th ON th.source = d.source
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < th.hx
    """,
)
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted domain rebalancing: sample the corpus down to a 40 % doc
    budget whose per-source allocation follows target weights (here an
    md5-derived 1–4 weight per source standing in for the hand-tuned domain
    weights every pretraining mix uses), capped at each source's available
    docs. Membership is a hash threshold on the stable doc_id — exact,
    engine-independent, reshuffle-proof — so the driver verifies the
    PRECISE sample, not just its size.

    Cross-engine float care: the per-source rate `0.4·t·w/Σw/n` is the same
    double op sequence in both engines (DuckDB's bare 0.4 is DECIMAL, hence
    the explicit CAST AS DOUBLE), and the comparison itself is integer: the
    rate maps to a 32-bit threshold rendered as 8 hex chars (`printf`) and
    compared lexicographically against the md5 prefix — both engines emit
    lowercase hex, so the string order IS the numeric order.

    Scale shape: a tiny per-source aggregate (20 rows), broadcast back onto
    a narrow scan — document bodies never shuffle; the filter is a codegen
    expression. At 100 TB the same plan holds: the rate table stays
    |sources| rows regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "w", F.lit(1) + (F.ascii(F.substring(F.md5("source"), 1, 1)) % 4)
    )
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("t"), F.sum("w").cast("bigint").alias("sw")
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(0.4) * F.col("t") * F.col("w") / F.col("sw") / F.col("n"),
    )
    th = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.format_string(
                "%08x",
                F.least(
                    F.floor(rate * F.lit(4294967296.0)).cast("double"),
                    F.lit(4294967295.0),
                ).cast("bigint"),
            ).alias("hx"),
        )
    )
    return (
        d.join(F.broadcast(th), "source")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < F.col("hx"))
        .select("doc_id", "source")
    )


@register(
    "pipeline_pack_sequences",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks
        FROM documents),
    placed AS (
        SELECT lang, n_toks,
               CAST(sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) - n_toks AS offset_toks,
               doc_id
        FROM toks)
    SELECT lang,
           CAST(offset_toks // 2048 AS BIGINT)  AS chunk_id,
           count(*)                             AS n_docs,
           CAST(sum(n_toks) AS BIGINT)          AS chunk_tokens,
           min(doc_id)                          AS first_doc,
           max(doc_id)                          AS last_doc
    FROM placed
    GROUP BY lang, offset_toks // 2048
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per language, documents are laid
    end-to-end in doc_id order and cut into 2048-token training chunks —
    chunk_id = floor(running-token-offset / seq_len), the GPT-style packing
    every pretraining pipeline runs between cleaning and tokenizer output.
    Emits per-chunk occupancy (how many docs feed each chunk, how many
    tokens land in it) — the packing manifest a trainer shards by.

    Scale: one window sum per language partition (single shuffle on lang —
    at 100 TB partition by (lang, day-bucket) so no single stratum
    serializes; the chunk function only needs the running offset, which a
    bucketed rollup can carry across buckets as a per-bucket base offset),
    then a map-side-combinable aggregate on the SAME partitioning —
    Catalyst reuses one Exchange for both."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), "\\s+")).cast("bigint").alias("n_toks"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn(
        "offset_toks", F.sum("n_toks").over(w) - F.col("n_toks")
    )
    return placed.groupBy(
        "lang", (F.floor(F.col("offset_toks") / 2048)).cast("bigint").alias("chunk_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("chunk_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "pipeline_pretrain_manifest",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, text,
               len(string_split_regex(trim(text), '\\s+')) AS n_toks
        FROM documents
    ),
    gated AS (
        SELECT * FROM toks WHERE n_toks BETWEEN 10 AND 5000
    ),
    deduped AS (
        SELECT lang, min(doc_id) AS keep_id, any_value(n_toks) AS n_toks
        FROM gated GROUP BY sha256(text), lang
    ),
    split AS (
        SELECT lang, keep_id, n_toks,
               CASE WHEN substr(md5(CAST(keep_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train' ELSE 'test' END AS split
        FROM deduped
    ),
    placed AS (
        SELECT lang, split, n_toks, keep_id,
               CAST(sum(n_toks) OVER (PARTITION BY lang, split ORDER BY keep_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_toks AS off
        FROM split
    )
    SELECT lang, split,
           CAST(off // 2048 AS BIGINT) AS chunk_id,
           count(*)                    AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS chunk_tokens,
           min(keep_id)                AS first_doc
    FROM placed GROUP BY 1, 2, 3
    """,
)
def pipeline_pretrain_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end pretraining-data program as ONE DataFrame chain:
    length gate → exact content dedup (keep lowest doc_id per sha256×lang)
    → deterministic md5 train/test split → per-(lang, split) 2048-token
    sequence packing → chunk manifest. Each stage exists standalone in this
    package; the point of the composite is that the WHOLE pipeline stays a
    single declarative plan Catalyst can see through — the gate is a
    codegen filter on the scan, bodies leave the wire after the sha256
    groupBy (only hashes/counts shuffle), and the split column costs no
    extra pass because it's an expression over the dedup key.

    Shuffles: one on the 32-byte hash, one on (lang, split) reused by the
    packing window AND the final aggregate (same partitioning) — at 100 TB
    neither moves document text."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split(F.trim("text"), "\\s+")).alias("n_toks"),
    )
    gated = toks.filter(F.col("n_toks").between(10, 5000))
    deduped = gated.groupBy(F.sha2("text", 256).alias("h"), "lang").agg(
        F.min("doc_id").alias("keep_id"), F.any_value("n_toks").alias("n_toks")
    )
    split = deduped.withColumn(
        "split",
        F.when(
            F.substring(F.md5(F.col("keep_id").cast("string")), 1, 2) < "e6", "train"
        ).otherwise("test"),
    )
    w = (
        Window.partitionBy("lang", "split")
        .orderBy("keep_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = split.withColumn(
        "off", F.sum("n_toks").over(w).cast("bigint") - F.col("n_toks")
    )
    return placed.groupBy(
        "lang",
        "split",
        F.floor(F.col("off") / 2048).cast("bigint").alias("chunk_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("chunk_tokens"),
        F.min("keep_id").alias("first_doc"),
    )


# 4-token shingles for eval-set decontamination; 4 is small enough to fire on
# the short synthetic fixture docs while keeping the funnel selective (real
# pipelines use 8-13-gram overlap, same plan shape)
_DECON_N = 4

_DECON_GRAMS_CTE = """
    toks AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, lang,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 3, 0) + 1),
                   i -> list_aggregate(t[i:i+3], 'string_agg', ' ')))) AS g
        FROM toks
    )
"""


@register(
    "pipeline_decontaminate",
    oracle=f"""
    WITH {_DECON_GRAMS_CTE},
    eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
    hits AS (
        SELECT gr.doc_id, gr.lang, count(*) AS n_shared
        FROM grams gr JOIN eval_g e ON gr.g = e.g
        WHERE gr.doc_id % 20 <> 0
        GROUP BY gr.doc_id, gr.lang
    ),
    train AS (SELECT doc_id, lang FROM documents WHERE doc_id % 20 <> 0)
    SELECT tr.doc_id, tr.lang,
           CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
           CASE WHEN coalesce(h.n_shared, 0) = 0 THEN 1 ELSE 0 END AS is_clean
    FROM train tr LEFT JOIN hits h ON tr.doc_id = h.doc_id AND tr.lang = h.lang
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training documents sharing any
    4-token shingle with the held-out eval slice (doc_id % 20 = 0 stands in
    for the benchmark set). The shape is the standard n-gram-overlap
    decontamination pass every pretraining pipeline runs before training.

    Scale shape: shingle generation is a per-row expression (sequence →
    transform → explode) inside the scan stage; the overlap test is an
    equi-join on the shingle string — NOT a cross join — so it shuffles on
    the shingle key and AQE can split hot shingles. At 100 TB the eval side
    is tiny (a benchmark suite), so the gram join broadcasts; here both
    sides flow through the same hash join. Only (doc_id, lang, gram) tuples
    shuffle — never document bodies — and the per-doc hit count collapses
    map-side before the final left join back onto the narrow train frame."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    grams_arr = F.when(
        F.size(toks) >= _DECON_N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (_DECON_N - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, _DECON_N)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = spread(d, "doc_id").select(
        "doc_id", "lang", F.explode(grams_arr).alias("g")
    )
    is_eval = F.col("doc_id") % 20 == 0
    eval_g = grams.filter(is_eval).select("g").distinct()
    hits = (
        grams.filter(~is_eval)
        .join(eval_g, "g")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    train = d.filter(~is_eval).select("doc_id", "lang")
    n_shared = F.coalesce("n_shared", F.lit(0)).cast("bigint")
    return train.join(hits, ["doc_id", "lang"], "left").select(
        "doc_id",
        "lang",
        n_shared.alias("n_shared"),
        F.when(n_shared == 0, 1).otherwise(0).alias("is_clean"),
    )


@register(
    "pipeline_corpus_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS k
        FROM documents
    )
    SELECT doc_id,
           CAST((strpos('0123456789abcdef', substr(k, 1, 1)) - 1) % 8
                AS INTEGER) AS shard,
           CAST(row_number() OVER (
                    PARTITION BY (strpos('0123456789abcdef', substr(k, 1, 1)) - 1) % 8
                    ORDER BY k)
                AS BIGINT) AS pos
    FROM keyed
    """,
)
def pipeline_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded corpus shuffle into training shards: every doc
    gets a reproducible pseudo-random key md5(seed ‖ doc_id), a shard from
    the key's first hex digit (uniform 16 → 8 fold), and a position within
    the shard by key order — the (shard, pos) manifest a dataloader streams
    in "shuffled" order without any engine-side rand().

    Scale shape: this is the scale-correct alternative to a global
    ORDER BY rand() — shard assignment is a pure expression (no exchange),
    and the within-shard position is ONE hash exchange on shard + an
    in-partition sort, instead of a global range exchange over the corpus.
    Only (doc_id, key) pairs shuffle, never bodies; shards are hash-balanced
    by construction so there is no skew to salt."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    k = F.md5(F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string")))
    keyed = d.select("doc_id", k.alias("k"))
    shard = (
        F.expr("locate(substring(k, 1, 1), '0123456789abcdef')") - 1
    ) % 8
    w = Window.partitionBy("shard").orderBy("k")
    return (
        keyed.withColumn("shard", shard.cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("k")
    )


_CHUNK = 32
_STRIDE = 24


@register(
    "pipeline_chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n FROM documents
    ),
    s AS (
        SELECT doc_id, toks, n, unnest(range(0, greatest(n - 1, 0) + 1, {_STRIDE})) AS start
        FROM t
    ),
    c AS (
        SELECT doc_id,
               start // {_STRIDE} AS chunk_idx,
               start AS chunk_start,
               list_slice(toks, start + 1, start + {_CHUNK}) AS chunk
        FROM s
    )
    SELECT doc_id, chunk_idx, chunk_start,
           CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM c WHERE len(chunk) > 0
    """,
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — 32-token chunks at stride 24
    (8-token overlap), the context-window packing precursor every
    pretraining pipeline runs (RAG indexers run the same op before
    embedding). Emits a per-chunk md5 fingerprint rather than the text so
    the manifest stays narrow; the trailing partial chunk is kept, empty
    chunks are dropped.

    Plan shape: tokenize → sequence → posexplode all fuse into the scan
    stage (one codegen pass, zero shuffles); output is ~n_tokens/stride
    rows per doc with only (ids, 32-byte hash) columns, so chunking 100 TB
    is embarrassingly parallel and the bodies never leave the scan."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    t = d.select("doc_id", tokens("text").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(_STRIDE)
    )
    s = t.select("doc_id", "toks", F.explode(starts).alias("start"))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, F.lit(_CHUNK))
    c = s.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("bigint").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("chunk_start"),
        chunk.alias("chunk"),
    )
    return c.filter(F.size("chunk") > 0).select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.size("chunk").cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@register(
    "pipeline_pii_scrub",
    oracle=f"""
    SELECT event_id,
           regexp_replace(regexp_replace(props, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '[0-9]', '#', 'g') AS props_scrubbed,
           CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g'))
                AS BIGINT) AS n_digits_masked
    FROM events
    """,
)
def pipeline_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / sensitive-token scrubbing over raw event payloads: masks
    email-shaped substrings and every digit (numeric IDs, phone fragments)
    before the payloads can enter a training corpus, and counts masked
    digits per event for audit. The regexes stay in the RE2 ∩ Java-regex
    common subset (character classes + bounded repetition, no backrefs) so
    both engines execute the identical pattern.

    Plan shape: pure per-row expressions in the scan stage — zero
    shuffles, codegen end to end, trivially parallel at any scale."""
    ev = load_table(spark, sf_dir, "events")
    digits_gone = F.regexp_replace("props", "[0-9]", "")
    return spread(ev, "event_id").select(
        "event_id",
        F.regexp_replace(
            F.regexp_replace("props", _EMAIL_RE, "<EMAIL>"), "[0-9]", "#"
        ).alias("props_scrubbed"),
        (F.length("props") - F.length(digits_gone))
        .cast("bigint")
        .alias("n_digits_masked"),
    )


@register(
    "pipeline_dataset_card",
    oracle=f"""
    WITH base AS (
        SELECT source, lang, len({_TOKS}) AS n_toks, md5(text) AS h
        FROM documents
    )
    SELECT source, lang,
           CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT)            AS n_docs,
           CAST(sum(n_toks) AS BIGINT)         AS total_tokens,
           CAST(count(DISTINCT h) AS BIGINT)   AS n_unique_docs,
           round(1.0 - count(DISTINCT h) * 1.0 / count(*), 4) AS dup_ratio,
           round(avg(n_toks), 4)               AS avg_tokens
    FROM base
    GROUP BY ROLLUP (source, lang)
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics — the per-(source, lang) summary table every
    corpus release ships (doc counts, token totals, exact-dup ratio via
    content-hash distinct, mean length), with ROLLUP subtotals per source
    and a grand total, labeled by grouping id.

    Plan shape: one scan computing (source, lang, n_toks, md5) → rollup
    aggregate. The count(DISTINCT h) expands the rollup into a per-level
    partial on the 16-byte hash — the only corpus-sized shuffle, keyed on
    the hash, AQE-coalesced; every other measure is map-side combinable.
    Output is |sources|×|langs| + |sources| + 1 rows regardless of corpus
    size."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source", "lang", F.size(tokens("text")).alias("n_toks"),
        F.md5("text").alias("h"),
    )
    return (
        base.rollup("source", "lang")
        .agg(
            (F.grouping("source") * 2 + F.grouping("lang"))
            .cast("bigint")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.countDistinct("h").alias("n_unique_docs"),
            F.round(
                F.lit(1.0) - F.countDistinct("h") / F.count(F.lit(1)), 4
            ).alias("dup_ratio"),
            F.round(F.avg("n_toks"), 4).alias("avg_tokens"),
        )
        .select(
            "source", "lang", "gid", "n_docs", "total_tokens",
            "n_unique_docs", "dup_ratio", "avg_tokens",
        )
    )


@register(
    "pipeline_dedup_incremental",
    oracle="""
    WITH incoming AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
    base AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
    exact AS (
        SELECT i.doc_id, min(b.doc_id) AS match_doc
        FROM incoming i JOIN base b ON sha256(i.text) = sha256(b.text)
        GROUP BY i.doc_id),
    itoks AS (SELECT doc_id,
                     unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS t
              FROM incoming),
    btoks AS (SELECT doc_id,
                     unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS t
              FROM base),
    isz AS (SELECT doc_id, count(*) AS n FROM itoks GROUP BY 1),
    bsz AS (SELECT doc_id, count(*) AS n FROM btoks GROUP BY 1),
    near AS (
        SELECT x.doc_id, min(x.match_doc) AS match_doc FROM (
            SELECT i.doc_id, b.doc_id AS match_doc, count(*) AS ix
            FROM itoks i JOIN btoks b ON i.t = b.t
            GROUP BY 1, 2) x
        JOIN isz ON x.doc_id = isz.doc_id
        JOIN bsz ON x.match_doc = bsz.doc_id
        WHERE ix * 1.0 / (isz.n + bsz.n - ix) >= 0.95
        GROUP BY x.doc_id)
    SELECT i.doc_id,
           CASE WHEN e.match_doc IS NOT NULL THEN 'exact_dup'
                WHEN n.match_doc IS NOT NULL THEN 'near_dup'
                ELSE 'keep' END AS verdict,
           coalesce(e.match_doc, n.match_doc) AS match_doc
    FROM incoming i
    LEFT JOIN exact e ON i.doc_id = e.doc_id
    LEFT JOIN near n ON i.doc_id = n.doc_id
    """,
)
def pipeline_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the shape every production corpus actually
    needs: a new crawl batch (here doc_id % 10 = 0 simulates the delta)
    deduped AGAINST the standing corpus without re-pairing the corpus with
    itself. Batch-vs-batch pipelines (`dedup_exact_docs_hash`,
    `dedup_ngram_jaccard`) recompute all O(corpus²) candidates every run;
    the incremental form pairs only delta × corpus — at 100 TB with a 0.1%
    daily delta that is a 1000× smaller candidate space, which is the
    difference between an hourly job and an impossible one.

    Funnel, cheapest test first: (1) exact — equi-join on sha2-256 (delta
    side shuffles 32-byte keys; on a real lakehouse the corpus hash column
    is precomputed and bucketed, so only the delta shuffles); (2) near —
    the same exactness-preserving size-filter as `dedup_ngram_jaccard`
    (Jaccard ≥ 0.95 ⟹ token counts within ±1) but DIRECTIONAL: incoming
    probes the base's size buckets, never base×base. Verdicts resolve
    exact > near > keep, with the smallest matching base doc as evidence."""
    d = load_table(spark, sf_dir, "documents")
    incoming = d.filter(F.col("doc_id") % 10 == 0)
    base = d.filter(F.col("doc_id") % 10 != 0)

    exact = (
        incoming.select("doc_id", F.sha2("text", 256).alias("h"))
        .join(
            base.select(F.sha2("text", 256).alias("h"), F.col("doc_id").alias("b_id")),
            "h",
        )
        .groupBy("doc_id")
        .agg(F.min("b_id").alias("exact_match"))
    )

    def _tok_docs(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.array_distinct(F.split(F.trim("text"), "\\s+")).alias("toks"),
        ).withColumn("n", F.size("toks"))

    i_docs = _tok_docs(incoming).select(
        F.col("doc_id").alias("i_id"), F.col("toks").alias("ti"), F.col("n").alias("ni")
    )
    b_docs = spread(
        _tok_docs(base).select(
            F.col("doc_id").alias("b_id"),
            F.col("toks").alias("tb"),
            F.col("n").alias("nb"),
            F.explode(
                F.array(F.col("n") - 1, F.col("n"), F.col("n") + 1)
            ).alias("probe"),
        ),
        "b_id",
    )
    inter = F.size(F.array_intersect("ti", "tb"))
    jac = inter / (F.col("ni") + F.col("nb") - inter)
    near = (
        size_gated_broadcast(i_docs)
        .join(b_docs, F.col("ni") == F.col("probe"))
        .filter(jac >= 0.95)
        .groupBy(F.col("i_id").alias("doc_id"))
        .agg(F.min("b_id").alias("near_match"))
    )

    return (
        incoming.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), "exact_dup")
            .when(F.col("near_match").isNotNull(), "near_dup")
            .otherwise("keep")
            .alias("verdict"),
            F.coalesce("exact_match", "near_match").alias("match_doc"),
        )
    )


@register(
    "pipeline_systematic_sample",
    oracle="""
    WITH laid AS (
        SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS w,
               md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
               sum(CAST(n_chars AS BIGINT)) OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM documents
    ),
    tot AS (SELECT CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total
            FROM documents)
    SELECT doc_id, lang, source, w,
           CAST((cum * 100) // tot.total AS BIGINT) AS strata_hit
    FROM laid CROSS JOIN tot
    WHERE (cum * 100) // tot.total > ((cum - w) * 100) // tot.total
    """,
)
def pipeline_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional systematic sampling of ~100 documents, weighted
    by character count: lay the corpus out on a byte line in
    md5-shuffled order, then take one document at every 1/100th of the
    total — each doc's selection probability is proportional to its
    length, exactly the doc-level sampling a token-budget-matched
    training-mix draw needs (long docs carry more tokens, so they must be
    proportionally likelier). Systematic (one draw per stratum) beats
    independent Bernoulli draws on variance, and the md5 order makes the
    draw deterministic and replayable — same corpus, same sample, any
    cluster (`pipeline_train_test_split` precedent: never
    `rand()`-dependent).

    Determinism: weights and cumulative offsets are 64-bit integers; the
    threshold test is pure integer multiply + floor-divide — bit-exact,
    no floating point anywhere. A doc spanning multiple strata (w >
    total/100) is emitted once (its strata_hit reports the LAST threshold
    it covers), so the sample size is ≤100 with equality when no doc
    exceeds a stratum.

    Plan shape: one running-sum window over the md5 order. The explicit
    global order is the operator's point, and it runs on (doc_id, lang,
    source, n_chars) — manifest-width rows, not text. At 100 TB,
    range-partition the window on the md5 prefix and offset each
    partition by the preceding partitions' totals (the
    `scale_compaction_plan` two-pass note); the text column never
    moves."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    laid = d.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("w"),
        F.sum(F.col("n_chars").cast("bigint")).over(w).alias("cum"),
    )
    tot = d.agg(F.sum(F.col("n_chars").cast("bigint")).alias("total"))
    hit = F.expr("(cum * 100) div total")
    before = F.expr("((cum - w) * 100) div total")
    return (
        laid.crossJoin(F.broadcast(tot))
        .filter(hit > before)
        .select("doc_id", "lang", "source", "w", hit.alias("strata_hit"))
    )


@register(
    "pipeline_snapshot_diff",
    oracle="""
    WITH tagged AS (
        SELECT doc_id, text,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS p
        FROM documents
    ),
    old AS (
        SELECT doc_id, sha256(text) AS h FROM tagged WHERE p <> 'ff'
    ),
    new AS (
        SELECT doc_id,
               sha256(CASE WHEN p < '08' THEN upper(text) ELSE text END) AS h
        FROM tagged WHERE p <> 'fe'
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           o.h AS old_hash, n.h AS new_hash
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h
    """,
)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff — the dataset-versioning primitive: given two
    snapshots of the documents table, report every doc that was ADDED,
    REMOVED, or CHANGED (content hash differs), the delta a training-data
    registry records per release and the input an incremental
    re-processing run consumes instead of the full corpus. The two
    snapshots are simulated deterministically from the one fixture table
    (md5-prefix 'ff' docs are new-since-old, 'fe' docs deleted-in-new,
    prefix < '08' docs edited — upper-cased — in new), so the diff is
    value-checkable; on real data the two sides are two table versions.

    Plan shape: each side reduces to a (doc_id, sha256) MANIFEST in the
    scan stage — the full-outer join and the change test shuffle 32-byte
    hashes on doc_id, never text. Unchanged docs (the overwhelming bulk)
    are dropped by the post-join filter; at 100 TB both manifests come
    straight from the table format's own content hashes and the diff is
    metadata-only."""
    d = load_table(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id",
        "text",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("p"),
    )
    old = tagged.filter(F.col("p") != "ff").select(
        F.col("doc_id").alias("o_id"), F.sha2("text", 256).alias("old_hash")
    )
    new = tagged.filter(F.col("p") != "fe").select(
        F.col("doc_id").alias("n_id"),
        F.sha2(
            F.when(F.col("p") < "08", F.upper("text")).otherwise(F.col("text")),
            256,
        ).alias("new_hash"),
    )
    j = old.join(new, F.col("o_id") == F.col("n_id"), "full_outer")
    return j.filter(
        F.col("o_id").isNull()
        | F.col("n_id").isNull()
        | (F.col("old_hash") != F.col("new_hash"))
    ).select(
        F.coalesce(F.col("o_id"), F.col("n_id")).alias("doc_id"),
        F.when(F.col("o_id").isNull(), "added")
        .when(F.col("n_id").isNull(), "removed")
        .otherwise("changed")
        .alias("status"),
        "old_hash",
        "new_hash",
    )


@register(
    "pipeline_quality_gate_funnel",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tok,
               length(text) AS n_ch,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                   t -> len(t) >= 3)) * 1.0
                 / greatest(len(string_split_regex(trim(text), '\\s+')), 1)
                   AS long_tok_ratio
        FROM documents
    ),
    gated AS (
        SELECT doc_id,
               CASE WHEN n_tok >= 10 THEN 1 ELSE 0 END AS g1,
               CASE WHEN n_tok >= 10 AND n_ch >= 80 THEN 1 ELSE 0 END AS g2,
               CASE WHEN n_tok >= 10 AND n_ch >= 80
                     AND long_tok_ratio >= 0.5 THEN 1 ELSE 0 END AS g3
        FROM scored
    )
    SELECT * FROM (
        SELECT 0 AS gate_no, 'input' AS gate, CAST(count(*) AS BIGINT) AS n_pass,
               1.0 AS pass_rate FROM gated
        UNION ALL
        SELECT 1, 'min_tokens_10', CAST(sum(g1) AS BIGINT),
               round(sum(g1) * 1.0 / count(*), 4) FROM gated
        UNION ALL
        SELECT 2, '+min_chars_80', CAST(sum(g2) AS BIGINT),
               round(sum(g2) * 1.0 / count(*), 4) FROM gated
        UNION ALL
        SELECT 3, '+long_token_ratio_50', CAST(sum(g3) AS BIGINT),
               round(sum(g3) * 1.0 / count(*), 4) FROM gated
    )
    """,
)
def pipeline_quality_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate funnel accounting: how many documents survive each
    successive filter (token floor → char floor → long-token ratio) and
    the cumulative pass rate — the per-stage loss report every corpus
    cleaning pipeline publishes so a collapsed stage (a gate suddenly
    eating 40% of the corpus) is visible BEFORE training, not after.
    Gates are cumulative by construction (a doc counts at stage k only
    if it passed 1..k-1), so n_pass is monotonically nonincreasing.

    Plan shape: gate predicates are row-local expressions in the scan
    stage; the report is ONE aggregate over four conditional sums (one
    scan, no shuffle beyond the single 1-row reduction) unioned into the
    4-row funnel — at any corpus size the output is |gates| rows."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks)
    long_ratio = F.size(F.filter(toks, lambda t: F.length(t) >= 3)) / F.greatest(
        n_tok, F.lit(1)
    )
    g1 = (n_tok >= 10).cast("int")
    g2 = ((n_tok >= 10) & (F.length("text") >= 80)).cast("int")
    g3 = ((n_tok >= 10) & (F.length("text") >= 80) & (long_ratio >= 0.5)).cast(
        "int"
    )
    agg = d.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(g1).alias("n1"),
        F.sum(g2).alias("n2"),
        F.sum(g3).alias("n3"),
    )
    rows = []
    labels = [
        (0, "input", "n0"),
        (1, "min_tokens_10", "n1"),
        (2, "+min_chars_80", "n2"),
        (3, "+long_token_ratio_50", "n3"),
    ]
    for no, label, col in labels:
        rate = (
            F.lit(1.0)
            if no == 0
            else F.round(F.col(col) * F.lit(1.0) / F.col("n0"), 4)
        )
        rows.append(
            agg.select(
                F.lit(no).alias("gate_no"),
                F.lit(label).alias("gate"),
                F.col(col).alias("n_pass"),
                rate.alias("pass_rate"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@register(
    "pipeline_token_budget_allocator",
    oracle="""
    WITH src AS (
        SELECT source,
               CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS tokens
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(tokens) AS BIGINT) AS total,
               CAST(sum(tokens) // 2 AS BIGINT) AS budget,
               CAST(count(*) AS BIGINT) AS n_src
        FROM src
    ),
    laid AS (
        SELECT s.source, s.tokens, tot.budget, tot.n_src,
               row_number() OVER (ORDER BY s.tokens, s.source) AS rn,
               coalesce(sum(s.tokens) OVER (
                   ORDER BY s.tokens, s.source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM src s CROSS JOIN tot
    ),
    thr AS (
        SELECT *,
               (budget - cum_before) * 1.0 / (n_src - rn + 1) AS thr
        FROM laid
    ),
    cap AS (SELECT min_by(thr, rn) AS cap FROM thr WHERE tokens > thr)
    SELECT t.source, t.tokens,
           CAST(CASE WHEN cap.cap IS NULL OR t.tokens <= cap.cap
                     THEN t.tokens ELSE floor(cap.cap) END AS BIGINT) AS quota,
           round(CAST(CASE WHEN cap.cap IS NULL OR t.tokens <= cap.cap
                           THEN t.tokens ELSE floor(cap.cap) END AS BIGINT)
                 * 1.0 / t.tokens, 4) AS keep_ratio
    FROM thr t CROSS JOIN cap
    """,
)
def pipeline_token_budget_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation across sources: given a
    global budget (half the corpus here), every source keeps all its
    tokens until the fair cap, and sources above the cap are clipped TO
    the cap — the max-min-fair quota rule a training-mix builder applies
    so small sources survive whole while the dominant crawl absorbs the
    entire cut. The cap is found in CLOSED FORM, no iteration: sort
    sources ascending, and at each prefix compute the candidate cap
    (remaining budget / remaining sources); the binding cap is the
    smallest candidate that its own source exceeds (NULL when the budget
    covers everything — then every quota is the full count).

    Determinism: token counts, cumulative sums, and the floored final
    quota are integers; the cap comparison uses the identical division
    tree in both engines.

    Plan shape: per-source token counts are one map-side-combinable
    groupBy (|sources| rows — metadata scale); everything after runs on
    that tiny frame: one ordered window pass, a 1-row cap reduction, and
    a row-local clip."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).alias("tokens")
    )
    tot = src.agg(
        F.sum("tokens").alias("total"),
        F.expr("sum(tokens) div 2").alias("budget"),
        F.count(F.lit(1)).alias("n_src"),
    )
    w_ord = Window.orderBy("tokens", "source")
    laid = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("rn", F.row_number().over(w_ord))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("tokens").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    thr = laid.withColumn(
        "thr",
        (F.col("budget") - F.col("cum_before"))
        * F.lit(1.0)
        / (F.col("n_src") - F.col("rn") + 1),
    )
    # the binding cap is the candidate at the FIRST (smallest-rn)
    # violation: prefix sources keep full counts, so later candidates'
    # cum_before assumptions no longer hold (and can go negative)
    cap = thr.filter(F.col("tokens") > F.col("thr")).agg(
        F.min_by("thr", "rn").alias("cap")
    )
    quota = F.when(
        F.col("cap").isNull() | (F.col("tokens") <= F.col("cap")),
        F.col("tokens"),
    ).otherwise(F.floor(F.col("cap"))).cast("bigint")
    return (
        thr.crossJoin(F.broadcast(cap))
        .select(
            "source",
            "tokens",
            quota.alias("quota"),
            F.round(quota * F.lit(1.0) / F.col("tokens"), 4).alias("keep_ratio"),
        )
    )


@register(
    "pipeline_schema_drift_report",
    oracle="""
    WITH a AS (SELECT * FROM events WHERE event_id % 2 = 0),
    b AS (SELECT * FROM events WHERE event_id % 2 = 1),
    m AS (
        SELECT 'user_id' AS column_name,
               (SELECT CAST(count(user_id) AS BIGINT) FROM a) AS n_a,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM a) AS distinct_a,
               (SELECT CAST(count(user_id) AS BIGINT) FROM b) AS n_b,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM b) AS distinct_b
        UNION ALL
        SELECT 'event_type',
               (SELECT CAST(count(event_type) AS BIGINT) FROM a),
               (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM a),
               (SELECT CAST(count(event_type) AS BIGINT) FROM b),
               (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM b)
        UNION ALL
        SELECT 'value',
               (SELECT CAST(count(value) AS BIGINT) FROM a),
               (SELECT CAST(count(DISTINCT value) AS BIGINT) FROM a),
               (SELECT CAST(count(value) AS BIGINT) FROM b),
               (SELECT CAST(count(DISTINCT value) AS BIGINT) FROM b)
    )
    SELECT column_name, n_a, distinct_a, n_b, distinct_b,
           round(abs(distinct_a - distinct_b) * 1.0
                 / greatest(distinct_a, distinct_b), 4) AS distinct_drift,
           CASE WHEN abs(distinct_a - distinct_b) * 1.0
                     / greatest(distinct_a, distinct_b) > 0.1
                THEN 1 ELSE 0 END AS drift_flag
    FROM m
    """,
)
def pipeline_schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile drift between two dataset versions — the
    data-contract monitor every scheduled pipeline runs before promoting
    a batch: non-null and distinct cardinalities per column on each side
    (deterministic interleaved halves stand in for yesterday/today), the
    relative distinct-count drift, and a flag past 10%. A column whose
    cardinality halves overnight (an upstream enum collapse, a join gone
    one-to-many) fails the contract HERE, not three stages later in a
    training job.

    Plan shape: each side is profiled in ONE pass — a single aggregate
    computes every column's count + approx-free distinct via grouping
    the per-column aggregates together (two scans total, one per side,
    each map-side combinable); the comparison frame is |columns| rows.
    At 100 TB widen with `approx_count_distinct` per column (one pass,
    mergeable sketches) — the report shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")

    def profile(side_filter, suffix):
        side = ev.filter(side_filter)
        agg = side.agg(
            F.count("user_id").alias("n_user_id"),
            F.countDistinct("user_id").alias("d_user_id"),
            F.count("event_type").alias("n_event_type"),
            F.countDistinct("event_type").alias("d_event_type"),
            F.count("value").alias("n_value"),
            F.countDistinct("value").alias("d_value"),
        )
        return agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column_name"),
                            F.col(f"n_{c}").alias(f"n_{suffix}"),
                            F.col(f"d_{c}").alias(f"distinct_{suffix}"),
                        )
                        for c in ("user_id", "event_type", "value")
                    ]
                )
            ).alias("p")
        ).select("p.*")

    a = profile(F.col("event_id") % 2 == 0, "a")
    b = profile(F.col("event_id") % 2 == 1, "b")
    drift = F.abs(F.col("distinct_a") - F.col("distinct_b")) * F.lit(1.0) / F.greatest(
        F.col("distinct_a"), F.col("distinct_b")
    )
    return (
        a.join(b, "column_name")
        .select(
            "column_name",
            "n_a",
            "distinct_a",
            "n_b",
            "distinct_b",
            F.round(drift, 4).alias("distinct_drift"),
            F.when(drift > 0.1, 1).otherwise(0).alias("drift_flag"),
        )
    )


_MIX_ALPHA = 0.7  # temperature exponent (mT5/XLM-R-style mixing)


def temperature_mixture_from_counts(counts: DataFrame) -> DataFrame:
    """Temperature-scaled mixture weights from a (source, n_docs) count
    frame — the read-time derivation shared by the batch operator
    (`pipeline_temperature_mixture`) and its incremental twin
    (`stream_temperature_mixture_update`), factored exactly like
    `dsir_scores_from_bucket_counts` so the IVM guarantee is BY
    CONSTRUCTION: both callers run the identical q_i ∝ p_i^α math over
    whatever count frame they maintain.

    Determinism: shares are one division each; `power(p, 0.7)` sits on
    the ln/exp precedent (round(4) absorbs cross-engine libm ulps); the
    Σp^α normalizer aggregates ~|sources| terms whose order-sensitivity
    is ~1e-16 against 1e-4 granularity. Plan: a 1-row total broadcast
    and an unpartitioned window sum over the |sources|-row frame —
    nothing at corpus scale."""
    tot = counts.agg(F.sum("n_docs").cast("bigint").alias("t"))
    p = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.col("n_docs") / F.col("t")).alias("raw_share"),
        F.pow(F.col("n_docs") / F.col("t"), F.lit(_MIX_ALPHA)).alias("pw"),
    )
    denom = F.sum("pw").over(Window.partitionBy())
    return p.select(
        "source",
        "n_docs",
        F.round("raw_share", 4).alias("raw_share"),
        F.round(F.col("pw") / denom, 4).alias("temp_share"),
        F.round((F.col("pw") / denom) / F.col("raw_share"), 4).alias(
            "upsample_factor"
        ),
    )


@register(
    "pipeline_temperature_mixture",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM counts),
    p AS (
        SELECT source, n_docs,
               n_docs * 1.0 / t AS raw_share,
               power(n_docs * 1.0 / t, {_MIX_ALPHA}) AS pw
        FROM counts CROSS JOIN tot
    )
    SELECT source, n_docs,
           round(raw_share, 4) AS raw_share,
           round(pw / sum(pw) OVER (), 4) AS temp_share,
           round((pw / sum(pw) OVER ()) / raw_share, 4) AS upsample_factor
    FROM p
    """,
)
def pipeline_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source — the mT5/XLM-R
    mixing rule q_i ∝ p_i^α (α = 0.7) that upsamples small sources and
    damps dominant ones, the standard knob multilingual/multi-domain
    pretraining mixes turn before `pipeline_domain_mix`-style sampling
    materializes the plan. `upsample_factor` = q_i/p_i is the per-source
    epoch multiplier a data loader applies.

    Plan: one map-side-combinable groupBy(source) over the corpus, then
    the metadata-scale derivation in `temperature_mixture_from_counts`
    (shared with the streaming IVM twin `stream_temperature_mixture_update`
    — see the helper's docstring for the determinism notes)."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return temperature_mixture_from_counts(counts)


@register(
    "pipeline_quality_dup_correlation",
    oracle="""
    WITH h AS (SELECT doc_id, n_chars, sha256(text) AS hh FROM documents),
    cnt AS (SELECT hh, CAST(count(*) AS BIGINT) AS c FROM h GROUP BY 1),
    dec AS (
        SELECT doc_id, n_chars, hh,
               ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
        FROM h
    )
    SELECT CAST(decile AS BIGINT) AS length_decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_duplicated,
           round(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
               AS dup_rate
    FROM dec JOIN cnt USING (hh)
    GROUP BY decile
    """,
)
def pipeline_quality_dup_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate rate per document-length decile — the diagnostic that
    tells a pipeline WHERE its duplication lives (short boilerplate docs
    duplicate far more than long-form text in real corpora), which
    decides whether dedup should run before or after the length gate and
    how much budget the near-dup pass deserves per stratum.

    Plan shape: one sha256 hash-groupBy for copy counts (32-byte keys,
    bodies never shuffle), one ntile window on the narrow (n_chars,
    doc_id) frame, one 10-group rollup. All counts integer; dup_rate is
    one division under round(4); ntile ties are broken by doc_id so
    decile assignment is deterministic on both engines."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select("doc_id", "n_chars", F.sha2("text", 256).alias("hh"))
    cnt = h.groupBy("hh").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    dec = h.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("n_chars", "doc_id"))
    )
    return (
        dec.join(cnt, "hh")
        .groupBy(F.col("decile").cast("bigint").alias("length_decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_duplicated"),
            F.round(
                F.sum(F.when(F.col("c") > 1, 1).otherwise(0)) / F.count(F.lit(1)), 4
            ).alias("dup_rate"),
        )
    )


_LEN_THRESHOLDS = (25, 50, 100, 150)


@register(
    "pipeline_length_filter_ablation",
    oracle=f"""
    WITH sized AS (
        SELECT n_chars,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_toks
        FROM documents
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_toks) AS BIGINT) AS tk
        FROM sized
    )
    {" UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS min_chars, "
        f"CAST(count(*) FILTER (n_chars >= {t}) AS BIGINT) AS n_docs_kept, "
        f"CAST(coalesce(sum(n_toks) FILTER (n_chars >= {t}), 0) AS BIGINT) "
        f"    AS n_tokens_kept, "
        f"round(count(*) FILTER (n_chars >= {t}) * 1.0 / any_value(n), 4) "
        f"    AS doc_survival, "
        f"round(coalesce(sum(n_toks) FILTER (n_chars >= {t}), 0) * 1.0 "
        f"    / any_value(tk), 4) AS token_survival "
        f"FROM sized CROSS JOIN tot"
        for t in _LEN_THRESHOLDS)}
    """,
)
def pipeline_length_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sweep ablation for the minimum-length quality gate: for
    each candidate cutoff, the docs AND tokens that would survive — the
    table a pipeline owner actually reads before picking the gate
    (doc-survival and token-survival diverge because long docs carry
    disproportionate tokens; gates are chosen on the token curve).

    Plan shape: ONE scan computes per-doc token counts; all four
    thresholds evaluate as conditional aggregates over the same frame
    (Catalyst shares the pass), exploded to one row per threshold — the
    sweep costs one aggregate, not |thresholds| scans. All counts
    bigint; survivals are one division each under round(4)."""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "n_chars", F.size(tokens("text")).cast("bigint").alias("n_toks")
    )
    agg = sized.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_toks").cast("bigint").alias("tk"),
        *[
            e
            for t in _LEN_THRESHOLDS
            for e in (
                F.sum(F.when(F.col("n_chars") >= t, 1).otherwise(0))
                .cast("bigint")
                .alias(f"d{t}"),
                F.coalesce(
                    F.sum(F.when(F.col("n_chars") >= t, F.col("n_toks"))), F.lit(0)
                )
                .cast("bigint")
                .alias(f"t{t}"),
            )
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).cast("bigint").alias("min_chars"),
                F.col(f"d{t}").alias("n_docs_kept"),
                F.col(f"t{t}").alias("n_tokens_kept"),
                F.round(F.col(f"d{t}") / F.col("n"), 4).alias("doc_survival"),
                F.round(F.col(f"t{t}") / F.col("tk"), 4).alias("token_survival"),
            )
            for t in _LEN_THRESHOLDS
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.min_chars",
        "r.n_docs_kept",
        "r.n_tokens_kept",
        "r.doc_survival",
        "r.token_survival",
    )


@register(
    "pipeline_bpe_first_merge",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    pr AS (
        SELECT substr(t, CAST(u.i AS INTEGER), 2) AS pair
        FROM tok, LATERAL unnest(range(1, length(t))) AS u(i)
        WHERE length(t) >= 2
    ),
    counted AS (
        SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM pr GROUP BY pair
    )
    SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair) AS BIGINT)
               AS merge_rank,
           pair, n_occurrences
    FROM counted
    ORDER BY n_occurrences DESC, pair
    LIMIT 10
    """,
)
def pipeline_bpe_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first round of BPE tokenizer training as a query: adjacent
    character-pair frequencies WITHIN words across the corpus — the exact
    statistic byte-pair encoding maximizes to pick its first merge — and
    the top-10 merge candidates. A full trainer iterates this after
    rewriting the corpus with each merge; round one is the
    embarrassingly-relational part a Spark pipeline runs at corpus scale
    to seed (or audit) a tokenizer, and the ranking alone exposes
    vocabulary skew (`text_zipf_fit`'s sibling at the subword level).

    Plan shape: token explode → in-row pair explode (sequence/transform,
    stays in the scan stage) → ONE map-side-combinable (pair) count —
    the aggregate collapses the character-level blow-up to |alphabet|²
    partials before the shuffle; top-10 is a TakeOrdered on the tiny
    counts frame. All counts integer; ties break lexicographically."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(F.explode(tokens("text")).alias("t"))
    pairs = tok.filter(F.length("t") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.col("t").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    return (
        counted.withColumn(
            "merge_rank",
            F.row_number()
            .over(Window.orderBy(F.col("n_occurrences").desc(), "pair"))
            .cast("bigint"),
        )
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(10)
        .select("merge_rank", "pair", "n_occurrences")
    )


_BPE_MERGES = 3
_BPE_SEP = "\x1f"  # U+001F unit separator — absence from the corpus is
#                    ENFORCED by a raise_error guard in the word build
_BPE_SEP_SQL = "chr(31)"


def _bpe_round_sql(i: int) -> str:
    """CTEs for one unrolled BPE merge round: overlapping adjacent-pair
    counts over the current symbol sequences (weighted by word frequency),
    the argmax pair (ties (x, y)-lexicographic), and — for non-final
    rounds — the corpus rewrite. Every symbol is wrapped in its OWN
    separator pair (``SEP sym SEP``), so the merge — a literal replace of
    ``SEP x SEP SEP y SEP`` with ``SEP xy SEP`` — consumes no character a
    neighboring match needs: leftmost-non-overlapping replace is then
    EXACTLY greedy BPE ("aaaa" + (a,a) → [aa, aa]; with a single shared
    separator it would mis-produce [aa, a, a] because the trailing
    boundary of one match is the leading boundary of the next — caught by
    tests/test_bpe_boundary.py before either engine shipped the shared
    mistake)."""
    sep = _BPE_SEP_SQL
    count_best = f"""
    p{i} AS (
        SELECT l[i] AS x, l[CAST(i AS INTEGER) + 1] AS y,
               CAST(sum(n) AS BIGINT) AS cnt
        FROM (SELECT n, list_filter(string_split(seq, {sep}), s -> s <> '')
                     AS l
              FROM w{i - 1}),
             LATERAL unnest(range(1, len(l))) AS u(i)
        GROUP BY 1, 2
    ),
    b{i} AS (SELECT x, y, cnt FROM p{i} ORDER BY cnt DESC, x, y LIMIT 1)"""
    rewrite = f""",
    w{i} AS (
        SELECT n, replace(seq,
                          {sep} || b.x || {sep} || {sep} || b.y || {sep},
                          {sep} || b.x || b.y || {sep}) AS seq
        FROM w{i - 1}, b{i} b
    )"""
    return count_best + (rewrite if i < _BPE_MERGES else "")


@register(
    "pipeline_bpe_3merge",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS t FROM documents
    ),
    w0 AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               array_to_string(list_transform(string_split(t, ''),
                   c -> {_BPE_SEP_SQL} || c || {_BPE_SEP_SQL}), '') AS seq
        FROM tok GROUP BY t
    ),
    {",".join(_bpe_round_sql(i) for i in range(1, _BPE_MERGES + 1))}
    SELECT CAST(1 AS BIGINT) AS merge_rank, x AS left_sym, y AS right_sym,
           x || y AS merged, cnt AS n_occurrences FROM b1
    UNION ALL
    SELECT CAST(2 AS BIGINT), x, y, x || y, cnt FROM b2
    UNION ALL
    SELECT CAST(3 AS BIGINT), x, y, x || y, cnt FROM b3
    ORDER BY merge_rank
    """,
)
def pipeline_bpe_3merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An ITERATIVE BPE tokenizer trainer — three full merge rounds, not
    just `pipeline_bpe_first_merge`'s round-one statistic: each round
    counts overlapping adjacent symbol pairs across the corpus, elects
    the most frequent pair (ties (left, right)-lexicographic), and
    REWRITES every word with that merge before the next round — the
    r14-verdict-sanctioned extension mirroring `emb_kmeans_3iter`'s
    fully-lazy loop discipline (no driver collect between rounds; the
    oracle unrolls the identical three rounds as CTE triples).

    The trainer works on the DISTINCT-WORD FREQUENCY frame, the classic
    BPE formulation (Sennrich et al. 2016) and the scale-correct one: at
    100 TB the corpus has trillions of token occurrences but only
    millions of distinct words (Heaps' law), so pair counting and
    rewriting run over the collapsed (word, n) frame — ONE map-side-
    combinable shuffle ever touches corpus-sized data (the word count);
    every later round moves only |vocab|-row frames. Symbol sequences are
    strings with EVERY symbol wrapped in its own separator pair
    (``SEP sym SEP``, U+001F, absent from any corpus byte); a merge is a
    literal `replace` of ``SEP x SEP SEP y SEP`` with ``SEP xy SEP``.
    Because adjacent matches share no characters under the double-
    boundary encoding, leftmost-non-overlapping replace IS greedy BPE
    merge order ("aaaa" + (a,a) → [aa, aa], "aaa" → [aa, a] — the
    single-shared-separator encoding both engines would happily agree on
    gets "aaaa" WRONG; tests/test_bpe_boundary.py pins the greedy case
    against hand-computed merges), and the boundaries make a
    cross-symbol false match (pair (a,a) matching symbol [a][ab]'s
    prefix) impossible. The elected pair's count is the standard
    overlapping adjacent statistic (both engines agree exactly — pure
    integers).

    Plan shape: token explode → (word) hash-agg [the one corpus-scale
    shuffle] → per round: in-row pair explode (stays in the small frame's
    stage) → (x, y) hash-agg → 1-row TakeOrdered argmax, broadcast back
    into the word frame for the rewrite (BroadcastNestedLoopJoin over ONE
    row, never a corpus cartesian). The base word frame is CHECKPOINTED
    (`durable_checkpoint`, the md5-funnel discipline): the three output
    branches plus the two rewrite chains would otherwise each re-derive
    the corpus-scale tokenize+aggregate — the executed plan shows
    SEPARATE exchanges per branch, NOT a ReuseExchange (plan-asserted in
    tests/test_plans.py) — i.e. ~6 corpus scans at 100 TB; the
    checkpoint pins it to one. For many merges also checkpoint the
    REWRITTEN frame every ~10 rounds to cut lineage (the
    emb_kmeans_3iter note); at 3 rounds that part is cheap."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(F.explode(tokens("text")).alias("t"))
    sep = F.lit(_BPE_SEP)
    # The encoding's precondition — U+001F absent from the corpus — is
    # ENFORCED, not assumed (ADVICE r15 #3): a token containing the
    # separator would have that byte silently vanish from pair counting
    # in BOTH engines (parity would not catch it), so the guard raises
    # loudly instead. Checked once per DISTINCT word (post-agg), so the
    # cost is |vocab| codegen'd predicates, not one per occurrence; a
    # NULL token also lands in the raise arm (intended strictness).
    guarded_t = F.when(
        ~F.col("t").contains(_BPE_SEP), F.col("t")
    ).otherwise(
        F.raise_error(
            "pipeline_bpe_3merge: token contains U+001F — the symbol-"
            "separator byte must be absent from the corpus alphabet"
        )
    )
    words = durable_checkpoint(
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "n",
            F.regexp_replace(
                guarded_t, "(.)", _BPE_SEP + "$1" + _BPE_SEP
            ).alias("seq"),
        ),
        eager=False,
    )
    out = None
    for r in range(1, _BPE_MERGES + 1):
        syms = F.filter(
            F.split(F.col("seq"), _BPE_SEP), lambda s: s != F.lit("")
        )
        with_syms = words.select("n", syms.alias("l")).filter(
            F.size("l") >= 2
        )
        pairs = with_syms.select(
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("l") - 1),
                    lambda i: F.struct(
                        F.element_at("l", i).alias("x"),
                        F.element_at("l", i + 1).alias("y"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("n").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "x", "y")
            .limit(1)
        )
        row = best.select(
            F.lit(r).cast("bigint").alias("merge_rank"),
            F.col("x").alias("left_sym"),
            F.col("y").alias("right_sym"),
            F.concat("x", "y").alias("merged"),
            F.col("cnt").alias("n_occurrences"),
        )
        out = row if out is None else out.unionAll(row)
        if r < _BPE_MERGES:
            words = words.crossJoin(F.broadcast(best)).select(
                "n",
                F.replace(
                    F.col("seq"),
                    F.concat(sep, F.col("x"), sep, sep, F.col("y"), sep),
                    F.concat(sep, F.col("x"), F.col("y"), sep),
                ).alias("seq"),
            )
    return out.orderBy("merge_rank")


@register(
    "pipeline_interleave_sources",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY rk, source, doc_id) AS BIGINT)
               AS interleave_pos
    FROM ranked
    ORDER BY rk, source, doc_id
    LIMIT 200
    """,
)
def pipeline_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleave across sources — the global
    training order a multi-source data loader materializes so no source
    clusters at the start of an epoch (early-training batches otherwise
    overfit whichever domain sorts first): position k of each source
    precedes position k+1 of every source. First 200 positions of the
    plan (the driver-checkable prefix; the full manifest is the same
    frame unlimited).

    Determinism: both ranks are row_numbers with total-order tie-breaks
    ((source, doc_id)) — no randomness, so the interleave is
    reproducible across runs/engines/repartitioning (the same property
    `pipeline_train_test_split` buys with hash thresholds). Plan: one
    window per rank — the per-source rank partitions by source; the
    global position is a TakeOrdered prefix, never a full sort at
    output time."""
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("doc_id"))
        .alias("rk"),
    )
    return (
        ranked.select(
            "doc_id",
            "source",
            F.row_number()
            .over(Window.orderBy("rk", "source", "doc_id"))
            .cast("bigint")
            .alias("interleave_pos"),
        )
        .orderBy("interleave_pos")
        .limit(200)
        .select("doc_id", "source", "interleave_pos")
    )


# average-per-token logprob gates (micro-units): ln(1/31) ≈ -3.434, so the
# sweep brackets the fixture's unigram scores
_PPL_GATES_U = (-3350000, -3400000, -3450000, -3500000)


@register(
    "pipeline_perplexity_gate_ablation",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM freq),
    scored AS (
        SELECT tok.doc_id,
               CAST(count(*) AS BIGINT) AS n_tok,
               CAST(sum(CAST(floor(ln(freq.c * 1.0 / total.tot) * 1000000 + 0.5)
                             AS BIGINT)) AS BIGINT) AS su
        FROM tok JOIN freq ON tok.t = freq.t CROSS JOIN total
        GROUP BY tok.doc_id
    ),
    gates AS (SELECT unnest([{", ".join(str(g) for g in _PPL_GATES_U)}])
                  AS gate_u),
    corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_tok) AS BIGINT) AS all_tok
               FROM scored)
    SELECT round(g.gate_u / 1000000.0, 4) AS gate_avg_logprob,
           CAST(sum(CASE WHEN s.su >= g.gate_u * s.n_tok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep,
           round(sum(CASE WHEN s.su >= g.gate_u * s.n_tok THEN 1 ELSE 0 END)
                 * 1.0 / c.n_docs, 4) AS keep_rate,
           CAST(sum(CASE WHEN s.su >= g.gate_u * s.n_tok THEN s.n_tok
                         ELSE 0 END) AS BIGINT) AS kept_tokens,
           round(sum(CASE WHEN s.su >= g.gate_u * s.n_tok THEN s.n_tok
                          ELSE 0 END) * 1.0 / c.all_tok, 4) AS token_keep_rate
    FROM scored s CROSS JOIN gates g CROSS JOIN corpus c
    GROUP BY g.gate_u, c.n_docs, c.all_tok
    """,
)
def pipeline_perplexity_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter ablation: for four average-per-token logprob
    gates, how many documents (and tokens) survive scoring under the
    corpus's own unigram model — the model-based twin of
    `pipeline_length_filter_ablation`, answering "how aggressive can the
    perplexity filter be before the corpus shrinks too far" BEFORE
    committing a full filtering run.

    Exactness: per-TOKEN logprobs quantize to integer micro-units at the
    scoring row, so each doc's score is an order-free bigint sum, and
    every gate decision is the integer cross-multiplication
    su ≥ gate_u·n_tok — no float threshold can flip a doc between
    engines (a float per-doc average would drift with reduction order
    exactly at the gate boundary). Plan: ONE scoring pass (model
    broadcast onto the exploded tokens, groupBy doc), then a 4-gate
    conditional aggregate over the |docs| score frame — the sweep costs
    one extra tiny aggregate, not four corpus passes."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select("doc_id", F.explode(tokens("text")).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    total = freq.agg(F.sum("c").cast("bigint").alias("tot"))
    # checkpoint the per-doc score frame: both the corpus totals and the
    # gate aggregate consume it, and Spark does not share subtrees across
    # consumers — without this the corpus-scale scoring pass runs twice
    scored = durable_checkpoint(
        tok.join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum(
                F.floor(
                    F.log(F.col("c") * F.lit(1.0) / F.col("tot")) * 1000000
                    + F.lit(0.5)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("su"),
        ),
        eager=False,
    )
    corpus = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("all_tok"),
    )
    gates = spark.createDataFrame(
        [(g,) for g in _PPL_GATES_U], "gate_u long"
    )
    keep = F.col("su") >= F.col("gate_u") * F.col("n_tok")
    return (
        scored.crossJoin(F.broadcast(gates))
        .crossJoin(F.broadcast(corpus))
        .groupBy("gate_u", "n_docs", "all_tok")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_keep"),
            F.sum(F.when(keep, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .select(
            F.round(F.col("gate_u") / 1000000.0, 4).alias("gate_avg_logprob"),
            "n_keep",
            F.round(F.col("n_keep") * 1.0 / F.col("n_docs"), 4).alias("keep_rate"),
            "kept_tokens",
            F.round(F.col("kept_tokens") * 1.0 / F.col("all_tok"), 4).alias(
                "token_keep_rate"
            ),
        )
    )


# (col_name, numeric SQL expr or None, string SQL expr or None) — the
# logical profile spec shared by the Spark unpivot and the DuckDB oracle.
_PROFILE_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS DOUBLE)", None),
    ("o_custkey", "CAST(o_custkey AS DOUBLE)", None),
    ("o_orderstatus", None, "o_orderstatus"),
    ("o_totalprice", "CAST(o_totalprice AS DOUBLE)", None),
    ("o_orderdate", "CAST(epoch_ms(o_orderdate) AS DOUBLE)", None),
    ("o_orderpriority", None, "o_orderpriority"),
]


def _profile_oracle() -> str:
    parts = []
    for name, num, s in _PROFILE_COLS:
        val = num if num is not None else s
        parts.append(f"""
        SELECT '{name}' AS col_name,
               CAST(count(*) AS BIGINT)                    AS n_rows,
               CAST(count(*) - count({val}) AS BIGINT)     AS n_nulls,
               CAST(count(DISTINCT {val}) AS BIGINT)       AS n_distinct,
               {f'min({num})' if num is not None else 'CAST(NULL AS DOUBLE)'}
                   AS min_num,
               {f'max({num})' if num is not None else 'CAST(NULL AS DOUBLE)'}
                   AS max_num,
               {f'min({s})' if s is not None else 'CAST(NULL AS VARCHAR)'}
                   AS min_str,
               {f'max({s})' if s is not None else 'CAST(NULL AS VARCHAR)'}
                   AS max_str
        FROM orders""")
    return " UNION ALL ".join(parts)


@register("pipeline_profile_columns", oracle=_profile_oracle())
def pipeline_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling pass (the `expectation suite` precursor every
    ingestion pipeline runs before trusting a new drop): per column —
    row count, null count, EXACT distinct cardinality, and typed
    min/max — in one long-format frame, timestamps profiled on the
    epoch-ms axis so the output schema is column-independent.

    Shape: ONE scan unpivots the 6 profiled columns into (col_name,
    num_val, str_val) rows via `stack` — 6× narrow rows instead of 6
    passes or one 6-way multi-count_distinct (whose Expand would
    replicate the FULL row width 6×; the unpivot replicates only the
    single profiled value) — then a single groupBy(col_name) computes
    every statistic. Exact distincts are the point of this operator
    (dedup keys, join-key audits); at 100 TB swap count_distinct for
    approx_count_distinct per the `agg_approx_distinct` pattern and the
    same plan carries — the shuffle moves (col_name, value) pairs
    either way. Min/max on doubles are exact parquet values (no
    arithmetic), so cross-engine comparison is bitwise-safe."""
    o = load_table(spark, sf_dir, "orders")
    stack_args = []
    for name, num, s in _PROFILE_COLS:
        spark_num = (
            num.replace("epoch_ms(o_orderdate)",
                        "unix_millis(CAST(o_orderdate AS TIMESTAMP))")
            if num is not None
            else "CAST(NULL AS DOUBLE)"
        )
        spark_str = s if s is not None else "CAST(NULL AS STRING)"
        stack_args.append(f"'{name}', {spark_num}, {spark_str}")
    rows = o.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)}) "
            "AS (col_name, num_val, str_val)"
        )
    )
    # Two-phase distinct instead of countDistinct inside the main agg:
    # a multi-count_distinct would Expand-replicate the unpivoted frame
    # once per distinct (2x 6n rows); pre-shrinking through a partial-
    # aggregatable dropDuplicates keeps one pass over 6n and one over the
    # already-distinct values (bench: 4.7 -> ~2s at sf0.1).
    base = rows.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("num_val").isNull() & F.col("str_val").isNull(), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_nulls"),
        F.min("num_val").alias("min_num"),
        F.max("num_val").alias("max_num"),
        F.min("str_val").alias("min_str"),
        F.max("str_val").alias("max_str"),
    )
    dist = (
        rows.filter(F.col("num_val").isNotNull() | F.col("str_val").isNotNull())
        .dropDuplicates(["col_name", "num_val", "str_val"])
        .groupBy("col_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
    )
    # Left join + coalesce (ADVICE r10): an entirely-NULL profiled column
    # has no row in `dist` — it must still profile (n_distinct=0), not
    # vanish; surfacing that case is what a profiler is for.
    return base.join(dist, "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_nulls",
        F.coalesce(F.col("n_distinct"), F.lit(0).cast("bigint")).alias(
            "n_distinct"
        ),
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


_DSIR_B = 64  # hashed feature buckets (DSIR uses 10k at web scale)
_DSIR_TARGET = "src0"  # deterministic target domain: first source id
# hex char -> 0..15 via instr; two chars give 0..255, % B keeps char 1's
# low 2 bits + all of char 2 — uniform because md5 hex chars are uniform.
# instr/substring/md5 are bit-identical across Spark and DuckDB; the
# ascii()%k house trick (pipeline_domain_mix) caps at 16 buckets, this
# form reaches any power-of-two B <= 256.
_DSIR_BUCKET = (
    "((instr('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substring(md5(t), 2, 1)) - 1)"
    f" % {_DSIR_B}"
)


_DSIR_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    tb AS (SELECT doc_id, source, CAST({_DSIR_BUCKET} AS BIGINT) AS b
           FROM tok),
    db AS (SELECT doc_id, source, b, CAST(count(*) AS BIGINT) AS n
           FROM tb GROUP BY 1, 2, 3),
    raw AS (SELECT b, CAST(sum(n) AS BIGINT) AS cr FROM db GROUP BY 1),
    tgt AS (SELECT b, CAST(sum(n) AS BIGINT) AS ct FROM db
            WHERE source = '{_DSIR_TARGET}' GROUP BY 1),
    model AS (
        SELECT raw.b, COALESCE(tgt.ct, 0) AS ct, raw.cr
        FROM raw LEFT JOIN tgt ON raw.b = tgt.b
    ),
    tots AS (
        SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
        FROM model
    )
    SELECT db.doc_id, db.source,
           CAST(sum(db.n) AS BIGINT) AS n_tokens,
           round(sum(db.n * ln(((m.ct + 1) * 1.0 * (t.tr + {_DSIR_B}))
                               / ((t.tt + {_DSIR_B}) * 1.0 * (m.cr + 1)))),
                 4) + 0.0 AS dsir_logw
    FROM db JOIN model m ON db.b = m.b CROSS JOIN tots t
    GROUP BY 1, 2
    """


def dsir_scores_from_bucket_counts(db: DataFrame) -> DataFrame:
    """The DSIR read-time computation from its sufficient statistic — the
    (doc_id, source, b, n) bucket-count frame: build the Laplace-smoothed
    target/raw models as B-row rollups OF that frame, broadcast them back,
    and emit per-doc scores. Shared VERBATIM by `pipeline_dsir_importance`
    (batch) and `stream_dsir_model_update` (incremental) — the same
    reuse-the-batch-computation factoring as `ks_drift_from_counts`, and
    for the same reason: the models are corpus-wide, so any per-batch
    score would compare against provisional totals; the stream maintains
    the count frame exactly and THIS recomputation is cheap (model = B
    rows; the score join is the same one the batch op pays)."""
    raw = db.groupBy("b").agg(F.sum("n").alias("cr"))
    tgt = (
        db.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("n").alias("ct"))
    )
    model = raw.join(tgt, "b", "left").select(
        "b", F.coalesce("ct", F.lit(0)).alias("ct"), "cr"
    )
    tots = model.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    lw = F.log(
        ((F.col("ct") + 1) * F.lit(1.0) * (F.col("tr") + _DSIR_B))
        / ((F.col("tt") + _DSIR_B) * F.lit(1.0) * (F.col("cr") + 1))
    )
    return (
        db.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(tots))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            # trailing + 0.0: a doc's weight can round to zero from below,
            # and the engines disagree on the SIGN of that zero
            # (FIXTURES.md signed-zero convention)
            (F.round(F.sum(F.col("n") * lw), 4) + F.lit(0.0)).alias(
                "dsir_logw"
            ),
        )
    )


@register("pipeline_dsir_importance", oracle=_DSIR_ORACLE)
def pipeline_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by how target-like its hashed-n-gram feature distribution is —
    log w(d) = Σ_features n_f(d) · ln(p_target(f) / p_raw(f)) — the
    standing method for up-sampling a raw crawl toward a trusted domain
    before pretraining. Features are unigrams hashed into B=64 buckets
    (md5-derived, engine-identical); the target model is the
    'src0' source, the raw model the whole corpus; both
    Laplace-smoothed ((c+1)/(T+B)) so empty buckets stay finite.
    Downstream selection samples ∝ exp(log w) or takes a top quantile;
    the score itself is the operator.

    Exactness: bucket ids and all counts are integers; each bucket's log
    ratio is ONE ln over an identically-associated double expression
    ((ct+1)·1.0·(tr+B)) / ((tt+B)·1.0·(cr+1)) — both engines build the
    same doubles and ln agrees to ~1 ulp (the text_unigram_logprob
    precedent), absorbed by round(4) on the per-doc sum.

    Plan shape (the part that survives 100 TB): tokens hash to buckets
    INSIDE the scan stage (md5 + instr, no UDF), collapse map-side to
    (doc_id, bucket, n) — at most B=64 rows per document regardless of
    length, so the one real exchange carries O(docs·B) ints, never raw
    tokens; the raw/target models are B-row rollups OF that frame (no
    second pass over the corpus), broadcast back with the 1-row totals;
    the final reduce keys on doc_id. Raising B to DSIR's web-scale 10k
    changes only the broadcast size (~10k rows)."""
    d = load_table(spark, sf_dir, "documents")
    tb = (
        spread(d, "doc_id")
        .select("doc_id", "source", F.explode(tokens("text")).alias("t"))
        .select(
            "doc_id",
            "source",
            F.expr(_DSIR_BUCKET).cast("bigint").alias("b"),
        )
    )
    # r16 opt (guide §2.4/§5): the bucket-count frame feeds THREE
    # consumers inside dsir_scores_from_bucket_counts (raw model, target
    # model, score join) and exchange reuse does not fire across them
    # (different partial aggregates below each exchange → divergent
    # canonical subtrees; plan audit: 10 Generate, 0 ReusedExchange).
    # Lazy-checkpoint the O(docs·B)-int frame so the corpus is tokenized
    # and md5-bucketed ONCE per action. The stream twin passes its own
    # snapshot-backed frame and is untouched.
    db = durable_checkpoint(
        tb.groupBy("doc_id", "source", "b").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ),
        eager=False,
    )
    return dsir_scores_from_bucket_counts(db)
