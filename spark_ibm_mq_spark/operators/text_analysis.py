"""Text analysis operators (north-star EXT): quality stats, language-ID,
token counting, fingerprinting — the cheap per-document passes of an LLM
data pipeline, all as JVM-side expressions (no Python in the row path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.functions.text import (
    BPE_ISH_PATTERN,
    STOPWORDS_EN,
    bpe_ish_tokens,
    quality_score,
    tokens,
)
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import (
    durable_checkpoint,
    load_table,
    size_gated_broadcast,
    spread,
)

_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS_EN) + "]"


@register(
    "text_quality_stats",
    oracle=f"""
    SELECT doc_id, lang,
           len(string_split_regex(trim(text), '\\s+'))            AS n_tokens,
           length(text)                                            AS n_chars_measured,
           round(length(text) * 1.0 /
                 greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4) AS avg_word_len,
           round(len(list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> list_contains({_STOP_SQL}, lower(t)))) * 1.0 /
                 greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4) AS stop_ratio,
           CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 5000
                THEN 1.0 ELSE 0.0 END AS len_ok
    FROM documents
    """,
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality ratios: token count, char count, mean word length,
    stopword density, length gate — single narrow scan, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    stop = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return d.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.round(F.length("text") / F.greatest(n, F.lit(1)), 4).alias("avg_word_len"),
        F.round(n_stop / F.greatest(n, F.lit(1)), 4).alias("stop_ratio"),
        F.when(n.between(10, 5000), 1.0).otherwise(0.0).alias("len_ok"),
    )


# per-language function-word lists for the n-gram/stopword lang-ID heuristic
_LANG_WORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
}


def _lang_score_sql(lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in _LANG_WORDS[lang]) + "]"
    return (
        f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"t -> list_contains({lst}, t)))"
    )


@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           CASE
             WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
             WHEN {_lang_score_sql("es")} > {_lang_score_sql("en")}
              AND {_lang_score_sql("es")} >= {_lang_score_sql("de")}
              AND {_lang_score_sql("es")} >= {_lang_score_sql("fr")} THEN 'es'
             WHEN {_lang_score_sql("de")} > {_lang_score_sql("en")}
              AND {_lang_score_sql("de")} >= {_lang_score_sql("fr")} THEN 'de'
             WHEN {_lang_score_sql("fr")} > {_lang_score_sql("en")} THEN 'fr'
             ELSE 'en'
           END AS predicted,
           (CASE
             WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
             WHEN {_lang_score_sql("es")} > {_lang_score_sql("en")}
              AND {_lang_score_sql("es")} >= {_lang_score_sql("de")}
              AND {_lang_score_sql("es")} >= {_lang_score_sql("fr")} THEN 'es'
             WHEN {_lang_score_sql("de")} > {_lang_score_sql("en")}
              AND {_lang_score_sql("de")} >= {_lang_score_sql("fr")} THEN 'de'
             WHEN {_lang_score_sql("fr")} > {_lang_score_sql("en")} THEN 'fr'
             ELSE 'en'
           END) = lang AS is_match
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: CJK codepoint detection + per-language
    function-word hit counts with a deterministic priority order. A
    classifier-free pass good enough for pipeline routing; scores are
    expression-only so the scan stays codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    low_toks = F.split(F.trim(F.lower("text")), "\\s+")

    def score(lang: str):
        lst = F.array(*[F.lit(w) for w in _LANG_WORDS[lang]])
        return F.size(F.filter(low_toks, lambda t: F.array_contains(lst, t)))

    s_en, s_es, s_de, s_fr = score("en"), score("es"), score("de"), score("fr")
    has_cjk = F.col("text").rlike("[\\u4e00-\\u9fff]")
    predicted = (
        F.when(has_cjk, "zh")
        .when((s_es > s_en) & (s_es >= s_de) & (s_es >= s_fr), "es")
        .when((s_de > s_en) & (s_de >= s_fr), "de")
        .when(s_fr > s_en, "fr")
        .otherwise("en")
    )
    return d.select(
        "doc_id",
        "lang",
        predicted.alias("predicted"),
        (predicted == F.col("lang")).alias("is_match"),
    )


@register(
    "text_token_counts",
    oracle=f"""
    SELECT source,
           count(*)                                                    AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)        AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS BIGINT) AS bpe_ish_tokens,
           CAST(sum(length(text)) AS BIGINT)                                       AS total_chars
    FROM documents
    GROUP BY source
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source: whitespace tokens + a BPE-ish
    regex lexer (word pieces / numbers / symbols) — the budget numbers every
    training-data pipeline reports. One scan, one tiny shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("ws_tokens"),
        F.sum(F.size(bpe_ish_tokens("text"))).alias("bpe_ish_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS t,
               generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
        FROM documents
    ),
    bigrams AS (
        SELECT doc_id,
               md5(t || '|' || lead(t) OVER (PARTITION BY doc_id ORDER BY pos)) AS bh
        FROM toks
    )
    SELECT b.doc_id,
           min(bh)                   AS min_bigram_hash,
           d.bag_fingerprint         AS bag_fingerprint
    FROM bigrams b
    JOIN (SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(
                      string_split_regex(trim(text), '\\s+'))), ' ')) AS bag_fingerprint
          FROM documents) d ON b.doc_id = d.doc_id
    WHERE bh IS NOT NULL
    GROUP BY b.doc_id, d.bag_fingerprint
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: (a) winnowing-lite — min MD5 over adjacent
    token bigrams (a 1-hash rolling-window sketch), (b) order-insensitive
    bag fingerprint over the sorted distinct token set. Both content-defined:
    stable under re-chunking, usable as shuffle-narrow dedup keys.

    Bigrams pair the token array with itself shifted by one (`zip_with`
    over two slices) — entirely per-row, so the whole fingerprint is one
    scan with zero shuffles; the old explode→window(lead)→groupBy shape
    shuffled every token of the corpus. Docs with <2 tokens have no bigram
    and are excluded (matches the oracle's `bh IS NOT NULL`)."""
    d = load_table(spark, sf_dir, "documents")
    docs = spread(d.select("doc_id", tokens("text").alias("toks")), "doc_id")
    n = F.size("toks")
    bigram_min = F.array_min(
        F.zip_with(
            F.slice("toks", 1, n - 1),
            F.slice("toks", 2, n - 1),
            lambda a, b: F.md5(F.concat(a, F.lit("|"), b)),
        )
    )
    bag = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("toks"))))
    return (
        docs.select(
            "doc_id",
            bigram_min.alias("min_bigram_hash"),
            bag.alias("bag_fingerprint"),
        )
        .filter(F.col("min_bigram_hash").isNotNull())
    )


@register(
    "text_ngram_profile",
    oracle="""
    WITH chars AS (
        SELECT lang,
               substr(lower(trim(text)), i.i, 3) AS tri
        FROM documents,
             LATERAL (SELECT unnest(range(1, length(trim(text)) - 1)) AS i) i
        WHERE length(trim(text)) >= 3),
    counts AS (
        SELECT lang, tri, count(*) AS n
        FROM chars
        WHERE tri NOT LIKE '% %'
        GROUP BY lang, tri),
    ranked AS (
        SELECT lang, tri, n,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, tri) AS rk
        FROM counts)
    SELECT lang, tri, n, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def text_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-trigram profile (top-5 by frequency): the
    feature table a statistical language-ID model trains on (Cavnar-Trenkle
    n-gram ranking). Trigrams that span a space are dropped so the profile
    captures intra-word shape.

    Scale shape: trigram generation is a per-row expression (sequence →
    transform → explode) — the explode multiplies rows ~length× but stays
    inside the scan stage with no shuffle; the (lang, tri) count is one
    map-side-combinable aggregate (the combine collapses the blow-up to
    |langs|×|alphabet|³ partials before the exchange), and the top-5 window
    runs on the already-tiny counts frame repartitioned by lang. Determinism:
    counts are exact ints, ties broken lexicographically."""
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.trim("text"))
    docs = d.select("lang", low.alias("lo")).filter(F.length("lo") >= 3)
    exploded = spread(docs, "lang").select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("lo") - 2),
                lambda i: F.col("lo").substr(i, F.lit(3)),
            )
        ).alias("tri"),
    ).filter(~F.col("tri").contains(" "))
    counts = exploded.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "tri")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "tri", "n", F.col("rk").cast("int").alias("rk"))
    )


@register(
    "text_repetition_filter",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ),
    stats AS (
        SELECT doc_id, lang,
               len(t) AS n_tokens,
               round(1.0 - len(list_distinct(t)) * 1.0 / greatest(len(t), 1), 4)
                   AS dup_ratio,
               round(list_max(list_transform(list_distinct(t),
                     u -> len(list_filter(t, x -> x = u)))) * 1.0
                     / greatest(len(t), 1), 4) AS top_share
        FROM toks
    )
    SELECT doc_id, lang, n_tokens, dup_ratio, top_share,
           CASE WHEN dup_ratio <= 0.55 AND top_share <= 0.12 THEN 1 ELSE 0 END
               AS keep
    FROM stats
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition gate (the Gopher-style boilerplate
    filter a pretraining pipeline runs alongside the length/stopword gate):
    duplicate-token ratio (1 − distinct/total) and top-token share (most
    frequent token's fraction), thresholded on the ROUNDED values so the
    keep flag can't flip on a sub-ulp cross-engine difference.

    Scale shape: pure per-row expressions over one narrow scan — the
    token multiset never leaves the row, no explode, no shuffle, whole
    result streams out of the scan stage. The per-doc O(distinct·total)
    token-count loop is a codegen'd higher-order function, not Python;
    document length bounds it (docs are KB-scale), not corpus size."""
    # r16 opt (guide §2.6): spread the 1-partition fixture scan so the
    # O(distinct·total) per-row token-count loop runs
    # defaultParallelism-wide instead of serially in the scan stage
    # (no-op on a real multi-split table; "no shuffle" above refers to the
    # token multiset, which still never leaves its row).
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = tokens("text")
    n = F.size(toks)
    n_dist = F.size(F.array_distinct(toks))
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda u: F.size(F.filter(toks, lambda x: x == u)),
        )
    )
    dup_ratio = F.round(F.lit(1.0) - n_dist / F.greatest(n, F.lit(1)), 4)
    top_share = F.round(top / F.greatest(n, F.lit(1)), 4)
    return d.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        dup_ratio.alias("dup_ratio"),
        top_share.alias("top_share"),
        F.when((dup_ratio <= 0.55) & (top_share <= 0.12), 1)
        .otherwise(0)
        .alias("keep"),
    )


@register(
    "text_vocab_build",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    counts AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY t)
    SELECT t AS token, n,
           CAST(row_number() OVER (ORDER BY n DESC, t) AS INTEGER) AS vocab_id
    FROM counts
    ORDER BY vocab_id
    LIMIT 64
    """,
)
def text_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide vocabulary build: token frequencies ranked into stable
    vocab ids (count desc, token asc tie-break), truncated to the head of
    the distribution — the precursor pass of tokenizer training and the
    tool for spotting corpus-dominating boilerplate tokens. All-integer,
    so the oracle is exact with zero float care.

    Scale shape: explode stays inside the scan stage; the (token, count)
    aggregate is map-side-combinable, collapsing the token blow-up to
    |vocab| partials before the one exchange; the global rank then runs on
    the tiny counts frame (|vocab| rows, not corpus rows) and the LIMIT
    cuts it to a constant. At 100 TB this is the canonical word-count —
    the only thing that ever shuffles is the distinct-token partials."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        F.explode(tokens("text")).alias("t")
    )
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    # top-64 via TakeOrderedAndProject FIRST (scales: per-partition heads +
    # tiny merge, no global sort), then rank the 64 survivors — the global
    # single-partition window only ever sees a constant-size frame
    top = counts.orderBy(F.col("n").desc(), "t").limit(64)
    w = Window.orderBy(F.col("n").desc(), "t")
    return (
        top.withColumn("vocab_id", F.row_number().over(w).cast("int"))
        .select(F.col("t").alias("token"), "n", "vocab_id")
        .orderBy("vocab_id")
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    tf AS (
        SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, t
    ),
    df AS (
        SELECT t, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY t
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.t, tf.tf, df.df,
               round(tf.tf * n.n_docs / df.df, 4) AS score
        FROM tf JOIN df ON tf.t = df.t CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, t, tf, df, score,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY CAST(tf AS DOUBLE) / df DESC, t) AS rk
        FROM scored
    )
    SELECT doc_id, t AS top_term, tf, df, score
    FROM ranked WHERE rk = 1
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-distinctive term per document by tf·idf — the per-doc keyword
    signal quality/topic pipelines use. Determinism note: the idf factor is
    the LINEAR surrogate n_docs/df rather than ln(n_docs/df) — +, ×, / are
    IEEE exactly-rounded (bit-identical in Spark and DuckDB) while ln is
    not reproducibility-guaranteed across engines, and since ln is monotone
    the per-doc argmax is IDENTICAL under either idf; swapping ln back in
    is a one-expression change where exactness isn't contractual. The rank
    key tf/df is one exact-rounded division; ties break on the term.

    Scale shape: two map-side-combinable aggregates off one explode — (doc,
    term) tf and term df — joined on the term key (shuffle carries counts,
    never text bodies); n_docs is a scalar broadcast. The per-doc argmax is
    a window over the tf frame, partitioned on doc_id — the same exchange
    the tf aggregate already produced, so AQE reuses the partitioning."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("t")
    )
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("t").agg(F.countDistinct("doc_id").alias("df"))
    # scalar n_docs as a broadcast 1-row frame, not an eager .count() action
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = tf.join(df, "t").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "t",
        "tf",
        "df",
        F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 4).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), "t"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("t").alias("top_term"), "tf", "df", "score")
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, substr(text, i.i, 1) AS ch, length(text) AS n
        FROM documents, LATERAL unnest(range(1, length(text) + 1)) AS i(i)
    ),
    freq AS (SELECT doc_id, ch, n, count(*) AS c FROM chars GROUP BY 1, 2, 3)
    SELECT doc_id,
           n                                            AS n_chars,
           count(*)                                     AS n_distinct_chars,
           round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 4) AS char_entropy
    FROM freq GROUP BY doc_id, n
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap gibberish /
    encoding-damage / low-diversity detector every corpus quality gate
    runs (very low entropy → repeated filler; very high → binary spill or
    wrong charset).

    Plan shape: entirely per-row higher-order expressions — the char
    histogram is computed INSIDE the row via array ops (distinct chars ×
    occurrence counts over the split array), so the operator needs no
    shuffle at any corpus size and stays in the scan stage. The oracle
    states the same value set-based (explode → group) — same math,
    different plan, which is the point: Spark never pays the |text|-row
    explode. The O(|alphabet|·|text|) per-row cost is CPU-heavy, so the
    single-row-group fixture scan is spread() across cores first (a real
    multi-split table already is). Entropy in nats, rounded to 4 (both
    engines sum doubles in different orders)."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    chars = F.split(F.col("text"), "")
    n = F.length("text")
    uniq = F.array_distinct(chars)
    cnt = lambda u: F.size(F.filter(chars, lambda x: x == u))  # noqa: E731
    p = lambda u: cnt(u).cast("double") / n  # noqa: E731
    entropy = -F.aggregate(
        uniq, F.lit(0.0), lambda acc, u: acc + p(u) * F.log(p(u))
    )
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_chars"),
        F.size(uniq).cast("bigint").alias("n_distinct_chars"),
        F.round(entropy, 4).alias("char_entropy"),
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM freq)
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ln(freq.c * 1.0 / total.tot)) / count(*), 4)
               AS avg_logprob
    FROM tok JOIN freq ON tok.t = freq.t CROSS JOIN total
    GROUP BY tok.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    unigram model — the cheapest model-based quality score (a crude
    perplexity): documents of improbable tokens score low, boilerplate of
    common tokens scores high. This is the two-pass shape of every
    model-scored filter: PASS 1 aggregates the model (term → count),
    PASS 2 broadcasts it back over the corpus and scores each document.

    ln follows the `affinity_copurchase_pmi`/`text_char_entropy`
    precedent: engines' ln agree to ~1 ulp, the per-doc mean averages the
    drift down, and round(4) absorbs it.

    Plan shape: the model aggregate is map-side-combinable on the term
    key (|vocab| rows out); the scoring join BROADCASTS the vocab —
    tokenizer-scale vocabularies (≤a few 100k terms) fit every executor —
    so scoring is shuffle-free over the exploded tokens, and the per-doc
    mean reduces on doc_id, the explode's natural key. At open-vocab
    100 TB scale, hash the long tail into an OOV bucket to keep the
    model frame bounded."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("t")
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("tot"))
    return (
        tok.join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.log(F.col("c") * F.lit(1.0) / F.col("tot")))
                / F.count(F.lit(1)),
                4,
            ).alias("avg_logprob"),
        )
    )


@register(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    bg AS (
        SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
        FROM toks, LATERAL unnest(range(1, greatest(len(t), 1))) AS u(i)
    ),
    c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1)
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(ln(c2.c2 * 1.0 / c1.c1)) / count(*), 4) AS avg_bigram_logprob
    FROM bg
    JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
    JOIN c1 ON bg.w1 = c1.w1
    GROUP BY bg.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram conditional log-probability ln P(w2|w1) =
    ln(c(w1,w2)/c(w1)) under the corpus's own bigram model — one order up
    from `text_unigram_logprob`: unigram scoring flags rare WORDS, bigram
    scoring flags improbable TRANSITIONS (shuffled or templated text
    scores low even when every individual word is common). Docs with a
    single token have no bigrams and drop out.

    Same two-pass model shape: PASS 1 aggregates transition counts, PASS
    2 broadcasts both count frames back over the exploded bigrams (|V|²
    and |V| rows — broadcastable for tokenizer-scale vocabularies; at
    open vocab, hash-bucket the tail) and reduces per doc. ln follows the
    `text_char_entropy` round-4 precedent.

    Plan: the bigram explode is `transform` over the split array with the
    index lambda — zero-shuffle, in codegen — and both model joins are
    broadcasts, so the only shuffles are the two model aggregates and the
    per-doc rollup on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        spread(d, "doc_id")
        .select("doc_id", tokens("text").alias("t"))
        .filter(F.size("t") >= 2)  # sequence(1, 0) would run DESCENDING
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return (
        bg.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.log(F.col("c2") * F.lit(1.0) / F.col("c1")))
                / F.count(F.lit(1)),
                4,
            ).alias("avg_bigram_logprob"),
        )
    )


_PRED_SQL = f"""CASE
             WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
             WHEN {_lang_score_sql("es")} > {_lang_score_sql("en")}
              AND {_lang_score_sql("es")} >= {_lang_score_sql("de")}
              AND {_lang_score_sql("es")} >= {_lang_score_sql("fr")} THEN 'es'
             WHEN {_lang_score_sql("de")} > {_lang_score_sql("en")}
              AND {_lang_score_sql("de")} >= {_lang_score_sql("fr")} THEN 'de'
             WHEN {_lang_score_sql("fr")} > {_lang_score_sql("en")} THEN 'fr'
             ELSE 'en'
           END"""


@register(
    "text_lang_confusion",
    oracle=f"""
    WITH pred AS (
        SELECT lang, {_PRED_SQL} AS predicted FROM documents
    ),
    truth AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_true
              FROM pred GROUP BY 1)
    SELECT p.lang, p.predicted, CAST(count(*) AS BIGINT) AS n,
           t.n_true,
           round(count(*) * 1.0 / t.n_true, 4) AS share_of_true
    FROM pred p JOIN truth t ON p.lang = t.lang
    GROUP BY p.lang, p.predicted, t.n_true
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the `text_lang_id` heuristic against the
    labeled lang column: per (true, predicted) cell count and its share
    of the true class (the diagonal's share IS per-class recall) — the
    eval rollup that decides whether a cheap router is good enough
    before it gates a corpus, same harness pattern as
    `sim_ann_recall_eval` for the ANN funnel.

    Plan shape: prediction is the same codegen'd CASE expression as the
    per-doc operator (no Python, no shuffle), so the matrix is one
    map-side-combinable groupBy to |langs|² cells plus a broadcast-sized
    class-total join."""
    d = load_table(spark, sf_dir, "documents")
    low_toks = F.split(F.trim(F.lower("text")), "\\s+")

    def score(lang: str):
        lst = F.array(*[F.lit(w) for w in _LANG_WORDS[lang]])
        return F.size(F.filter(low_toks, lambda t: F.array_contains(lst, t)))

    s_en, s_es, s_de, s_fr = score("en"), score("es"), score("de"), score("fr")
    predicted = (
        F.when(F.col("text").rlike("[\\u4e00-\\u9fff]"), "zh")
        .when((s_es > s_en) & (s_es >= s_de) & (s_es >= s_fr), "es")
        .when((s_de > s_en) & (s_de >= s_fr), "de")
        .when(s_fr > s_en, "fr")
        .otherwise("en")
    )
    pred = d.select("lang", predicted.alias("predicted"))
    truth = pred.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    return (
        pred.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(truth), "lang")
        .select(
            "lang",
            "predicted",
            "n",
            "n_true",
            F.round(F.col("n") * F.lit(1.0) / F.col("n_true"), 4).alias(
                "share_of_true"
            ),
        )
    )


@register(
    "text_hapax_ratio",
    oracle="""
    WITH tok AS (
        SELECT source, doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    freq AS (
        SELECT source, t, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
               AS hapax_ratio
    FROM freq GROUP BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena profile per source: vocabulary size, tokens that
    occur exactly once, and their share of the vocabulary — the
    lexical-freshness statistic corpus linguists (and tokenizer builders)
    read first: a natural-text source runs ~40–60% hapax; near-zero
    means templated/boilerplate text, near-one means OCR noise or
    junk — either way a routing signal BEFORE expensive dedup.

    Plan shape: one explode → one (source, token) count with map-side
    combine → a |sources|×|vocab| frame reduced to |sources| rows; all
    integer arithmetic except the final rounded ratio. At open-vocab
    scale the per-source frame is the same vocabulary aggregate the LM
    scoring passes already build — share it."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        "source", F.explode(tokens("text")).alias("t")
    )
    freq = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return freq.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        hapax.alias("n_hapax"),
        F.sum("c").alias("n_tokens"),
        F.round(hapax * F.lit(1.0) / F.count(F.lit(1)), 4).alias("hapax_ratio"),
    )


@register(
    "text_term_burstiness",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    tf AS (
        SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    stats AS (
        SELECT t,
               CAST(sum(c) AS BIGINT) AS total,
               CAST(sum(c * c) AS BIGINT) AS total_sq,
               CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY t
    )
    SELECT t AS term, total, df,
           round(total * 1.0 / nd.n_docs, 4) AS mean_per_doc,
           round((total_sq * 1.0 / nd.n_docs
                  - (total * 1.0 / nd.n_docs) * (total * 1.0 / nd.n_docs))
                 / (total * 1.0 / nd.n_docs), 4) AS dispersion
    FROM stats CROSS JOIN nd
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness via the dispersion index (variance-to-mean ratio of
    per-document counts, zeros included): ≈1 means Poisson-scattered
    function words, ≫1 means the term CLUMPS into few documents — the
    content-word signal keyword extractors weight and the duplicated-
    boilerplate signal cleaning pipelines flag (a boilerplate phrase is
    maximally bursty). Population moments come from integer sums over the
    sparse (doc, term) frame — E[x] = total/N, E[x²] = Σc²/N — so
    absent-document zeros cost nothing.

    Determinism: total, Σc², df, and N are 64-bit integers; the
    mean/variance/dispersion expression is one identical tree of
    exactly-rounded doubles both engines, rounded once at the end.

    Plan shape: one explode → one map-side-combined (doc, term) count →
    one |vocab|-row moment aggregate; the doc-count scalar broadcasts.
    Same single-shuffle posture as the LM-scoring passes."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select("doc_id", F.explode(tokens("text")).alias("t"))
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = tf.groupBy("t").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("total_sq"),
        F.count(F.lit(1)).alias("df"),
    )
    mean = F.col("total") * F.lit(1.0) / F.col("n_docs")
    disp = (F.col("total_sq") * F.lit(1.0) / F.col("n_docs") - mean * mean) / mean
    return (
        stats.crossJoin(F.broadcast(nd))
        .select(
            F.col("t").alias("term"),
            "total",
            "df",
            F.round(mean, 4).alias("mean_per_doc"),
            F.round(disp, 4).alias("dispersion"),
        )
    )


@register(
    "text_lang_trigram_similarity",
    oracle="""
    WITH lo AS (
        SELECT lang, lower(trim(text)) AS lo FROM documents
        WHERE length(trim(text)) >= 3
    ),
    tri AS (
        SELECT lang, substr(lo, CAST(u.i AS INTEGER), 3) AS tri
        FROM lo, LATERAL unnest(range(1, length(lo) - 1)) AS u(i)
    ),
    counts AS (
        SELECT lang, tri, CAST(count(*) AS BIGINT) AS c
        FROM tri WHERE NOT contains(tri, ' ') GROUP BY 1, 2
    ),
    nrm AS (SELECT lang, CAST(sum(c * c) AS BIGINT) AS n2 FROM counts GROUP BY 1),
    dots AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               CAST(count(*) AS BIGINT) AS n_shared_trigrams,
               CAST(sum(a.c * b.c) AS BIGINT) AS dot
        FROM counts a JOIN counts b ON a.tri = b.tri AND a.lang < b.lang
        GROUP BY 1, 2
    )
    SELECT d.lang_a, d.lang_b, d.n_shared_trigrams, d.dot,
           round(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS cosine
    FROM dots d
    JOIN nrm na ON d.lang_a = na.lang
    JOIN nrm nb ON d.lang_b = nb.lang
    """,
)
def text_lang_trigram_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-language character-trigram
    profiles — the Cavnar–Trenkle feature space of `text_ngram_profile`
    turned into a language DISTANCE matrix: near-1 pairs indicate langs a
    trigram language-ID model will confuse (directly explaining the
    off-diagonal mass in `text_lang_confusion`) or a mislabeled-corpus
    problem; orthographically distinct languages sit near 0.

    Exactness: trigram counts are exact ints, the dot product and both
    norms are bigint sums (order-free), cosine = dot/(√n²·√n²) is IEEE
    sqrt/mul/div — bit-identical, no rounding escape hatch. Plan shape:
    trigram explode stays in the scan stage, ONE (lang, tri) map-side
    combinable aggregate collapses the blow-up, and the pair join runs
    on the |langs|·|alphabet|³-bounded counts frame — pair volume is
    Σ_tri (langs sharing it)², bounded by |langs|² per trigram, never
    corpus-sized."""
    d = load_table(spark, sf_dir, "documents")
    lo = F.lower(F.trim("text"))
    docs = d.select("lang", lo.alias("lo")).filter(F.length("lo") >= 3)
    # r16 opt (guide §2.4/§5): the (lang, tri, c) profile frame feeds
    # three consumers (nrm and both pair-join sides) and exchange reuse
    # does not fire across them (plan audit: 8 Generate + 8 corpus
    # scans, 0 ReusedExchange — each consumer's partial agg specializes
    # its exchange subtree). Lazy-checkpoint the |langs|·|trigrams|-
    # bounded frame so the corpus-wide trigram explode runs ONCE per
    # action.
    counts = durable_checkpoint(
        spread(docs, "lang")
        .select(
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("lo") - 2),
                    lambda i: F.col("lo").substr(i, F.lit(3)),
                )
            ).alias("tri"),
        )
        .filter(~F.col("tri").contains(" "))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c")),
        eager=False,
    )
    nrm = counts.groupBy("lang").agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("n2"))
    a = counts.select(F.col("lang").alias("lang_a"), "tri", F.col("c").alias("ca"))
    b = counts.select(F.col("lang").alias("lang_b"), "tri", F.col("c").alias("cb"))
    dots = (
        a.join(b, "tri")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_trigrams"),
            F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"),
        )
    )
    na = nrm.select(F.col("lang").alias("lang_a"), F.col("n2").alias("n2a"))
    nb = nrm.select(F.col("lang").alias("lang_b"), F.col("n2").alias("n2b"))
    return (
        dots.join(F.broadcast(na), "lang_a")
        .join(F.broadcast(nb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_shared_trigrams",
            "dot",
            F.round(
                F.col("dot") / (F.sqrt(F.col("n2a")) * F.sqrt(F.col("n2b"))), 4
            ).alias("cosine"),
        )
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY t),
    ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, t) AS r FROM freq
    ),
    xy AS (SELECT ln(r) AS x, ln(f) AS y FROM ranked),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM xy
    )
    SELECT n AS n_types,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
           round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 4) AS intercept,
           round(((n * sxy - sx * sy) / (n * sxx - sx * sx))
                 * ((n * sxy - sx * sy) / (n * syy - sy * sy)), 4) AS r_squared
    FROM m
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus rank–frequency curve: OLS of ln(freq)
    against ln(rank) — natural text sits near slope −1; a flat slope
    exposes templated/synthetic text and a cliff exposes a truncated
    vocabulary. One of the cheapest corpus-health numbers a pipeline can
    compute, and the quantitative companion to `text_hapax_ratio`.

    Determinism: ranks are integer row_numbers (frequency desc, term
    tie-break); ln sits on the PMI/entropy round(4) precedent; the OLS
    closed form follows `agg_ols_daily_trend` including the overflow-free
    (A/B)·(A/C) form of R². The moment sums run over |vocabulary| terms —
    a frame that no longer scales with corpus size after the (term)
    aggregate. Plan: one token explode + map-side-combined count, one
    rank window on the vocabulary frame, one moment row."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(F.explode(tokens("text")).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    ranked = freq.select(
        "f",
        F.row_number().over(Window.orderBy(F.col("f").desc(), "t")).alias("r"),
    )
    xy = ranked.select(F.log("r").alias("x"), F.log("f").alias("y"))
    m = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    a = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    b = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    c = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").alias("n_types"),
        F.round(a / b, 4).alias("zipf_slope"),
        F.round(
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")) / b, 4
        ).alias("intercept"),
        F.round((a / b) * (a / c), 4).alias("r_squared"),
    )


@register(
    "text_readability",
    oracle="""
    WITH counts AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS BIGINT) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS BIGINT) AS n_syll
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syll,
           round(0.39 * (n_words * 1.0 / n_sentences)
                 + 11.8 * (n_syll * 1.0 / n_words) - 15.59, 4) AS fk_grade
    FROM counts
    WHERE n_words > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid grade level per document — the classic readability
    quality signal (C4-style pipelines filter on it): grade =
    0.39·(words/sentence) + 11.8·(syllables/word) − 15.59, with
    syllables approximated by vowel-group count (the standard
    dictionary-free estimator) and sentence count from terminal
    punctuation runs (min 1).

    Exactness: all three counts are integers from regexp/token
    expressions with identical semantics on both engines; the grade is
    one fixed float expression under round(4). Plan: zero-shuffle row-
    local projection — readability joins the quality-gate stage of
    `pipeline_clean_corpus` for free at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(tokens("text")).cast("bigint")
    n_sent = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    ).cast("bigint")
    n_syll = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("bigint")
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            n_syll.alias("n_syll"),
        )
        .filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syll",
            F.round(
                0.39 * (F.col("n_words") * 1.0 / F.col("n_sentences"))
                + 11.8 * (F.col("n_syll") * 1.0 / F.col("n_words"))
                - 15.59,
                4,
            ).alias("fk_grade"),
        )
    )


_HEAPS_PREFIXES = (1000, 2000, 5000, 10000, 20000)


@register(
    "text_heaps_law_curve",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.i AS idx, t[u.i] AS term
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents),
             LATERAL unnest(range(1, len(t) + 1)) AS u(i)
    ),
    pos AS (
        SELECT term,
               row_number() OVER (ORDER BY doc_id, idx) AS gpos
        FROM tok
    ),
    firsts AS (
        SELECT term, CAST(min(gpos) AS BIGINT) AS first_pos FROM pos GROUP BY term
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pos)
    {" UNION ALL ".join(
        f"SELECT CAST({n} AS BIGINT) AS n_tokens, "
        f"CAST(count(*) FILTER (first_pos <= {n}) AS BIGINT) AS n_types, "
        f"round(count(*) FILTER (first_pos <= {n}) * 1.0 / least({n}, any_value(tot.n)), 4) "
        f"    AS type_token_ratio "
        f"FROM firsts CROSS JOIN tot"
        for n in _HEAPS_PREFIXES)}
    """,
)
def text_heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct types seen within the
    first N tokens of the corpus (documents in doc_id order), for N in
    {1k, 2k, 5k, 10k, 20k} — natural corpora grow V(N) ≈ K·N^β (β≈0.5);
    a curve that FLATTENS early exposes a closed template vocabulary
    (this fixture) and one that stays linear exposes noise/binary
    contamination. The prefix view is what `text_vocab_build` can't
    show: HOW FAST the vocabulary saturates.

    Determinism: the global token position is a row_number over the
    total order (doc_id, in-doc index); each type's FIRST position is an
    integer min, and every curve point is a count of first_pos ≤ N — all
    integers, one division for the TTR. Plan: one posexplode (scan
    stage), one global-order window over the token stream (the corpus
    sort is the cost — at 100 TB the order key becomes (shard, doc_id)
    and the curve is computed per shard then merged by position), one
    ≤|vocab| first-position aggregate, conditional counts for all five
    prefixes in one pass."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        "doc_id", F.posexplode(tokens("text")).alias("idx", "term")
    )
    pos = tok.select(
        "term", F.row_number().over(Window.orderBy("doc_id", "idx")).alias("gpos")
    )
    firsts = pos.groupBy("term").agg(F.min("gpos").cast("bigint").alias("first_pos"))
    tot = pos.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    agg = firsts.crossJoin(F.broadcast(tot)).agg(
        F.first("n").alias("n"),
        *[
            F.sum(F.when(F.col("first_pos") <= n, 1).otherwise(0))
            .cast("bigint")
            .alias(f"v{n}")
            for n in _HEAPS_PREFIXES
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(n).cast("bigint").alias("n_tokens"),
                F.col(f"v{n}").alias("n_types"),
                F.round(
                    F.col(f"v{n}") / F.least(F.lit(n), F.col("n")), 4
                ).alias("type_token_ratio"),
            )
            for n in _HEAPS_PREFIXES
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.n_tokens", "r.n_types", "r.type_token_ratio"
    )


@register(
    "text_tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS BIGINT)
               AS bpe_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           round(sum(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) * 1.0
                 / sum(len(string_split_regex(trim(text), '\\s+'))), 4)
               AS fertility,
           round(sum(length(text)) * 1.0
                 / sum(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))), 4)
               AS chars_per_token
    FROM documents
    GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish subword tokens emitted
    per whitespace word, plus chars per subword token — the
    tokenizer-equity metric multilingual pipelines audit (a language
    whose fertility is 2× pays 2× the context budget for the same text,
    and quality filters keyed on token counts silently bias against
    it). Same lexer as `text_token_counts`, cut by `lang` instead of
    `source` and reduced to the two ratios that matter.

    Exactness: all three sums are bigint token/char counts — order-free
    — and each ratio is ONE division under round(4). Plan: one scan,
    per-row regexp counts inside codegen, one tiny groupBy(lang)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.sum(F.size(tokens("text")))
    bpe = F.sum(F.size(bpe_ish_tokens("text")))
    ch = F.sum(F.length("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        ws.cast("bigint").alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_tokens"),
        ch.cast("bigint").alias("n_chars"),
        F.round(bpe * 1.0 / ws, 4).alias("fertility"),
        F.round(ch * 1.0 / bpe, 4).alias("chars_per_token"),
    )


@register(
    "text_js_divergence_sources",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    cnt AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
    grid AS (
        SELECT s.source, v.t, coalesce(c.c, 0) AS c, s.tot
        FROM tot s
        CROSS JOIN (SELECT DISTINCT t FROM cnt) v
        LEFT JOIN cnt c ON c.source = s.source AND c.t = v.t
    ),
    terms AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CASE WHEN a.c > 0 AND b.c > 0 THEN 1 ELSE 0 END AS shared,
               CAST(floor((
                   CASE WHEN a.c = 0 THEN 0.0
                        ELSE 0.5 * (a.c * 1.0 / a.tot)
                             * ln((a.c * 1.0 / a.tot)
                                  / (((a.c * 1.0 / a.tot) + (b.c * 1.0 / b.tot)) / 2))
                   END
                 + CASE WHEN b.c = 0 THEN 0.0
                        ELSE 0.5 * (b.c * 1.0 / b.tot)
                             * ln((b.c * 1.0 / b.tot)
                                  / (((a.c * 1.0 / a.tot) + (b.c * 1.0 / b.tot)) / 2))
                   END) * 1000000 + 0.5) AS BIGINT) AS term_u
        FROM grid a JOIN grid b ON a.t = b.t AND a.source < b.source
    )
    SELECT source_a, source_b,
           CAST(sum(shared) AS BIGINT) AS n_shared_terms,
           round(sum(term_u) / 1000000.0, 4) AS js_divergence
    FROM terms GROUP BY 1, 2
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram
    distributions of every source pair — the distribution-drift matrix
    a corpus mixer reads before setting `pipeline_domain_mix` weights
    (JSD is symmetric, bounded by ln 2, and defined even where one side
    has zero mass — exactly why it beats KL for corpus comparison).

    Exactness: each term's contribution ½p·ln(p/m) + ½q·ln(q/m)
    (m = (p+q)/2; zero-mass sides contribute 0 by the CASE, not by a
    ln(0) dodge) is quantized to integer micro-units at the (pair,
    term) row, so per-pair sums are order-free bigints. The term grid
    is DENSIFIED first (sources × observed vocab, absent counts = 0) so
    the pair join needs no outer-join per pair. Plan: one token
    aggregate to |sources|·|vocab| rows, a vocab-key self-join of the
    tiny grid (|sources|²·|vocab| rows — model-sized, not corpus-
    sized), one groupBy(pair)."""
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select("source", F.explode(tokens("text")).alias("t"))
    cnt = tok.groupBy("source", "t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("tot"))
    vocab = cnt.select("t").distinct()
    grid = (
        tot.crossJoin(F.broadcast(vocab))
        .join(cnt, ["source", "t"], "left")
        .select("source", "t", F.coalesce("c", F.lit(0)).alias("c"), "tot")
    )
    a = grid.select(
        F.col("source").alias("source_a"),
        "t",
        F.col("c").alias("ca"),
        F.col("tot").alias("ta"),
    )
    b = grid.select(
        F.col("source").alias("source_b"),
        "t",
        F.col("c").alias("cb"),
        F.col("tot").alias("tb"),
    )
    p = F.col("ca") * 1.0 / F.col("ta")
    q = F.col("cb") * 1.0 / F.col("tb")
    m = (p + q) / 2
    term = F.when(F.col("ca") == 0, 0.0).otherwise(0.5 * p * F.log(p / m)) + F.when(
        F.col("cb") == 0, 0.0
    ).otherwise(0.5 * q * F.log(q / m))
    pairs = (
        a.join(b, "t")
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0).alias(
                "shared"
            ),
            F.floor(term * 1000000 + F.lit(0.5)).cast("bigint").alias("term_u"),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.sum("shared").cast("bigint").alias("n_shared_terms"),
        F.round(F.sum("term_u") / 1000000.0, 4).alias("js_divergence"),
    )


@register(
    "text_ngram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, doc_id % 2 = 0 AS base,
               string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT base, n, doc_id,
               list_aggregate(t[i:i+n-1], 'string_agg', ' ') AS g
        FROM toks
        CROSS JOIN (SELECT unnest([1, 2, 3]) AS n)
        , LATERAL unnest(range(1, greatest(len(t) - n + 1, 0) + 1)) r(i)
    ),
    base_g AS (SELECT DISTINCT n, g FROM grams WHERE base),
    new_g AS (
        SELECT n, g, CAST(count(*) AS BIGINT) AS occurrences
        FROM grams WHERE NOT base GROUP BY 1, 2
    )
    SELECT nw.n AS ngram_len,
           CAST(count(*) AS BIGINT) AS distinct_grams,
           CAST(sum(CASE WHEN b.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS novel_grams,
           round(sum(CASE WHEN b.g IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS novelty_rate,
           CAST(sum(CASE WHEN b.g IS NULL THEN occurrences ELSE 0 END)
                AS BIGINT) AS novel_occurrences
    FROM new_g nw LEFT JOIN base_g b ON nw.n = b.n AND nw.g = b.g
    GROUP BY nw.n
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty of the held-out half against the base half (docs
    split by doc_id parity) for n = 1, 2, 3 — the memorization/novelty
    probe: a novelty rate near zero at n=3 says the incoming slice is
    template-heavy rehash of the base corpus (pair with
    `pipeline_dedup_incremental`), near one says genuinely new text.

    Plan shape: one tokenize pass generates all three gram lengths
    (explode over n — a 3× row multiplier inside the scan stage, not
    three scans); the novelty test is a LEFT join of the new-half's
    distinct grams against the base-half's distinct grams on the
    (n, gram) key — shuffle carries distinct gram strings once, never
    documents. All-integer counts, one division per row under
    round(4)."""
    d = load_table(spark, sf_dir, "documents")
    toks = spread(d, "doc_id").select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("base"),
        tokens("text").alias("t"),
    )
    ns = spark.range(1, 4).select(F.col("id").cast("int").alias("n"))
    grams = (
        toks.crossJoin(F.broadcast(ns))
        .select(
            "base",
            "n",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size("t") - F.col("n") + 1, F.lit(0)),
                    ),
                    lambda i: F.concat_ws(" ", F.slice("t", i, F.col("n"))),
                )
            ).alias("g"),
        )
    )
    base_g = grams.filter("base").select("n", "g").distinct()
    new_g = (
        grams.filter(~F.col("base"))
        .groupBy("n", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("occurrences"))
    )
    joined = new_g.join(
        base_g.withColumn("seen", F.lit(1)), ["n", "g"], "left"
    )
    novel = F.when(F.col("seen").isNull(), 1).otherwise(0)
    return joined.groupBy(F.col("n").alias("ngram_len")).agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_grams"),
        F.sum(novel).cast("bigint").alias("novel_grams"),
        F.round(F.sum(novel) * 1.0 / F.count(F.lit(1)), 4).alias("novelty_rate"),
        F.sum(F.when(F.col("seen").isNull(), F.col("occurrences")).otherwise(0))
        .cast("bigint")
        .alias("novel_occurrences"),
    )


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t,
               generate_subscripts(string_split_regex(trim(text), '\\s+'), 1)
                   AS pos
        FROM documents
    ),
    flagged AS (
        SELECT doc_id, pos, t,
               CASE WHEN list_contains({_STOP_SQL}, t) THEN 1 ELSE 0 END
                   AS is_stop
        FROM toks
    ),
    numbered AS (
        SELECT doc_id, pos, t, is_stop,
               CAST(sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos)
                    AS BIGINT) AS phrase_id
        FROM flagged
    ),
    members AS (
        SELECT doc_id, phrase_id, pos, t FROM numbered WHERE is_stop = 0
    ),
    plen AS (
        SELECT doc_id, phrase_id, CAST(count(*) AS BIGINT) AS plen
        FROM members GROUP BY 1, 2
    ),
    wstat AS (
        SELECT m.t,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(p.plen) AS BIGINT) AS deg
        FROM members m JOIN plen p
          ON m.doc_id = p.doc_id AND m.phrase_id = p.phrase_id
        GROUP BY m.t
    ),
    inst AS (
        SELECT m.doc_id, m.phrase_id,
               string_agg(m.t, ' ' ORDER BY m.pos) AS phrase,
               CAST(sum((w.deg * 1000000) // w.freq) AS BIGINT) AS score_u
        FROM members m JOIN wstat w ON m.t = w.t
        GROUP BY m.doc_id, m.phrase_id
    )
    SELECT phrase,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           round(max(score_u) / 1000000.0, 4) AS rake_score
    FROM inst
    GROUP BY phrase
    ORDER BY max(score_u) DESC, phrase
    LIMIT 10
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are
    maximal stopword-free token runs; each word scores deg/freq (deg =
    Σ length of phrases containing it, freq = occurrences); a phrase
    scores the sum of its words — top 10 corpus-wide. The classic
    cheap keyword extractor that needs no model, used to label corpus
    clusters and build weak-supervision vocabularies.

    Exactness: word scores quantize via EXACT integer division
    ((deg·10⁶) div freq — deg/freq are bigint counts), phrase scores
    are order-free bigint sums of those units, and the top-10 cut
    orders by the exact integer with the phrase text as tiebreak.
    Phrase text is rebuilt position-ordered (string_agg ORDER BY pos /
    sort_array) — deterministic. Plan: one tokenize pass, phrase ids
    from a per-doc running sum of stopword marks (the sessionize
    trick applied to text), word stats one groupBy(term), scoring a
    broadcast join back onto phrase members."""
    d = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    toks = spread(d, "doc_id").select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "t0")
    ).select("doc_id", "pos", F.lower("t0").alias("t"))
    flagged = toks.withColumn(
        "is_stop", F.when(F.array_contains(stop, F.col("t")), 1).otherwise(0)
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    numbered = flagged.withColumn(
        "phrase_id", F.sum("is_stop").over(wd).cast("bigint")
    )
    members = numbered.filter(F.col("is_stop") == 0).select(
        "doc_id", "phrase_id", "pos", "t"
    )
    plen = members.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("plen")
    )
    wstat = (
        members.join(plen, ["doc_id", "phrase_id"])
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    inst = (
        members.join(F.broadcast(wstat), "t")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t"))),
                    lambda x: x.t,
                ),
                " ",
            ).alias("phrase"),
            F.sum(F.expr("(deg * 1000000) div freq")).cast("bigint").alias(
                "score_u"
            ),
        )
    )
    return (
        inst.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.max("score_u").alias("score_u"),
        )
        .orderBy(F.col("score_u").desc(), "phrase")
        .limit(10)
        .select(
            "phrase",
            "n_occurrences",
            F.round(F.col("score_u") / 1000000.0, 4).alias("rake_score"),
        )
    )


@register(
    "text_compression_ratio_proxy",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ),
    bigrams AS (
        SELECT doc_id, source,
               t[i] || ' ' || t[i+1] AS bg
        FROM toks, LATERAL unnest(range(1, greatest(len(t) - 1, 0) + 1)) r(i)
    ),
    per_doc AS (
        SELECT doc_id, source,
               CAST(count(*) AS BIGINT)            AS n_bigrams,
               CAST(count(DISTINCT bg) AS BIGINT)  AS n_distinct
        FROM bigrams GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
           CAST(sum(n_bigrams - n_distinct) AS BIGINT) AS repeated_bigrams,
           round(sum(n_bigrams - n_distinct) * 1.0 / sum(n_bigrams), 4)
               AS repeat_mass,
           round(avg(n_distinct * 1.0 / n_bigrams), 4) AS mean_uniqueness
    FROM per_doc GROUP BY source
    """,
)
def text_compression_ratio_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility proxy per source: the mass of REPEATED bigrams
    (occurrences minus distinct types, per doc) — a cheap stand-in for
    gzip ratio used as a quality gate (highly compressible text is
    boilerplate/templates; `text_repetition_filter`'s corpus-level
    twin). No compressor needed, so it stays a pure columnar pass.

    Exactness: per-doc counts are bigints; `mean_uniqueness` averages
    one-division ratios — bounded [0,1] magnitudes whose float sum
    drift is absorbed by round(4) (the `text_unigram_logprob`
    precedent); `repeat_mass` is integers + ONE division. Plan: one
    tokenize pass, per-doc count/distinct aggregate, tiny source
    rollup."""
    d = load_table(spark, sf_dir, "documents")
    toks = spread(d, "doc_id").select("doc_id", "source", tokens("text").alias("t"))
    # Guard the bigram positions for 1-token docs (the winnowing ADVICE
    # class, found by the r11 descending-sequence sweep): greatest(0, 0)
    # still yields sequence(1, 0) = [1, 0] DESCENDING — the i=0 row feeds
    # slice(t, 0, 2), which Spark rejects at runtime (1-based starts),
    # while the oracle's range(1, 1) is empty. Unreachable on the fixture
    # (every doc has ≥2 tokens); the row sets must match by construction.
    # The transform runs INSIDE the array (the text_good_turing idiom), so
    # the explode emits only bigram strings — never the token array per
    # generated row (SCALE.md rule 2).
    bigrams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(" ", F.slice("t", i, 2)),
                ),
            ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
        ).alias("bg"),
    )
    per_doc = bigrams.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.countDistinct("bg").cast("bigint").alias("n_distinct"),
    )
    rep = F.col("n_bigrams") - F.col("n_distinct")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("total_bigrams"),
        F.sum(rep).cast("bigint").alias("repeated_bigrams"),
        F.round(F.sum(rep) * 1.0 / F.sum("n_bigrams"), 4).alias("repeat_mass"),
        F.round(F.avg(F.col("n_distinct") * 1.0 / F.col("n_bigrams")), 4).alias(
            "mean_uniqueness"
        ),
    )


@register(
    "text_good_turing_smoothing",
    oracle="""
    WITH tok AS (
        SELECT string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ),
    big AS (
        SELECT ts[i] || ' ' || ts[i + 1] AS bg
        FROM tok, LATERAL unnest(range(1, len(ts))) r(i)
    ),
    counts AS (SELECT bg, CAST(count(*) AS BIGINT) AS n FROM big GROUP BY bg),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_bigrams FROM counts),
    coc AS (
        SELECT n AS r, CAST(count(*) AS BIGINT) AS n_r
        FROM counts GROUP BY n
    )
    SELECT a.r, a.n_r,
           CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_r_next,
           round((a.r + 1) * coalesce(b.n_r, 0) * 1.0 / a.n_r, 4) AS r_star,
           round(a.r * a.n_r * 1.0 / t.n_bigrams, 4) AS raw_mass,
           round((a.r + 1) * coalesce(b.n_r, 0) * 1.0
                 / (a.n_r * t.n_bigrams), 8) AS gt_prob_per_type
    FROM coc a
    LEFT JOIN coc b ON b.r = a.r + 1
    CROSS JOIN tot t
    WHERE a.r <= 10
    """,
)
def text_good_turing_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus BIGRAM
    distribution: the count-of-counts table N_r and the adjusted count
    r* = (r+1)·N_{r+1}/N_r for the rare tail (r ≤ 10) — the classic
    answer to "how much probability mass do unseen n-grams deserve"
    (the r=1 row IS the unseen-mass estimate N_1/N) and the discounting
    machinery under Katz back-off LMs. Bigrams, not unigrams, because
    smoothing only bites where a tail exists — the fixture vocabulary
    is closed (31 types, min count 26) but its bigram table has a
    genuine r=1..4 tail, exactly the regime GT was built for;
    `text_bigram_logprob` is the unsmoothed MLE this corrects.

    Exactness: bigram counts, count-of-counts, and the total are all
    bigint (DuckDB sums CAST to BIGINT to dodge the HUGEINT→float64
    trap); r* and the mass columns are single integer-ratio divisions
    under round(4)/round(8). Plan: one tokenize pass → groupBy(bigram)
    → groupBy(count); after the bigram rollup everything is ≤
    max-count rows and the r+1 self-join touches ~10 broadcast rows.
    At 100 TB the bigram rollup is the only heavy shuffle — identical
    in shape to `text_vocab_build`'s, with (hash, int) shuffle rows."""
    d = load_table(spark, sf_dir, "documents")
    bigrams = F.when(
        F.size(F.col("trim_tokens")) >= 2,
        F.expr(
            "transform(sequence(1, size(trim_tokens) - 1), "
            "i -> concat(element_at(trim_tokens, i), ' ', "
            "element_at(trim_tokens, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        d.select(tokens("text").alias("trim_tokens"))
        .select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("n_bigrams"))
    coc = counts.groupBy(F.col("n").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r")
    )
    b = coc.select(F.col("r").alias("rb"), F.col("n_r").alias("n_r_b"))
    nxt = F.coalesce(F.col("n_r_b"), F.lit(0))
    return (
        coc.filter(F.col("r") <= 10)
        .join(F.broadcast(b), F.col("rb") == F.col("r") + 1, "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            nxt.cast("bigint").alias("n_r_next"),
            F.round((F.col("r") + 1) * nxt * 1.0 / F.col("n_r"), 4).alias("r_star"),
            F.round(F.col("r") * F.col("n_r") * 1.0 / F.col("n_bigrams"), 4).alias(
                "raw_mass"
            ),
            F.round(
                (F.col("r") + 1) * nxt * 1.0 / (F.col("n_r") * F.col("n_bigrams")), 8
            ).alias("gt_prob_per_type"),
        )
    )


_TEXTRANK_ROUNDS = 3


def _textrank_iter_cte(k: int) -> str:
    """One weighted-PageRank round over the word graph (contribution sum +
    damped update) — the `graph_analytics._iter_cte` shape with edge
    weights w/wsum replacing 1/deg."""
    prev = f"r{k - 1}"
    return f"""
    c{k} AS (
        SELECT e.b AS node, sum(r.score * e.w / d.wsum) AS s
        FROM edges e
        JOIN {prev} r ON e.a = r.node
        JOIN ws d ON e.a = d.a
        GROUP BY 1
    ),
    r{k} AS (
        SELECT nd.node,
               CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * coalesce(c.s, 0)
                   AS score
        FROM nodes nd LEFT JOIN c{k} c ON nd.node = c.node
    )"""


@register(
    "text_textrank_keywords",
    oracle="""
    WITH toks AS (
        SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    bg AS (
        SELECT t[u.i] AS w1, t[u.i + 1] AS w2
        FROM toks, LATERAL unnest(range(1, greatest(len(t), 1))) AS u(i)
    ),
    sym AS (
        SELECT w1 AS a, w2 AS b FROM bg WHERE w1 <> w2
        UNION ALL
        SELECT w2, w1 FROM bg WHERE w1 <> w2
    ),
    edges AS (SELECT a, b, CAST(count(*) AS BIGINT) AS w FROM sym GROUP BY 1, 2),
    ws AS (SELECT a, CAST(sum(w) AS BIGINT) AS wsum FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS score FROM nodes),
    """
    + ",".join(_textrank_iter_cte(k) for k in range(1, _TEXTRANK_ROUNDS + 1))
    + f"""
    SELECT r.node AS word,
           nn.n_neighbors,
           d.wsum AS w_total,
           round(r.score, 4) AS score
    FROM r{_TEXTRANK_ROUNDS} r
    JOIN ws d ON r.node = d.a
    JOIN (SELECT a, CAST(count(*) AS BIGINT) AS n_neighbors
          FROM edges GROUP BY 1) nn ON r.node = nn.a
    """,
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau): weighted PageRank
    (damping 0.85, 3 synchronous rounds from score 1.0) over the word
    co-occurrence graph — vertices are corpus words, edges link ADJACENT
    tokens (window 2, both directions, self-pairs dropped), edge weight =
    corpus-wide adjacency count. Words central to the adjacency structure
    outrank merely-frequent words — the graph-based complement to
    `text_tfidf_top_terms` (frequency-contrast) and `text_rake_keywords`
    (phrase-run heuristics). Output: one row per word with its degree,
    total adjacency weight, and damped-rank score.

    Exactness: graph construction is all-integer (counts / bigint
    weights); the rank walk mirrors `graph_pagerank_copurchase`'s
    accepted discipline — identical expression shape
    (score·w/wsum, damped update) on both engines, round(4) on output
    only. Docs with <2 tokens contribute no edges; the Spark bigram
    explode uses the gated-transform idiom (size ≥ 2 guard, r11 house
    rule) so 1-token docs never hit sequence(1, 0).

    Scale shape: one tokenize + adjacency-pair explode (the
    `text_bigram_logprob` shuffle: (word, word, int) rows — no doc
    payloads), then everything runs on the |V|² -bounded edge frame:
    tokenizer vocabularies are bounded (~100 k types), so the graph is
    metadata-scale regardless of corpus bytes, and each rank round is a
    keyed join + partial+final aggregate on it (`size_gated_broadcast`
    on the |V|-row rank frame keeps rounds map-side)."""
    d = load_table(spark, sf_dir, "documents")
    # r16 opt (guide §2.6): spread before tokenize+pair-struct build —
    # the interpreted per-row transform otherwise runs serially in the
    # 1-partition fixture scan stage (no-op on multi-split tables)
    t = spread(d, "doc_id").select(tokens("text").alias("t"))
    pair_struct = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    bg = (
        t.select(F.explode(pair_struct).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter(F.col("w1") != F.col("w2"))
    )
    sym = bg.select(F.col("w1").alias("a"), F.col("w2").alias("b")).unionAll(
        bg.select(F.col("w2").alias("a"), F.col("w1").alias("b"))
    )
    edges = durable_checkpoint(
        sym.groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("w")),
        eager=False,
    )
    ws = edges.groupBy("a").agg(F.sum("w").cast("bigint").alias("wsum"))
    contrib_src = durable_checkpoint(edges.join(ws, "a"), eager=False)
    # ws is already one row per vertex — no distinct pass over the
    # |E|-row joined frame needed (r12 review finding)
    nodes = ws.select(F.col("a").alias("node"))
    ranks = nodes.select("node", F.lit(1.0).alias("score"))
    for _ in range(_TEXTRANK_ROUNDS):
        c = (
            contrib_src.join(
                size_gated_broadcast(ranks.withColumnRenamed("node", "a")),
                "a",
            )
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum(F.col("score") * F.col("w") / F.col("wsum")).alias("s"))
        )
        ranks = nodes.join(c, "node", "left").select(
            "node",
            (
                F.lit(0.15) + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("score"),
        )
    nn = edges.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors")
    )
    return (
        ranks.join(ws.withColumnRenamed("a", "node"), "node")
        .join(nn.withColumnRenamed("a", "node"), "node")
        .select(
            F.col("node").alias("word"),
            "n_neighbors",
            F.col("wsum").alias("w_total"),
            F.round("score", 4).alias("score"),
        )
    )


_VOCAB_K = 20  # vocabulary size for the coverage screen


@register(
    "text_oov_rate",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    st AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    vocab AS (
        SELECT t FROM (SELECT t, sum(c) AS c FROM st GROUP BY 1)
        ORDER BY c DESC, t ASC LIMIT {_VOCAB_K}
    )
    SELECT st.source,
           CAST(sum(st.c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.t IS NULL THEN st.c ELSE 0 END) AS BIGINT)
               AS oov_tokens,
           round(sum(CASE WHEN v.t IS NULL THEN st.c ELSE 0 END) * 1.0
                 / sum(st.c), 4) AS oov_rate
    FROM st LEFT JOIN vocab v ON st.t = v.t
    GROUP BY st.source
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / out-of-vocabulary screen: build the corpus
    top-K token vocabulary (K=20; ties broken by token text so the cut is
    deterministic), then report each source's token mass falling OUTSIDE
    it — the coverage check run before committing to a tokenizer or a
    fixed vocab, and the per-source skew signal (a source with high OOV
    rate against the corpus vocabulary is distributionally alien).
    Complements `text_vocab_build` (which emits the vocabulary itself)
    and `text_tokenizer_fertility` (subword split ratios).

    Exactness: counts are integers; the rank-K cut is fully ordered by
    (count DESC, token ASC) in both engines; one round(4) ratio in
    [0, 1]. Plan: tokens collapse to (source, token, count) via a
    map-side-combinable groupBy BEFORE anything joins — raw token
    occurrences never shuffle twice; the global frequency rollup reuses
    that compact frame; the K-row vocabulary broadcasts (size-gated) onto
    it; final rollup shuffles one row per (source, token). The top-K cut
    is orderBy().limit(K), which Spark plans as a PARALLEL
    TakeOrderedAndProject (per-partition top-K then a K-row driver
    merge) — the distinct-token frame is corpus-proportional at 100 TB
    (billions of rows), so an unpartitioned row_number window here would
    funnel it through ONE task (ADVICE r12); the limit form keeps the
    same deterministic (count DESC, token ASC) cut."""
    d = load_table(spark, sf_dir, "documents")
    st = (
        spread(d, "doc_id")
        .select("source", F.explode(tokens("text")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    freq = st.groupBy("t").agg(F.sum("c").alias("tc"))
    vocab = (
        freq.orderBy(F.desc("tc"), F.asc("t"))
        .limit(_VOCAB_K)
        .select("t", F.lit(1).alias("in_v"))
    )
    return (
        st.join(size_gated_broadcast(vocab), "t", "left")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("oov_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            "oov_tokens",
            F.round(F.col("oov_tokens") / F.col("n_tokens"), 4).alias(
                "oov_rate"
            ),
        )
    )


_MATTR_W = 25  # moving-average TTR window (tokens)


@register(
    "text_mattr_diversity",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ),
    wins AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               greatest(CAST(len(toks) AS BIGINT) - {_MATTR_W} + 1, 1)
                   AS n_windows,
               CAST(list_sum(list_transform(
                        range(1, CAST(greatest(len(toks) - {_MATTR_W} + 1, 1)
                                      AS BIGINT) + 1),
                        i -> len(list_distinct(
                                 toks[CAST(i AS INTEGER)
                                      :CAST(i + {_MATTR_W} - 1 AS INTEGER)]))))
                    AS BIGINT) AS dsum
        FROM t
    )
    SELECT doc_id, n_tokens,
           ((dsum * 20000 + least(n_tokens, {_MATTR_W}) * n_windows)
            // (2 * least(n_tokens, {_MATTR_W}) * n_windows)) / 10000.0
               AS mattr
    FROM wins
    """,
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity via MATTR (moving-average type-token ratio,
    Covington & McFall): slide a 25-token window over each document, take
    the type/token ratio in each window, average — the length-robust
    diversity score corpus-quality pipelines use where raw TTR collapses
    for long documents (repetitive machine-generated text scores low at
    any length). Documents shorter than the window fall back to one
    whole-document window (the standard short-text convention).

    Exactness: the per-window distinct count is an integer, so the score
    is the rational dsum / (W · n_windows) — rounded to 4 decimals in
    INTEGER arithmetic (floor((dsum·2e4 + W·m) / (2·W·m)) / 1e4, exact
    half-up without float division on either engine, the micro-unit
    pattern from the signed-zero convention in FIXTURES.md). The engines
    compute dsum DIFFERENTLY but integer-identically: the oracle keeps
    the definitional O(n·W) slice sweep; the Spark side uses the
    next-occurrence closed form — position j is distinct within window
    [i, i+W-1] iff its token's next occurrence falls past the window
    end, so j contributes to exactly
    max(0, min(j, m, next(j)−W) − max(1, j−W+1) + 1) windows — O(n log n)
    per document via one array_sort (property-checked against the brute
    sweep over random corpora in tests/test_r12b_ops.py). Plan:
    ZERO-SHUFFLE — the whole sweep is a per-row higher-order expression
    inside the scan stage (the token array is let-bound as a lambda
    variable, the cdc-chunking CollapseProject lesson); nothing leaves
    the document's partition, output is one row per document — at 100 TB
    it scans, computes, and writes with no exchange at all."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("bigint")
    n_windows = F.greatest(n - _MATTR_W + 1, F.lit(1).cast("bigint"))
    w = _MATTR_W
    # next-occurrence sweep: sort (token, pos) pairs once, read next(j)
    # from the following pair when it carries the same token, then sum
    # each position's closed-form window-contribution count.
    dsum = F.expr(
        f"""
        element_at(transform(array(split(trim(text), '\\\\s+')), tk ->
          CASE WHEN size(tk) < {w}
               THEN CAST(size(array_distinct(tk)) AS BIGINT)
          ELSE element_at(transform(
            array(array_sort(transform(sequence(1, size(tk)),
                             j -> struct(element_at(tk, j) AS t, j AS j)))),
            ps -> aggregate(sequence(1, size(tk)), CAST(0 AS BIGINT),
              (acc, k) -> acc + CAST(greatest(
                  least(element_at(ps, k).j,
                        size(tk) - {w - 1},
                        (CASE WHEN k < size(tk)
                               AND element_at(ps, k + 1).t
                                   = element_at(ps, k).t
                              THEN element_at(ps, k + 1).j
                              ELSE size(tk) + 1 END) - {w})
                  - greatest(1, element_at(ps, k).j - {w - 1}) + 1,
                  0) AS BIGINT))), 1)
          END), 1)
        """
    )
    w_eff = F.least(n, F.lit(_MATTR_W).cast("bigint"))
    # dsum is referenced exactly ONCE downstream, so CollapseProject
    # re-inlining the named column is harmless here (contrast the
    # cdc-chunking let-binding note, where multiple references to an
    # expensive named expression forced the transform-bound form)
    return (
        spread(d, "doc_id")
        .select(
            "doc_id",
            n.alias("n_tokens"),
            dsum.alias("dsum0"),
            w_eff.alias("w_eff0"),
            n_windows.alias("n_windows0"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.expr(
                    "(dsum0 * 20000 + w_eff0 * n_windows0) "
                    "DIV (2 * w_eff0 * n_windows0)"
                )
                / F.lit(10000.0)
            ).alias("mattr"),
        )
    )
