"""Corpus-curation operators beyond the round-2 set: PII redaction,
repetition-based quality signals (Gopher-style), exact stratified
sampling, and int8 embedding quantization.

Scale shapes (the 100 TB contract):
- PII redaction is a pure map: regex expressions inside whole-stage
  codegen, zero shuffles — the scan IS the job.
- Repetition signals are one explode → two-level aggregation (per-(doc,
  word) combine, then per-doc max/sum): shuffle carries (doc_id, word,
  count) partials, never documents.
- Stratified sampling is one window per stratum over a deterministic
  portable hash — a single shuffle keyed on the stratum, no driver
  involvement, exact per-stratum quotas (TABLESAMPLE can't promise
  those).
- Quantization is a pure map over the vector column (array lambdas in
  codegen); integer outputs make it hash-verifiable cross-engine.

Determinism: regexes are RE2-compatible (no lookahead/backrefs) so Java
and DuckDB agree; quantization rounds via ``floor(x + 0.5)`` — identical
IEEE semantics in both engines, unlike ROUND whose half-case mode is
engine-flavored; sampling ranks on the portable md5-derived hash from
``functions/hashing.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from paimon_presto_spark.functions.hashing import md5_long
from paimon_presto_spark.functions.numeric import decimal_squeeze
from paimon_presto_spark.queries import register
from paimon_presto_spark.sources.testdata import load_table

# RE2-safe PII patterns (shared verbatim by Spark and the oracle)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9-]{7,}[0-9]"


@register(
    "text_pii_redaction",
    oracle=f"""
        WITH aug AS (
            SELECT doc_id, source,
                   'contact ' || source || '@example.com or +1-555-' ||
                   LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text
                       AS t
            FROM documents
        ),
        red AS (
            SELECT doc_id, source, t,
                   LEN(regexp_extract_all(t, '{EMAIL_RE}')) AS n_email,
                   LEN(regexp_extract_all(t, '{PHONE_RE}')) AS n_phone,
                   regexp_replace(
                       regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PHONE_RE}', '<PHONE>', 'g') AS clean
            FROM aug
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
               CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
               CAST(SUM(LENGTH(t) - LENGTH(clean)) AS BIGINT) AS chars_removed
        FROM red
        GROUP BY source
        ORDER BY source
    """,
    tags=("text", "pii", "curation", "map-only"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as a pure column map: emails and phone-shaped digit
    runs replaced by typed placeholders, with per-source redaction
    accounting. The test corpus is synthetic, so deterministic PII is
    injected first (``source@example.com`` + a doc-keyed phone number) —
    the redactor then provably removes both plus anything PII-shaped
    already present. Zero shuffles before the final small aggregate; at
    100 TB this runs at scan speed inside whole-stage codegen.
    """
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.lit("contact "),
        F.col("source"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" "),
        F.col("text"),
    )
    t = d.withColumn("t", aug)
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    r = t.select(
        "source",
        F.regexp_count(F.col("t"), F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(F.col("t"), F.lit(PHONE_RE)).alias("n_phone"),
        (F.length("t") - F.length(clean)).alias("delta"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").alias("emails_redacted"),
            F.sum("n_phone").alias("phones_redacted"),
            F.sum("delta").alias("chars_removed"),
        )
        .orderBy("source")
    )


@register(
    "text_repetition_quality",
    oracle="""
        WITH w AS (
            SELECT doc_id, unnest(STRING_SPLIT(text, ' ')) AS wd
            FROM documents
        ),
        c AS (
            SELECT doc_id, wd, COUNT(*) AS cnt FROM w GROUP BY doc_id, wd
        ),
        m AS (
            SELECT doc_id,
                   CAST(MAX(cnt) AS BIGINT) AS top_word_count,
                   CAST(SUM(cnt) AS BIGINT) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_words
            FROM c GROUP BY doc_id
        )
        SELECT doc_id, n_words, n_distinct_words, top_word_count,
               ROUND(1.0 - CAST(n_distinct_words AS DOUBLE) / n_words, 6)
                   AS dup_word_frac,
               ROUND(CAST(top_word_count AS DOUBLE) / n_words, 6)
                   AS top_word_frac
        FROM m
        ORDER BY dup_word_frac DESC, doc_id
        LIMIT 50
    """,
    tags=("text", "quality", "repetition", "curation"),
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction and
    most-frequent-word mass per document, worst 50 documents first — the
    inputs to a "drop if dup_word_frac > τ" curation rule. One explode
    feeds a combiner-friendly (doc, word) count, then a per-doc rollup:
    the shuffle carries word-count partials, never document text, so the
    job scales with vocabulary-per-doc, not corpus bytes.
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("wd"))
    c = w.groupBy("doc_id", "wd").agg(F.count(F.lit(1)).alias("cnt"))
    m = c.groupBy("doc_id").agg(
        F.max("cnt").alias("top_word_count"),
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
    )
    return (
        m.select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            "top_word_count",
            F.round(
                1.0 - F.col("n_distinct_words").cast("double") / F.col("n_words"), 6
            ).alias("dup_word_frac"),
            F.round(
                F.col("top_word_count").cast("double") / F.col("n_words"), 6
            ).alias("top_word_frac"),
        )
        .orderBy(F.desc("dup_word_frac"), "doc_id")
        .limit(50)
    )


@register(
    "sample_stratified_exact",
    oracle="""
        WITH h AS (
            SELECT doc_id, lang,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS hk
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY hk, doc_id
                   ) AS rk
            FROM h
        )
        SELECT lang, doc_id, rk FROM r
        WHERE rk <= 20
        ORDER BY lang, rk
    """,
    tags=("sampling", "stratified", "curation", "window"),
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum quotas (20 docs per language) via a deterministic
    hash-ranked window — the domain-mix rebalancing step of a training
    pipeline, where TABLESAMPLE's probabilistic counts aren't acceptable.
    One shuffle keyed on the stratum; Spark's WindowGroupLimit pushes the
    rk<=20 cut into the sort so each partition materializes only its top
    20, and the portable md5 rank makes the sample reproducible across
    engines, runs, and cluster sizes (seed-free by construction).
    """
    d = load_table(spark, sf_dir, "documents")
    hk = md5_long(F.col("doc_id").cast("string"))
    win = Window.partitionBy("lang").orderBy(hk, "doc_id")
    return (
        d.select("lang", "doc_id", F.row_number().over(win).alias("rk"))
        .filter(F.col("rk") <= 20)
        .orderBy("lang", "rk")
    )


@register(
    "embedding_int8_quantize",
    oracle="""
        WITH s AS (
            SELECT vec_id, label, embedding,
                   list_aggregate(
                       list_transform(embedding,
                                      x -> abs(CAST(x AS DOUBLE))), 'max')
                       AS mx
            FROM embeddings
        ),
        q AS (
            SELECT vec_id, label,
                   list_transform(
                       embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5)
                                 AS BIGINT)) AS codes
            FROM s
            WHERE mx > 0
        )
        SELECT label,
               COUNT(*) AS n_vecs,
               CAST(SUM(list_aggregate(codes, 'sum')) AS BIGINT) AS sum_codes,
               CAST(SUM(LEN(list_filter(codes, v -> abs(v) = 127)))
                    AS BIGINT) AS n_saturated
        FROM q
        GROUP BY label
        ORDER BY label
    """,
    tags=("embeddings", "quantization", "curation", "map-only"),
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = 127/max|x|) — the
    4× storage cut applied to embedding stores before ANN indexing. A pure
    array-lambda map in codegen with integer verification outputs (code
    sums and saturation counts per label): ``floor(x*scale + 0.5)`` is
    used instead of ROUND because IEEE floor is bit-identical across
    engines while ROUND's half-case mode is not. At 100 TB this is
    scan-speed; nothing shuffles but the final per-label partials.
    """
    e = load_table(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    withs = e.withColumn("mx", mx).filter(F.col("mx") > 0)
    scale = F.lit(127.0) / F.col("mx")
    codes = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )
    qq = withs.select(
        "label",
        F.aggregate(codes, F.lit(0).cast("long"), lambda acc, v: acc + v).alias(
            "vec_sum"
        ),
        F.size(F.filter(codes, lambda v: F.abs(v) == 127)).alias("sat"),
    )
    return (
        qq.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("vec_sum").alias("sum_codes"),
            F.sum("sat").cast("long").alias("n_saturated"),
        )
        .orderBy("label")
    )

CHUNK = 32
STRIDE = 24
PACK_CAP = 256


@register(
    "doc_chunk_windows",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents
        ),
        c AS (
            SELECT doc_id, tk,
                   UNNEST(generate_series(0, LEN(tk) - 1, {STRIDE})) AS strt
            FROM t
        )
        SELECT doc_id,
               strt // {STRIDE} AS chunk_idx,
               LEN(list_slice(tk, strt + 1,
                              LEAST(strt + {CHUNK}, LEN(tk)))) AS chunk_len,
               CAST('0x' || substr(md5(array_to_string(
                   list_slice(tk, strt + 1, LEAST(strt + {CHUNK}, LEN(tk))),
                   ' ')), 1, 15) AS BIGINT) AS chunk_hash
        FROM c
        ORDER BY doc_id, chunk_idx
    """,
    tags=("text", "chunking", "curation", "explode"),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 32, stride 24) — the
    context-length segmentation step before tokenized training shards.
    ``sequence``-explode generates chunk starts and ``slice`` cuts each
    window out of the pre-split token array, all in codegen: a pure 1→N
    map whose fan-out is len/stride, no shuffle at any scale. Chunk
    payloads are verified by portable md5 content hashes, so the oracle
    checks the exact chunk text, not just counts.
    """
    d = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    t = d.select("doc_id", tk.alias("tk"))
    c = t.withColumn(
        "strt",
        F.explode(F.sequence(F.lit(0), F.size("tk") - 1, F.lit(STRIDE))),
    )
    chunk = F.slice(F.col("tk"), F.col("strt") + 1, CHUNK)
    return (
        c.select(
            "doc_id",
            F.expr(f"strt DIV {STRIDE}").alias("chunk_idx"),
            F.size(chunk).alias("chunk_len"),
            md5_long(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "pack_sequences_greedy",
    oracle=f"""
        WITH n AS (
            SELECT doc_id, source,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tok
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, n_tok,
                   SUM(n_tok) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM n
        )
        SELECT source,
               CAST((cum - n_tok) // {PACK_CAP} AS BIGINT) AS bin,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS tok_sum
        FROM c
        GROUP BY source, bin
        ORDER BY source, bin
    """,
    tags=("text", "packing", "curation", "window"),
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill sequence packing: documents are laid into
    fixed-capacity token bins (256) in deterministic doc_id order, one
    running-sum window PER SOURCE — the shard-building step before
    training. Partitioning the cumsum by source keeps the window
    distributed (a corpus-global ordered cumsum would serialize onto one
    task at 100 TB; per-shard packing is both the scalable plan and what
    a real pipeline wants). Integer outputs (bin ids, doc counts, token
    sums) make the gate exact.
    """
    d = load_table(spark, sf_dir, "documents")
    n = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = n.withColumn("cum", F.sum("n_tok").over(win))
    return (
        c.select(
            "source",
            F.expr(f"(cum - n_tok) DIV {PACK_CAP}").alias("bin"),
            "n_tok",
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tok_sum"),
        )
        .orderBy("source", "bin")
    )


@register(
    "text_tfidf_topk",
    oracle="""
        WITH words AS (
            SELECT doc_id, w AS wd
            FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
            WHERE w <> ''
        ),
        tf AS (
            SELECT doc_id, wd, COUNT(*) AS tf
            FROM words GROUP BY doc_id, wd
        ),
        df AS (
            SELECT wd, COUNT(*) AS df_docs
            FROM tf GROUP BY wd
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.wd, tf.tf, df.df_docs,
                   tf.tf * CAST(CAST(CAST(LN(CAST(1 + n.n_docs AS DOUBLE)
                       / CAST(1 + df.df_docs AS DOUBLE)) AS DECIMAL(28,10))
                       AS VARCHAR) AS DOUBLE) AS score
            FROM tf, df, n
            WHERE tf.wd = df.wd AND tf.doc_id < 50
        ),
        ranked AS (
            SELECT doc_id, wd, tf, df_docs, score,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, wd
                   ) AS rnk
            FROM scored
        )
        SELECT doc_id, rnk, wd, CAST(tf AS BIGINT) AS tf,
               CAST(df_docs AS BIGINT) AS df_docs, score
        FROM ranked
        WHERE rnk <= 3
        ORDER BY doc_id, rnk
    """,
    tags=("text", "tfidf", "curation", "analysis"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf = ln((1+N)/(1+df))).
    The classic keyword-extraction signal for corpus triage, expressed as
    two count aggregations plus one shuffle-joined window:

    Scale shape: term frequencies combine map-side per (doc, word) — the
    shuffle carries counts, never text; document frequency aggregates the
    tf table down to the RAW token vocabulary, which on a web-scale
    corpus (typos, junk, numbers) runs to 10⁸+ entries — so it
    shuffle-joins on wd rather than broadcasting (AQE still broadcasts
    it when it measures small); the per-doc top-k is a
    WindowGroupLimit-prunable window keyed on the document. No step holds a
    whole document in memory and nothing is quadratic.

    Determinism: Java's Math.log can sit one ulp off libm's, so the raw
    idf is NOT bit-portable — the idf is squeezed through DECIMAL(28,10)
    (string-bridged back to double, the registry's decimal rule applied to
    a transcendental) before the tf multiply, which is then a product of
    identical doubles in both engines; ranking and output share the
    rounded score, ties broken on the word itself.
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("wd")).filter(
        F.col("wd") != ""
    )
    tf = w.groupBy("doc_id", "wd").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("wd").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = d.count()
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(df_t, "wd")
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * decimal_squeeze(
                F.log(
                    (F.lit(1.0) + F.lit(float(n_docs)))
                    / (F.lit(1.0) + F.col("df_docs").cast("double"))
                )
            ),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("wd"))
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "wd", "tf", "df_docs", "score")
        .orderBy("doc_id", "rnk")
    )


@register(
    "text_unigram_logprob",
    oracle="""
        WITH words AS (
            SELECT doc_id, w AS wd
            FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
            WHERE w <> ''
        ),
        vocab AS (
            SELECT wd, COUNT(*) AS cnt FROM words GROUP BY wd
        ),
        tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab),
        scored AS (
            SELECT words.doc_id,
                   CAST(LN(vocab.cnt / tot.total) AS DECIMAL(28,10)) AS lp
            FROM words, vocab, tot
            WHERE words.wd = vocab.wd
        )
        SELECT doc_id,
               COUNT(*) AS n_words,
               CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) AS logprob_sum,
               CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_logprob
        FROM scored
        WHERE doc_id < 40
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("text", "quality", "language-model", "curation"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram language-model scoring: each document's mean
    log-probability under the corpus's own unigram distribution — the
    cheap perplexity proxy LLM pipelines use to rank text quality before
    any neural model gets involved (low avg ⇒ rare-word soup, high avg ⇒
    in-distribution text).

    Scale shape: ONE aggregation builds the unigram table, which
    shuffle-joins back onto the exploded word stream — NOT broadcast:
    the raw token vocabulary of a web-scale corpus (typos, junk,
    numbers) runs to 10⁸+ entries, a multi-GB broadcast that OOMs the
    driver (round-6 verdict). The word stream shuffles as (doc_id,
    word) pairs — text never moves as documents — and AQE still
    broadcasts the model when it measures small. The per-document
    reduce combines map-side.

    Determinism: probabilities are exact double divisions of identical
    operands; ln() is bit-identical across engines; the per-doc sum runs
    through DECIMAL(28,10) so partial-aggregation order can't reassociate
    floats (registry rule); avg divides two identical doubles.
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("wd")).filter(
        F.col("wd") != ""
    )
    vocab = w.groupBy("wd").agg(F.count(F.lit(1)).alias("cnt"))
    total = float(vocab.agg(F.sum("cnt")).collect()[0][0])
    scored = w.join(vocab, "wd").withColumn(
        "lp", F.log(F.col("cnt") / F.lit(total)).cast("decimal(28,10)")
    )
    agg = (
        scored.filter(F.col("doc_id") < 40)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("lp").cast("string").cast("double").alias("logprob_sum"),
        )
    )
    return (
        agg.withColumn("avg_logprob", F.col("logprob_sum") / F.col("n_words"))
        .select("doc_id", "n_words", "logprob_sum", "avg_logprob")
        .orderBy("doc_id")
    )


@register(
    "sample_temperature",
    oracle="""
        WITH stats AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars
            FROM documents GROUP BY source
        ),
        weighted AS (
            SELECT source, n_docs, n_chars,
                   CAST(SQRT(CAST(n_chars AS DOUBLE)) AS DECIMAL(28,10)) AS w
            FROM stats
        ),
        tot AS (SELECT SUM(w) AS tw FROM weighted),
        quotas AS (
            SELECT source, n_docs, n_chars,
                   CAST(FLOOR(200.0 * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)))
                       AS BIGINT) AS quota
            FROM weighted, tot
        ),
        ranked AS (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                     1, 15) AS BIGINT), doc_id
                   ) AS rk
            FROM documents
        )
        SELECT q.source, q.n_docs, q.n_chars, q.quota,
               CAST(COUNT(r.doc_id) AS BIGINT) AS n_sampled,
               CAST(COALESCE(SUM(r.doc_id), 0) AS BIGINT) AS id_checksum
        FROM quotas q LEFT JOIN ranked r
          ON r.source = q.source AND r.rk <= q.quota
        GROUP BY q.source, q.n_docs, q.n_chars, q.quota
        ORDER BY q.source
    """,
    tags=("sampling", "temperature", "data-mixing", "curation"),
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted multi-source sampling — the data-mixing step
    of multilingual/multi-domain LLM corpora (α-smoothed source weights,
    per GPT-3 / XLM-R mixing): each source's weight is its token volume
    raised to α=0.5, quotas allocate a 200-doc budget ∝ weight, and the
    quota is filled deterministically by portable-md5 rank so the sample
    is reproducible across engines and resumed runs.

    Scale shape: source stats are one count aggregation (|sources| rows —
    broadcastable by construction); the weight TOTAL is one collected
    scalar (the k-means-style bounded sync point — a 1-row crossJoin
    would compile to the BroadcastNestedLoopJoin shape the scale
    stress's tripwire forbids); the per-source fill is one md5-ranked
    window, WindowGroupLimit-prunable exactly like
    ``sample_stratified_exact``. Documents shuffle once, keyed by source.

    Determinism: sqrt is IEEE-correctly-rounded (bit-identical in both
    engines); the weight sum runs through DECIMAL(28,10); the final ratio
    divides two identical doubles; sampled membership is pinned by the
    md5 rank with doc_id tie-break, and the id checksum is an
    order-insensitive integer sum.
    """
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    weighted = stats.withColumn(
        "w", F.sqrt(F.col("n_chars").cast("double")).cast("decimal(28,10)")
    )
    # The weight total is ONE decimal value: collect it instead of
    # cross-joining the 1-row aggregate back in — the crossJoin spelling
    # compiled to BroadcastNestedLoopJoin nodes that the sf1 scale
    # stress's zero-BNLJ tripwire cannot distinguish from a genuine
    # corpus x corpus explosion. float(Decimal) is a correctly-rounded
    # cast, identical to the oracle's CAST(tw AS DOUBLE).
    tw = float(weighted.agg(F.sum("w").alias("tw")).collect()[0]["tw"])
    quotas = weighted.withColumn(
        "quota",
        F.floor(
            F.lit(200.0) * (F.col("w").cast("double") / F.lit(tw))
        ).cast("bigint"),
    )
    rk_win = Window.partitionBy("source").orderBy(
        md5_long(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "source", "doc_id", F.row_number().over(rk_win).alias("rk")
    )
    sampled = ranked.join(
        F.broadcast(quotas.select("source", "quota")), "source"
    ).filter(F.col("rk") <= F.col("quota"))
    per_source = sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("id_checksum"),
    )
    return (
        quotas.join(per_source, "source", "left")
        .select(
            "source", "n_docs", "n_chars", "quota",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("id_checksum", F.lit(0)).alias("id_checksum"),
        )
        .orderBy("source")
    )


@register(
    "dedup_boilerplate_chunks",
    oracle="""
        WITH sp AS (
            SELECT doc_id, string_split(text, ' ') AS arr FROM documents
        ),
        words AS (
            SELECT doc_id, unnest(arr) AS w,
                   generate_subscripts(arr, 1) AS idx
            FROM sp
        ),
        chunks AS (
            SELECT doc_id, (idx - 1) // 8 AS cidx,
                   string_agg(w, ' ' ORDER BY idx) AS unit
            FROM words
            GROUP BY doc_id, (idx - 1) // 8
            HAVING string_agg(w, ' ' ORDER BY idx) <> ''
        ),
        over_rep AS (
            SELECT unit FROM chunks GROUP BY unit HAVING COUNT(*) > 1
        ),
        drops AS (
            SELECT doc_id, cidx FROM chunks JOIN over_rep USING (unit)
        )
        SELECT c.doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN d.cidx IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               md5(COALESCE(string_agg(
                   CASE WHEN d.cidx IS NULL THEN c.unit END,
                   ' ' ORDER BY c.cidx), '')) AS rebuilt_md5
        FROM chunks c
        LEFT JOIN drops d ON c.doc_id = d.doc_id AND c.cidx = d.cidx
        GROUP BY c.doc_id
        ORDER BY c.doc_id
    """,
    tags=("llm-pipeline", "dedup", "curation", "c4-boilerplate"),
)
def dedup_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Dolma-style corpus-boilerplate stripping through the oracle gate:
    every 8-word chunk occurring more than once corpus-wide is removed
    from EVERY document, and documents are rebuilt from the survivors
    (C4's repeated-three-sentence-span rule re-expressed over fixed word
    windows; ``operators/dedup.remove_repeated_chunks``). Exact duplicate
    documents therefore strip each other bare — the rebuilt md5 certifies
    the reconstruction byte-for-byte, not just the drop counts.

    Scale shape: chunking and rebuild are map-side array lambdas; the
    corpus-wide count shuffles 16-byte hashes; drop decisions travel as
    (doc_id, chunk_idx) pairs. Document text never shuffles.
    """
    from paimon_presto_spark.operators.dedup import remove_repeated_chunks

    docs = load_table(spark, sf_dir, "documents")
    out = remove_repeated_chunks(docs, "doc_id", "text", chunk_words=8,
                                 max_count=1)
    # n_chunks > 0: the oracle's HAVING unit <> '' silently drops documents
    # with zero non-empty chunks (empty/whitespace-only text) before its
    # per-doc GROUP BY; mirror that here so both sides agree on such rows.
    return out.filter(F.col("n_chunks") > 0).select(
        "doc_id", "n_chunks", "n_removed",
        F.md5("rebuilt_text").alias("rebuilt_md5"),
    ).orderBy("doc_id")


@register(
    "split_assign_hash",
    oracle="""
        WITH assigned AS (
            SELECT source, n_chars,
                   CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) % 100 AS bucket
            FROM documents
        )
        SELECT source,
               CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'valid'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM assigned
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("llm-pipeline", "curation", "sampling", "train-test-split"),
)
def split_assign_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/valid/test assignment — the standard
    way a training pipeline splits a growing corpus so a document's split
    NEVER changes as data is added (row numbers or random() both reshuffle;
    a salted content-independent key hash does not). 90/5/5 via the
    portable md5 bucket from ``functions/hashing.py``; the salt makes
    independent splits (e.g. per experiment) uncorrelated.

    Pure map + one aggregation on (source, split) — the scan is the job at
    any scale; no UDFs, the bucket arithmetic runs in codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_long(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    return (
        docs.withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("bucket") < 90, "train")
            .when(F.col("bucket") < 95, "valid")
            .otherwise("test"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("source", "split")
    )


@register(
    "embedding_pca_project",
    oracle="""
        WITH vals AS (
            SELECT generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        per_dim AS (
            SELECT i, COUNT(*) AS n,
                   SUM(CAST(x AS DECIMAL(28,10))) AS s1,
                   SUM(CAST(x * x AS DECIMAL(28,10))) AS s2
            FROM vals GROUP BY i
        ),
        vars AS (
            SELECT CAST(CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                        AS DECIMAL(28,10)) AS v
            FROM per_dim
        ),
        tot AS (SELECT ROUND(CAST(SUM(v) AS DOUBLE), 4) AS t FROM vars)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_vecs,
               t AS total_var_raw,
               t AS total_var_projected
        FROM tot
    """,
    tags=("llm-pipeline", "embeddings", "pca", "linear-algebra"),
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA through the oracle gate via its conservation law:
    an orthogonal rotation preserves total variance, so projecting onto
    ALL principal components must reproduce the raw corpus variance
    EXACTLY — which SQL can compute without an eigendecomposition. The
    fit is one corpus scan of BLAS partials (count, Σx, ΣxxT per Arrow
    batch; ``operators/similarity.pca_components``), the d×d eigh runs on
    the driver (d bounded, corpus unbounded), and the projection is a
    second map-only matmul pass. A non-orthonormal basis, a dropped
    partial, or a mean-handling bug each break the equality at the 4th
    decimal. Both variance sides aggregate per-dim decimal sums (the
    repo's engine-portable determinism rule) before one double division.
    """
    from paimon_presto_spark.operators.similarity import pca_project

    DECV = "decimal(28,10)"
    emb = load_table(spark, sf_dir, "embeddings")

    def total_var(df: DataFrame, vec: str) -> DataFrame:
        vals = df.select(
            F.posexplode(F.col(vec)).alias("i", "xf")
        ).select("i", F.col("xf").cast("double").alias("x"))
        per_dim = vals.groupBy("i").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast(DECV)).alias("s1"),
            F.sum((F.col("x") * F.col("x")).cast(DECV)).alias("s2"),
        )
        var_i = (
            F.col("s2").cast("double") / F.col("n")
            - (F.col("s1").cast("double") / F.col("n"))
            * (F.col("s1").cast("double") / F.col("n"))
        )
        return per_dim.select(var_i.cast(DECV).alias("v"), "n").agg(
            F.round(F.sum("v").cast("double"), 4).alias("t"),
            F.max("n").alias("n"),
        )

    raw_row = total_var(emb, "embedding").collect()[0]
    raw, n_vecs = raw_row["t"], raw_row["n"]
    proj = pca_project(emb, "vec_id", "embedding", out_dim=64, dim=64)
    projected = total_var(proj, "proj").collect()[0]["t"]
    return spark.createDataFrame(
        [(n_vecs, raw, projected)],
        "n_vecs bigint, total_var_raw double, total_var_projected double",
    )


@register(
    "text_ngram_novelty",
    oracle="""
        WITH toks AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(tk) - 1, 1)),
                                         i -> tk[i] || ' ' || tk[i + 1] || ' '
                                              || tk[i + 2])) AS s
            FROM toks
        ),
        hashed AS (
            SELECT doc_id, CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT) AS h
            FROM sh
        ),
        first_seen AS (SELECT h, MIN(doc_id) AS fs FROM hashed GROUP BY h),
        per_doc AS (
            SELECT a.doc_id,
                   COUNT(*) AS n_shingles,
                   CAST(SUM(CASE WHEN f.fs = a.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel
            FROM hashed a JOIN first_seen f USING (h)
            GROUP BY a.doc_id
        )
        SELECT doc_id // 50 AS doc_bucket,
               CAST(SUM(n_shingles) AS BIGINT) AS n_shingles,
               CAST(SUM(n_novel) AS BIGINT) AS n_novel
        FROM per_doc
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("llm-pipeline", "curation", "novelty", "dedup-aware-sampling"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per ingestion position (doc_id order), how
    many of a document's 3-gram shingles were NEVER seen in any earlier
    document — the dedup-aware signal curation pipelines use to decide
    when a source is mined out (novelty ratios collapse as boilerplate
    accumulates). Two narrow shuffles: min(doc_id) per 60-bit shingle
    hash (first-seen owner), then one hash-keyed join back and a per-doc
    count — shingle STRINGS never shuffle (the hash-before-distinct rule
    every dedup operator here follows). Bucketed by 50 docs to keep the
    verified output compact; integer-only outputs.
    """
    from paimon_presto_spark.operators.dedup import shingle_hashes

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_hashes(docs, "doc_id", "text", 3)
    first_seen = sh.groupBy("h").agg(F.min("doc_id").alias("fs"))
    per_doc = (
        sh.join(first_seen, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("fs") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        per_doc.groupBy(F.expr("doc_id DIV 50").alias("doc_bucket"))
        .agg(
            F.sum("n_shingles").alias("n_shingles"),
            F.sum("n_novel").alias("n_novel"),
        )
        .orderBy("doc_bucket")
    )


@register(
    "select_token_budget",
    oracle="""
        WITH t AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS toks,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS score
            FROM documents
        ),
        r AS (
            SELECT *, SUM(toks) OVER (ORDER BY score DESC, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
            FROM t
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS n_tokens,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM r WHERE cum <= 30000
        GROUP BY source
        ORDER BY source
    """,
    tags=("llm-pipeline", "curation", "selection", "token-budget"),
)
def select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked corpus selection under a global token budget — the
    "take the best N-token subset" step of dataset assembly (quality
    score here: lexical diversity = distinct-word ratio; production
    plugs any scorer). The oracle states the obvious single-window
    running total; the Spark side computes the SAME selection with
    ``operators/selection.select_until_budget`` — score-range bucketing,
    driver prefix over per-bucket totals, exact window over the ONE
    cutoff bucket — because at 100 TB an unpartitioned
    ``SUM OVER (ORDER BY ...)`` serializes the corpus through one task.
    Budget arithmetic is all-integer (token counts), so the bucketed
    decomposition equals the oracle bit-for-bit; ties pin on doc_id.
    """
    from paimon_presto_spark.operators.selection import select_until_budget

    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(ws).cast("bigint").alias("toks"),
        (
            F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
        ).alias("score"),
    )
    sel = select_until_budget(
        scored, score_col="score", weight_col="toks",
        budget=30000, id_col="doc_id",
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("source")
    )


@register(
    "text_phrase_search",
    oracle="""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ),
        m AS (
            SELECT a.term || ' ' || b.term AS phrase, a.doc_id,
                   COUNT(*) AS n
            FROM words a
            JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            WHERE (a.term = 'table' AND b.term = 'scan')
               OR (a.term = 'key' AND b.term = 'order')
            GROUP BY 1, 2
        )
        SELECT phrase,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS n_matches,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM m
        GROUP BY phrase
        ORDER BY phrase
    """,
    tags=("llm-pipeline", "text-search", "inverted-index", "phrase"),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index + exact phrase queries
    (``operators/text.posting_lists`` / ``phrase_match``): postings are
    (term, doc, pos) triples — the shuffle carries terms and two
    integers, never documents — and each phrase resolves as term-pruned
    posting-list equi-joins on (doc, pos-offset), the standard
    phrase-query plan of search engines. Two phrases are probed; the
    report is integer-only (doc counts, match counts, id checksum)."""
    from paimon_presto_spark.operators.text import phrase_match, posting_lists

    docs = load_table(spark, sf_dir, "documents")
    post = posting_lists(docs).cache()
    out = None
    for phrase in (["key", "order"], ["table", "scan"]):
        m = phrase_match(post, phrase).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_matches").alias("n_matches"),
            F.sum("doc_id").alias("id_checksum"),
        ).select(F.lit(" ".join(phrase)).alias("phrase"), "*")
        out = m if out is None else out.unionByName(m)
    # a phrase with zero matching documents emits NO row (the oracle's
    # GROUP BY has nothing to group); without this filter the global agg
    # would emit (phrase, 0, NULL, NULL) and diverge
    return out.filter(F.col("n_docs") > 0).orderBy("phrase")


@register(
    "dedup_cdc_chunks",
    oracle="""
        WITH sp AS (
            SELECT doc_id, string_split(text, ' ') AS arr FROM documents
        ),
        words AS (
            SELECT doc_id, unnest(arr) AS w,
                   generate_subscripts(arr, 1) AS idx
            FROM sp
        ),
        flags AS (
            SELECT doc_id, w, idx,
                   CASE WHEN CAST('0x' || substr(md5(w), 32, 1) AS BIGINT)
                             % 4 = 0
                        THEN 1 ELSE 0 END AS b
            FROM words
        ),
        cids AS (
            SELECT doc_id, w, idx,
                   COALESCE(SUM(b) OVER (
                       PARTITION BY doc_id ORDER BY idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cid
            FROM flags
        ),
        chunks AS (
            SELECT doc_id, cid, string_agg(w, ' ' ORDER BY idx) AS unit
            FROM cids GROUP BY doc_id, cid
            HAVING string_agg(w, ' ' ORDER BY idx) <> ''
        ),
        over_rep AS (
            SELECT unit FROM chunks GROUP BY unit HAVING COUNT(*) > 1
        ),
        drops AS (
            SELECT doc_id, cid FROM chunks JOIN over_rep USING (unit)
        )
        SELECT c.doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN d.cid IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               md5(COALESCE(string_agg(
                   CASE WHEN d.cid IS NULL THEN c.unit END,
                   ' ' ORDER BY c.cid), '')) AS rebuilt_md5
        FROM chunks c
        LEFT JOIN drops d ON c.doc_id = d.doc_id AND c.cid = d.cid
        GROUP BY c.doc_id
        ORDER BY c.doc_id
    """,
    tags=("llm-pipeline", "dedup", "curation", "content-defined-chunking"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunk boilerplate removal through the oracle gate
    (``operators/dedup.remove_repeated_chunks_cdc``): chunk boundaries
    fall after words whose portable hash ≡ 0 (mod 4) — the rsync/FastCDC
    idea at word granularity — so boilerplate repeated at DIFFERENT word
    offsets across documents still chunks identically and is caught,
    the case ``dedup_boilerplate_chunks``'s fixed windows structurally
    miss. Every chunk occurring more than once corpus-wide is dropped
    from every document; the md5 of each rebuilt document certifies the
    reconstruction byte-for-byte. The oracle restates the map-side HOF
    chunking as the equivalent window program (boundary-count chunk ids
    over exploded words).

    This is the hash-gated PORTABLE twin (``boundary_hash='md5'`` — one
    digest hex digit, replayable in DuckDB). Production defaults to the
    cheaper engine-native ``xxhash64`` boundary; the sf1 scale stress
    times that rung (``bench._cdc_chunks_sf1_xxhash``).
    """
    from paimon_presto_spark.operators.dedup import remove_repeated_chunks_cdc

    docs = load_table(spark, sf_dir, "documents")
    out = remove_repeated_chunks_cdc(docs, "doc_id", "text",
                                     boundary_mod=4, max_count=1,
                                     boundary_hash="md5")
    # n_chunks > 0: same zero-chunk-document agreement rule as
    # dedup_boilerplate_chunks (the oracle's HAVING drops such docs)
    return out.filter(F.col("n_chunks") > 0).select(
        "doc_id", "n_chunks", "n_removed",
        F.md5("rebuilt_text").alias("rebuilt_md5"),
    ).orderBy("doc_id")


@register(
    "text_gopher_quality",
    oracle="""
        WITH d AS (
            SELECT doc_id, source, text,
                   string_split(text, ' ') AS arr
            FROM documents
        ),
        m AS (
            SELECT doc_id, source,
                   len(arr) AS n_words,
                   length(replace(text, ' ', '')) / len(arr) AS mean_len,
                   ((len(string_split(text, '#')) - 1)
                    + (len(string_split(text, '...')) - 1))
                   / CAST(len(arr) AS DOUBLE) AS sym_ratio,
                   len(list_filter(arr, w -> regexp_matches(w, '[A-Za-z]')))
                   / CAST(len(arr) AS DOUBLE) AS alpha_ratio,
                   len(list_intersect(
                       arr, ['the','a','of','to','and','is','in']
                   )) AS stop_hits
            FROM d
        ),
        f AS (
            SELECT doc_id, source,
                   CAST(NOT (n_words BETWEEN 30 AND 100000) AS INT) AS f_wc,
                   CAST(NOT (mean_len BETWEEN 3.0 AND 10.0) AS INT) AS f_ml,
                   CAST(sym_ratio >= 0.1 AS INT) AS f_sym,
                   CAST(alpha_ratio < 0.8 AS INT) AS f_alpha,
                   CAST(stop_hits < 2 AS INT) AS f_stop
            FROM m
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN f_wc + f_ml + f_sym + f_alpha + f_stop = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               CAST(SUM(f_wc) AS BIGINT) AS fail_word_count,
               CAST(SUM(f_ml) AS BIGINT) AS fail_mean_word_len,
               CAST(SUM(f_sym) AS BIGINT) AS fail_symbol_ratio,
               CAST(SUM(f_alpha) AS BIGINT) AS fail_alpha_words,
               CAST(SUM(f_stop) AS BIGINT) AS fail_stopword_hits,
               CAST(SUM(CASE WHEN f_wc + f_ml + f_sym + f_alpha + f_stop = 0
                             THEN doc_id ELSE 0 END) AS BIGINT) AS id_checksum
        FROM f
        GROUP BY source
        ORDER BY source
    """,
    tags=("llm-pipeline", "text", "quality", "gopher-rules"),
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules with per-rule attribution
    (``operators/text.gopher_quality_rules``; rule family per Rae et al.
    2021 §A1.1): each document gets a fail bitmask over five rules
    (word-count bounds, mean-word-length bounds, symbol ratio, alphabetic
    -word ratio, stopword hits), and the report aggregates per-source
    keep rates and per-rule failure counts — the "why was this dropped"
    attribution a single keep/drop score cannot give. Pure map + one
    integer-only groupBy; the oracle restates each rule in DuckDB's list
    dialect. Thresholds are tuned to the test corpus's word-count range
    (30..100k words, >=2 distinct function words) so the split exercises
    both keep and every-rule-fail paths.
    """
    from paimon_presto_spark.operators.text import gopher_quality_rules

    docs = load_table(spark, sf_dir, "documents")
    rules = gopher_quality_rules(docs, min_words=30)
    joined = rules.join(docs.select("doc_id", "source"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long").alias("n_keep"),
            F.sum(F.when(F.col("fail_mask").bitwiseAND(1) > 0, 1).otherwise(0))
            .cast("long").alias("fail_word_count"),
            F.sum(F.when(F.col("fail_mask").bitwiseAND(2) > 0, 1).otherwise(0))
            .cast("long").alias("fail_mean_word_len"),
            F.sum(F.when(F.col("fail_mask").bitwiseAND(4) > 0, 1).otherwise(0))
            .cast("long").alias("fail_symbol_ratio"),
            F.sum(F.when(F.col("fail_mask").bitwiseAND(8) > 0, 1).otherwise(0))
            .cast("long").alias("fail_alpha_words"),
            F.sum(F.when(F.col("fail_mask").bitwiseAND(16) > 0, 1).otherwise(0))
            .cast("long").alias("fail_stopword_hits"),
            F.sum(F.when(F.col("keep"), F.col("doc_id")).otherwise(F.lit(0)))
            .cast("long").alias("id_checksum"),
        )
        .orderBy("source")
    )


@register(
    "sample_priority_weighted",
    oracle="""
        WITH h AS (
            SELECT doc_id, n_chars,
                   CAST(n_chars AS DOUBLE)
                   / ((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                            AS BIGINT) + 1) / 1152921504606846976.0)
                       AS pri
            FROM documents
            WHERE n_chars > 0
        ),
        r AS (
            SELECT doc_id, n_chars, pri,
                   ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id ASC) AS rnk
            FROM h
        )
        SELECT doc_id, n_chars, ROUND(pri, 4) AS priority, rnk
        FROM r WHERE rnk <= 50
        ORDER BY rnk
    """,
    tags=("sampling", "weighted", "priority", "curation", "topk"),
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (``operators/selection.py:priority_sample``): 50 documents drawn with
    probability proportional to ``n_chars``, no repeats — the data-mixing
    primitive for upweighting long/high-quality documents while keeping
    the sample a set. Priorities are w/u with hash-derived u, so the
    sample is reproducible across engines and cluster sizes; only IEEE
    correctly-rounded ops (casts + divisions) touch the priority, which
    is what lets DuckDB replay the exact ranking. The top-k runs as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    from paimon_presto_spark.operators.selection import priority_sample

    d = load_table(spark, sf_dir, "documents")
    out = priority_sample(d.select("doc_id", "n_chars"), "n_chars", 50, "doc_id")
    return out.select(
        "doc_id", "n_chars", F.round("priority", 4).alias("priority"), "rnk"
    ).orderBy("rnk")


@register(
    "dedup_intra_doc_chunks",
    oracle="""
        WITH words AS (
            SELECT doc_id, t.u.w AS w, t.u.i AS i
            FROM (
                SELECT doc_id,
                       LIST_TRANSFORM(string_split(text, ' '),
                                      (x, i) -> {'i': i, 'w': x}) AS iw
                FROM documents
            ) s, UNNEST(s.iw) AS t(u)
        ),
        chunks AS (
            SELECT doc_id,
                   CAST(FLOOR((i - 1) / 4) AS BIGINT) AS cidx,
                   STRING_AGG(w, ' ' ORDER BY i) AS chunk
            FROM words
            GROUP BY doc_id, FLOOR((i - 1) / 4)
        ),
        nonempty AS (SELECT * FROM chunks WHERE chunk <> ''),
        firsts AS (
            SELECT doc_id, cidx, chunk,
                   MIN(cidx) OVER (PARTITION BY doc_id, chunk) AS first_cidx
            FROM nonempty
        )
        SELECT doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN cidx <> first_cidx THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               md5(STRING_AGG(chunk, ' ' ORDER BY cidx)
                   FILTER (WHERE cidx = first_cidx)) AS rebuilt_md5
        FROM firsts
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("dedup", "intra-doc", "self-dedup", "map-only", "curation"),
)
def dedup_intra_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-chunk removal
    (``operators/dedup.py:remove_repeated_chunks_within_doc``): every
    4-word chunk that already occurred earlier in the SAME document is
    dropped, first occurrence kept — Dolma-style self-dedup, the cheapest
    dedup rung (a pure map: zero shuffles, zero joins; the first-
    occurrence test runs against the document's own bounded chunk list).
    The md5 of each rebuilt document certifies the reconstruction; the
    oracle restates the HOF chunking as the window program over exploded
    words. Degenerate docs (zero nonempty chunks) are excluded on BOTH
    sides: the oracle's GROUP BY over the nonempty CTE drops them
    implicitly; the Spark side filters text != '' on the INPUT — exactly
    equivalent, because a chunk is empty only when its slice is the
    single empty token of an empty string (a whitespace-only doc's chunk
    is the space-JOINED empties — nonempty, and both engines KEEP it) —
    and pushed to the scan, where a post-hoc n_chunks > 0 filter would
    push below the projection and re-evaluate the chunking HOF twice
    (measured 1.8x on the whole entry)."""
    from paimon_presto_spark.operators.dedup import (
        remove_repeated_chunks_within_doc,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text") != ""
    )
    out = remove_repeated_chunks_within_doc(
        docs, "doc_id", "text", chunk_words=4
    )
    return out.select(
        "doc_id", "n_chunks", "n_removed",
        F.md5("rebuilt_text").alias("rebuilt_md5"),
    ).orderBy("doc_id")


@register(
    "mix_domain_reweight",
    oracle="""
        WITH s AS (
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents
            GROUP BY source
        ),
        m AS (
            SELECT MIN(n_tokens) AS mn,
                   CAST(SUM(n_tokens) AS BIGINT) AS tot
            FROM s
        )
        SELECT s.source, s.n_docs, s.n_tokens,
               ROUND(CAST(s.n_tokens AS DOUBLE) / CAST(m.tot AS DOUBLE), 6)
                   AS token_share,
               ROUND(CAST(m.mn AS DOUBLE) / CAST(s.n_tokens AS DOUBLE), 6)
                   AS accept_prob
        FROM s, m
        ORDER BY s.source
    """,
    tags=("mixing", "domain", "reweight", "curation", "aggregate"),
)
def mix_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: per-source token counts and the
    DOWNSAMPLING acceptance probability that equalizes post-filter token
    share across sources — accept_prob(s) = min_tokens / tokens(s), the
    largest feasible uniform target when upsampling is off the table
    (a filter pipeline can only drop). Composes with
    ``sample_priority_weighted`` / ``split_assign_hash``: accept a doc
    iff its portable hash-uniform < accept_prob(source).

    100 TB shape: ONE map-side-combined aggregation keyed by source
    (domain cardinality is tiny), a single-row global reduction
    broadcast back — the corpus is scanned once and never shuffled."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    m = s.agg(
        F.min("n_tokens").alias("mn"),
        F.sum("n_tokens").cast("long").alias("tot"),
    )
    return (
        s.crossJoin(F.broadcast(m))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("tot").cast("double"), 6
            ).alias("token_share"),
            F.round(
                F.col("mn").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("accept_prob"),
        )
        .orderBy("source")
    )


@register(
    "text_quality_logreg",
    oracle="""
        WITH d AS (
            SELECT doc_id, text, string_split(text, ' ') AS arr
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(arr) AS n_words,
                   length(replace(text, ' ', '')) / len(arr) AS mean_len,
                   ((len(string_split(text, '#')) - 1)
                    + (len(string_split(text, '...')) - 1))
                   / CAST(len(arr) AS DOUBLE) AS sym_ratio,
                   len(list_filter(arr, w -> regexp_matches(w, '[A-Za-z]')))
                   / CAST(len(arr) AS DOUBLE) AS alpha_ratio,
                   len(list_intersect(
                       arr, ['the','a','of','to','and','is','in']
                   )) AS stop_hits
            FROM d
        ),
        z AS (
            SELECT doc_id, n_words,
                   GREATEST(
                       -3.0
                       + 0.4 * CAST(CAST(CAST(LN(1.0 + n_words)
                             AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE)
                       + 0.15 * mean_len
                       + 1.5 * alpha_ratio
                       + 0.5 * stop_hits
                       + -8.0 * sym_ratio,
                       -40.0
                   ) AS z
            FROM m
        ),
        p AS (
            SELECT doc_id, n_words,
                   1.0 / (1.0 + CAST(CAST(CAST(EXP(-z)
                       AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE)) AS prob
            FROM z
        )
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               ROUND(prob, 6) AS quality_prob,
               CAST(prob >= 0.5 AS INT) AS kept
        FROM p
        ORDER BY doc_id
    """,
    tags=("llm-pipeline", "text", "quality", "classifier", "logreg"),
)
def text_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (``operators/text.py:
    quality_logreg_score``): a logistic-regression head over the Gopher
    feature vector scores every document and thresholds at p >= 0.5 —
    the classifier-filter stage of FineWeb-Edu / DCLM-style curation,
    with fixed documented weights standing in for a trained head (the
    plumbing — featurize → linear score → sigmoid → threshold, all
    codegen, zero UDFs, zero shuffles — is what must scale, and it is
    identical either way). Both transcendentals (ln, exp) pass through
    the registry's decimal squeeze so DuckDB replays the probabilities
    bit-for-bit."""
    from paimon_presto_spark.operators.text import quality_logreg_score

    docs = load_table(spark, sf_dir, "documents")
    out = quality_logreg_score(docs)
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round("quality_prob", 6).alias("quality_prob"),
        "kept",
    ).orderBy("doc_id")


@register(
    "text_bigram_perplexity",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ),
        bi AS (
            SELECT doc_id,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                                         i -> tk[i])) AS w1,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                                         i -> tk[i + 1])) AS w2
            FROM toks
        ),
        bc AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
        cc AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bc GROUP BY w1),
        v AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vsize
            FROM toks, UNNEST(tk) AS t(w)
        ),
        scored AS (
            SELECT bi.doc_id,
                   CAST(LN((bc.c2 + 0.5) / (cc.c1 + 0.5 * v.vsize))
                        AS DECIMAL(28,10)) AS lp
            FROM bi
            JOIN bc ON bi.w1 = bc.w1 AND bi.w2 = bc.w2
            JOIN cc ON bi.w1 = cc.w1, v
        ),
        agg AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) AS logprob_sum
            FROM scored
            WHERE doc_id < 40
            GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams, logprob_sum,
               ROUND(CAST(CAST(CAST(EXP(-(logprob_sum / n_bigrams))
                   AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE), 6)
                   AS perplexity
        FROM agg
        ORDER BY doc_id
    """,
    tags=("text", "quality", "language-model", "bigram", "perplexity"),
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity per document (add-0.5-smoothed
    p(w_i | w_{i-1}) estimated from the corpus itself) — one modeling
    rung above ``text_unigram_logprob``: word-ORDER quality now counts,
    so shuffled-word soup that fools a unigram model scores high
    perplexity here. The KenLM-style perplexity filter of CCNet/FineWeb
    pipelines, at n=2 and with the neural parts removed.

    Scale shape: bigram extraction is a pure map (an index-zip over the
    doc's own token array — no self-join, no window); BOTH model tables
    shuffle-join, never broadcast: the bigram table c(w1,w2) is
    vocabulary² and the context table c(w1) is vocabulary¹ — on a
    web-scale corpus the raw token vocabulary (typos, junk, numbers)
    runs to 10⁸+ entries, a multi-GB broadcast that OOMs the driver
    (round-6 verdict). The token stream is already hash-partitioned on
    w1-bearing keys from the count aggregations, so the w1 join reuses
    that shuffle; AQE still broadcasts a small model when it measures
    small. (The alternative — frequency-capping the modeled vocabulary
    KenLM/CCNet-style — bounds the table by construction; not needed
    once nothing is broadcast.) Per-doc decimal sums combine map-side.
    The corpus text never shuffles.

    Determinism: counts are exact integers; the smoothed probability is
    one correctly-rounded division (0.5*V is exact); both ln() and the
    final exp() pass through DECIMAL(28,10).
    """
    d = load_table(spark, sf_dir, "documents")
    # Project the token array FIRST (functions/text.py:shingle_array rule):
    # an inlined split re-evaluates once per transform element inside the
    # HOF lambda — O(len²) splitting per document.
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("__tk"))
    arr = F.col("__tk")
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.struct(
                F.element_at(arr, i).alias("w1"),
                F.element_at(arr, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    bi = toks.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cc = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vsize = (
        toks.select(F.explode(arr).alias("w")).select("w").distinct().count()
    )
    scored = (
        bi.join(bc, ["w1", "w2"])
        .join(cc, "w1")
        .withColumn(
            "lp",
            F.log(
                (F.col("c2") + F.lit(0.5))
                / (F.col("c1") + F.lit(0.5) * F.lit(float(vsize)))
            ).cast("decimal(28,10)"),
        )
    )
    agg = (
        scored.filter(F.col("doc_id") < 40)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp").cast("string").cast("double").alias("logprob_sum"),
        )
    )
    ppl = decimal_squeeze(
        F.exp(-(F.col("logprob_sum") / F.col("n_bigrams")))
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "logprob_sum",
        F.round(ppl, 6).alias("perplexity"),
    ).orderBy("doc_id")


@register(
    "sample_priority_per_source",
    oracle="""
        WITH h AS (
            SELECT source, doc_id, n_chars,
                   CAST(n_chars AS DOUBLE)
                   / ((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                            AS BIGINT) + 1) / 1152921504606846976.0)
                       AS pri
            FROM documents
            WHERE n_chars > 0
        ),
        r AS (
            SELECT source, doc_id, n_chars, pri,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY pri DESC, doc_id ASC) AS rnk
            FROM h
        )
        SELECT source, doc_id, n_chars, ROUND(pri, 4) AS priority, rnk
        FROM r WHERE rnk <= 3
        ORDER BY source, rnk
    """,
    tags=("sampling", "weighted", "priority", "per-group", "mixing"),
)
def sample_priority_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain weighted sampling without replacement
    (``operators/selection.py:priority_sample_per_group``): 3 documents
    PER SOURCE drawn with probability proportional to ``n_chars`` — the
    quota-per-domain mixing primitive (every source keeps representation;
    heavy documents are proportionally likelier within theirs), next to
    the global top-k of ``sample_priority_weighted``. Same hash-derived
    priorities, so DuckDB replays the exact ranking; the per-group top-k
    runs as a WindowGroupLimit-pruned rank window — per-partition heaps
    per group, the exchange never carries the corpus."""
    from paimon_presto_spark.operators.selection import (
        priority_sample_per_group,
    )

    d = load_table(spark, sf_dir, "documents")
    out = priority_sample_per_group(
        d.select("source", "doc_id", "n_chars"), "n_chars", 3, "doc_id",
        ["source"],
    )
    return out.select(
        "source", "doc_id", "n_chars",
        F.round("priority", 4).alias("priority"), "rnk",
    ).orderBy("source", "rnk")


@register(
    "text_vocab_stats",
    oracle="""
        WITH words AS (
            SELECT doc_id, w AS wd
            FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
            WHERE w <> ''
        ),
        vocab AS (
            SELECT wd, CAST(COUNT(*) AS BIGINT) AS cnt FROM words GROUP BY wd
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax,
                   CAST(MAX(cnt) AS BIGINT) AS top_freq
            FROM vocab
        )
        SELECT n_tokens, n_types, n_hapax,
               ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
                   AS type_token_ratio,
               ROUND(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
                   AS hapax_fraction,
               ROUND(CAST(top_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
                   AS top_token_share
        FROM tot
    """,
    tags=("text", "vocabulary", "zipf", "corpus-stats", "analysis"),
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary health audit: token count, type count (distinct
    vocabulary), hapax-legomena fraction (types occurring once — the
    noise/typo tail that OOM-sizes naive vocabulary broadcasts), and the
    top token's corpus share — the Zipf sanity numbers a curation
    pipeline checks before/after cleaning (a junk-heavy crawl shows
    hapax_fraction near 1; boilerplate-heavy shows a fat top_token_share).

    Scale shape: ONE (word-hashless, count-only) aggregation to
    vocabulary size, then ONE reduction to a single row; exact integer
    counts, two exact double divisions. The corpus text never shuffles —
    only (word, count) partials. All derived ratios divide identical
    values in both engines."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(F.split("text", " ")).alias("wd")).filter(
        F.col("wd") != ""
    )
    vocab = w.groupBy("wd").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("n_hapax"),
        F.max("cnt").alias("top_freq"),
    )
    return tot.select(
        "n_tokens", "n_types", "n_hapax",
        F.round(
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("type_token_ratio"),
        F.round(
            F.col("n_hapax").cast("double") / F.col("n_types").cast("double"),
            6,
        ).alias("hapax_fraction"),
        F.round(
            F.col("top_freq").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("top_token_share"),
    )


@register(
    "text_trigram_backoff",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ),
        tri AS (
            SELECT doc_id,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                                         i -> tk[i])) AS w1,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                                         i -> tk[i + 1])) AS w2,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                                         i -> tk[i + 2])) AS w3
            FROM toks
        ),
        bi AS (
            SELECT doc_id,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                                         i -> tk[i])) AS w1,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                                         i -> tk[i + 1])) AS w2
            FROM toks
        ),
        tc AS (
            SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri
            WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3
        ),
        c12 AS (
            SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12 FROM tc
            GROUP BY w1, w2
        ),
        bc AS (
            SELECT w1 AS b1, w2 AS b2, COUNT(*) AS c2 FROM bi
            WHERE doc_id % 2 = 0 GROUP BY w1, w2
        ),
        c1 AS (
            SELECT b1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bc GROUP BY b1
        ),
        uni AS (
            SELECT w, COUNT(*) AS cu
            FROM toks, UNNEST(tk) AS t(w)
            WHERE doc_id % 2 = 0 GROUP BY w
        ),
        nv AS (
            SELECT CAST(SUM(cu) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM uni
        ),
        scored AS (
            SELECT tri.doc_id,
                   CAST(LN(CASE
                       WHEN tc.c3 IS NOT NULL
                           THEN CAST(tc.c3 AS DOUBLE) / c12.c12
                       WHEN bc.c2 IS NOT NULL
                           THEN CAST(0.4 AS DOUBLE)
                                * (CAST(bc.c2 AS DOUBLE) / c1.c1)
                       ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
                            * ((COALESCE(uni.cu, 0) + 0.5)
                               / (nv.n + 0.5 * nv.v))
                   END) AS DECIMAL(28,10)) AS lp
            FROM tri
            LEFT JOIN tc ON tri.w1 = tc.w1 AND tri.w2 = tc.w2
                        AND tri.w3 = tc.w3
            LEFT JOIN c12 ON tri.w1 = c12.w1 AND tri.w2 = c12.w2
            LEFT JOIN bc ON tri.w2 = bc.b1 AND tri.w3 = bc.b2
            LEFT JOIN c1 ON tri.w2 = c1.b1
            LEFT JOIN uni ON tri.w3 = uni.w
            CROSS JOIN nv
            WHERE tri.doc_id % 2 = 1 AND tri.doc_id < 80
        ),
        agg AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_trigrams,
                   CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) AS logprob_sum
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_trigrams, logprob_sum,
               ROUND(CAST(CAST(CAST(EXP(-(logprob_sum / n_trigrams))
                   AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE), 6)
                   AS perplexity
        FROM agg
        ORDER BY doc_id
    """,
    tags=("text", "quality", "language-model", "trigram", "backoff"),
)
def text_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff perplexity on HELD-OUT documents — the
    modeling rung above ``text_bigram_perplexity``, and the first entry
    where the model corpus and the scored corpus are disjoint (train =
    even doc_ids, score = odd doc_ids < 80), so the backoff chain
    actually fires: a scored trigram unseen in training falls back to
    the training bigram at the stupid-backoff discount (0.4, Brants et
    al., "Large Language Models in Machine Translation", EMNLP 2007),
    then to the add-0.5-smoothed training unigram at 0.4^2. Stupid
    backoff is THE web-scale n-gram scheme precisely because its
    statistics are raw counts (no Kneser-Ney continuation counts), so
    every model table is a combiner-friendly COUNT aggregation.

    Scale shape: trigram/bigram extraction is a map-side index-zip (no
    self-join); the context totals (c12, c1) pre-join onto the MODEL
    side, so the corpus-sized scoring stream shuffles exactly THREE
    times (trigram / bigram / unigram keys) instead of five; every model
    join is a SHUFFLE — never broadcast (a web corpus's raw trigram
    table is far past driver memory; round-6 verdict rule) — and AQE may
    still broadcast small ones at test scale; the single-row (N, V)
    scalar rides a driver literal exactly like
    ``text_bigram_perplexity``'s vocabulary size. Per-doc decimal sums
    combine map-side; corpus text never shuffles.

    Determinism: counts are exact integers; each CASE arm is written
    with identical operation order in both engines (one correctly-
    rounded division, then exact-literal multiplies); ln/exp pass
    through DECIMAL(28,10); the backoff ARM CHOICE is an integer
    NULL-test, so the selected formula can never differ cross-engine.
    """
    d = load_table(spark, sf_dir, "documents")
    # Project the token array FIRST (functions/text.py:shingle_array rule):
    # inlined, the split re-evaluates for every element_at inside the HOF
    # lambda — n splits per gram position, O(len²) per document.
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("__tk"))
    arr = F.col("__tk")

    def ngrams(n: int) -> DataFrame:
        fields = lambda i: [  # noqa: E731
            F.element_at(arr, i + j).alias(f"w{j + 1}") for j in range(n)
        ]
        grams = F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - (n - 1)),
                lambda i: F.struct(*fields(i)),
            ),
        ).otherwise(F.array())
        return toks.select("doc_id", F.explode(grams).alias("g")).select(
            "doc_id", *[F.col(f"g.w{j + 1}").alias(f"w{j + 1}") for j in range(n)]
        )

    train = F.col("doc_id") % 2 == 0
    tri, bi = ngrams(3), ngrams(2)
    tc = tri.filter(train).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c3")
    )
    c12 = tc.groupBy("w1", "w2").agg(F.sum("c3").alias("c12"))
    bc = (
        bi.filter(train)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .select(F.col("w1").alias("b1"), F.col("w2").alias("b2"), "c2")
    )
    c1 = bc.groupBy("b1").agg(F.sum("c2").alias("c1"))
    uni = (
        toks.filter(train)
        .select(F.explode(arr).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    # empty-train guard: SUM over zero rows is NULL — degrade to the
    # oracle's NULL-score shape instead of a driver TypeError
    _nv = uni.agg(F.sum("cu"), F.count(F.lit(1))).collect()[0]
    n_tokens, v_size = int(_nv[0] or 0), int(_nv[1] or 0)
    # Pre-join the context totals onto the MODEL side so the corpus-sized
    # trigram stream shuffles 3 times, not 5: c12 is only read when the
    # trigram hit (first arm) and c1 only when the bigram hit (second
    # arm), so attaching them to tc/bc rows loses nothing — the stream
    # side is the one that outgrows everything at 100 TB, the model-side
    # prejoins are vocabulary-bounded.
    tm = tc.join(c12, ["w1", "w2"])
    bm = bc.join(c1, "b1")
    s = (
        tri.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 80))
        .join(tm, ["w1", "w2", "w3"], "left")
        .join(bm, (F.col("w2") == F.col("b1")) & (F.col("w3") == F.col("b2")), "left")
        .join(uni, F.col("w3") == F.col("w"), "left")
    )
    prob = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("c12"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.lit(0.4) * (F.col("c2").cast("double") / F.col("c1")),
        )
        .otherwise(
            F.lit(0.4)
            * F.lit(0.4)
            * (
                (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(0.5))
                / F.lit(float(n_tokens) + 0.5 * float(v_size))
            )
        )
    )
    agg = (
        s.withColumn("lp", F.log(prob).cast("decimal(28,10)"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("lp").cast("string").cast("double").alias("logprob_sum"),
        )
    )
    ppl = decimal_squeeze(F.exp(-(F.col("logprob_sum") / F.col("n_trigrams"))))
    return agg.select(
        "doc_id",
        "n_trigrams",
        "logprob_sum",
        F.round(ppl, 6).alias("perplexity"),
    ).orderBy("doc_id")


HH_SALTS = 8
HH_MIN_COUNT = 50
HH_SHARE_DIV = 2000


@register(
    "text_heavy_hitters",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, w AS wd
            FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
            WHERE w <> ''
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM words),
        c AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM words GROUP BY wd)
        SELECT wd, cnt,
               ROUND(CAST(cnt AS DOUBLE) / tot.n, 6) AS share
        FROM c, tot
        WHERE cnt >= GREATEST({HH_MIN_COUNT}, tot.n // {HH_SHARE_DIV})
        ORDER BY cnt DESC, wd
    """,
    tags=("text", "heavy-hitters", "frequency", "two-phase", "skew"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy-hitter tokens (count >= max(50, N/2000)) via the
    two-phase threshold-pruned shape — the candidate-generation pass that
    frequency-caps a vocabulary before LM scoring
    (``text_bigram_perplexity``'s KenLM-style cap) or seeds stopword
    lists.

    Scale shape — why not one ``GROUP BY token``: on a web corpus the
    token key space is 10^8+ with catastrophic skew (a top token can be
    10^10 rows — one hot reducer). Phase 1 counts (salt, token) partials
    with ``salt = doc_id % 8``, so a hot key is split 8 ways and the
    combiner absorbs it map-side. The PIGEONHOLE cut then prunes: any
    token with global count >= T has some salt-partial >= ceil(T/8), so
    tokens whose every partial is below that bound can never be heavy —
    at web scale that discards ~all of the vocabulary long tail before
    anything global happens. Phase 2 re-sums ONLY the surviving
    candidates' partials (a semi-join against a candidate set bounded by
    8*N/T keys BY CONSTRUCTION — broadcast-safe at any corpus size,
    unlike a vocabulary table) and applies the exact threshold. No false
    negatives (pigeonhole), no false positives (exact recount): the
    output equals the naive GROUP BY, which is what the oracle runs.

    Determinism: integer counts end-to-end; one rounded division for the
    share column; the threshold max(50, N // 2000) uses integer floor
    division in both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        (F.col("doc_id") % HH_SALTS).alias("salt"),
        F.explode(F.split("text", " ")).alias("wd"),
    ).filter(F.col("wd") != "")
    p1 = w.groupBy("salt", "wd").agg(F.count(F.lit(1)).alias("cnt"))
    total = int(p1.agg(F.sum("cnt")).collect()[0][0] or 0)
    threshold = max(HH_MIN_COUNT, total // HH_SHARE_DIV)
    # integer ceiling — float division would break the pigeonhole bound
    # (and the integer-math-end-to-end claim) once threshold nears 2^53
    cands = (
        p1.filter(F.col("cnt") >= -(-threshold // HH_SALTS))
        .select("wd")
        .distinct()
    )
    exact = (
        p1.join(F.broadcast(cands), "wd", "leftsemi")
        .groupBy("wd")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
    return exact.select(
        "wd",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.lit(float(total)), 6).alias(
            "share"
        ),
    ).orderBy(F.desc("cnt"), F.asc("wd"))


PR_DAMP = "0.85"
PR_BASE = "0.15"
PR_ITERS = 3


def _oracle_pagerank(iters: int = PR_ITERS) -> str:
    """DuckDB oracle for fixed-iteration weighted PageRank over the token
    transition (bigram) graph, with dangling-mass redistribution. Each
    iteration's ranks pass through DECIMAL(28,10) so both engines carry
    IDENTICAL doubles into the next iteration."""
    sql = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        ),
        bi AS (
            SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                                         i -> tk[i])) AS w1,
                   UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk)),
                                         i -> tk[i + 1])) AS w2
            FROM toks
        ),
        e AS (
            SELECT w1, w2, COUNT(*) AS c2 FROM bi
            WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2
        ),
        outd AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM e GROUP BY w1),
        nodes AS (
            SELECT w FROM (
                SELECT w1 AS w FROM e UNION SELECT w2 AS w FROM e
            ) GROUP BY w
        ),
        nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        pr0 AS (
            SELECT w, CAST(CAST(CAST(1.0 / nv.n AS DECIMAL(28,10))
                AS VARCHAR) AS DOUBLE) AS pr
            FROM nodes, nv
        )"""
    for t in range(1, iters + 1):
        p = t - 1
        sql += f""",
        dang{p} AS (
            SELECT CAST(CAST(CAST(COALESCE(SUM(
                       CAST(pr0_.pr AS DECIMAL(28,10))), 0)
                AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE) AS m
            FROM pr{p} pr0_
            LEFT JOIN outd ON pr0_.w = outd.w1
            WHERE outd.w1 IS NULL
        ),
        contrib{t} AS (
            SELECT e.w2 AS w,
                   CAST(CAST(CAST(SUM(CAST(
                       p_.pr * (CAST(e.c2 AS DOUBLE) / outd.c1)
                   AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS VARCHAR)
                       AS DOUBLE) AS s
            FROM e
            JOIN outd ON e.w1 = outd.w1
            JOIN pr{p} p_ ON e.w1 = p_.w
            GROUP BY e.w2
        ),
        pr{t} AS (
            SELECT nodes.w,
                   CAST(CAST(CAST(
                       CAST({PR_BASE} AS DOUBLE) / nv.n
                       + CAST({PR_DAMP} AS DOUBLE)
                         * (COALESCE(contrib{t}.s, 0)
                            + dang{p}.m / nv.n)
                   AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE) AS pr
            FROM nodes
            LEFT JOIN contrib{t} ON nodes.w = contrib{t}.w,
            nv, dang{p}
        )"""
    sql += f"""
        SELECT w AS token, ROUND(pr, 6) AS pagerank
        FROM pr{iters}
        ORDER BY pr DESC, w
    """
    return sql


@register(
    "graph_pagerank_tokens",
    oracle=_oracle_pagerank(),
    tags=("graph", "pagerank", "iterative", "bigram", "decimal"),
)
def graph_pagerank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 fixed iterations, d=0.85, dangling-mass
    redistribution) over the token TRANSITION graph — nodes are corpus
    tokens, edge (w1 -> w2) weighted by bigram count. The iterative-
    graph-algorithm shape (the same join pattern as distributed PageRank
    over a web graph) proven bit-for-bit under the hash gate: each
    iteration is ONE shuffle join of the rank vector against the edge
    list plus a single-row dangling-mass scalar, and every iteration's
    ranks pass through DECIMAL(28,10) so partial-aggregation order can
    never leak into the next iteration's inputs in either engine.

    Scale shape: the edge list (vocabulary² sparse, like the bigram LM
    table) NEVER broadcasts — rank-vector-vs-edges is a shuffle join on
    w1, re-using the hash partitioning across iterations; the dangling
    scalar is one row per iteration (the declared bounded-BNLJ class,
    like bm25's corpus stats); the rank vector is O(vocabulary). The
    rank vector is localCheckpoint-ed each iteration (the connected-
    components trade, ``operators/dedup.py``): pr is referenced TWICE
    per iteration (dangling + contributions), so a fully lazy unroll
    re-embeds every prior iteration's plan in both branches — 2^t plan
    growth and redundant recomputation (measured: 7 BNLJ nodes in the
    lazy plan vs the true 1 per final iteration). Lineage truncation
    makes each iteration pay exactly one rank-vs-edges join.
    """
    d = load_table(spark, sf_dir, "documents")
    # Project the token array FIRST (functions/text.py:shingle_array rule):
    # inlined, the split re-evaluates per transform element — O(len²)
    # splitting inside the bigram explode.
    toks = d.select(F.split(F.col("text"), " ").alias("__tk"))
    arr = F.col("__tk")
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.struct(
                F.element_at(arr, i).alias("w1"),
                F.element_at(arr, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    bi = toks.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    e = (
        bi.filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    # model tables feed every iteration: materialize once — and edges
    # FIRST, so outd and nodes (which both re-read e, nodes twice) derive
    # from the checkpoint instead of re-running the bigram aggregation
    e = e.localCheckpoint()
    outd = e.groupBy("w1").agg(F.sum("c2").alias("c1")).localCheckpoint()
    nodes = (
        e.select(F.col("w1").alias("w"))
        .union(e.select(F.col("w2").alias("w")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()

    def squeeze(col):
        return col.cast("decimal(28,10)").cast("string").cast("double")

    pr = nodes.withColumn("pr", squeeze(F.lit(1.0) / F.lit(float(n))))
    for _ in range(PR_ITERS):
        pr = pr.localCheckpoint()  # cut lineage: see docstring
        dang = (
            pr.join(outd, pr.w == outd.w1, "left_anti")
            .agg(
                squeeze(
                    F.coalesce(
                        F.sum(F.col("pr").cast("decimal(28,10)")), F.lit(0)
                    )
                ).alias("m")
            )
        )
        contrib = (
            e.join(outd, "w1")
            .join(pr.select(F.col("w").alias("w1"), "pr"), "w1")
            .groupBy(F.col("w2").alias("w"))
            .agg(
                squeeze(
                    F.sum(
                        (
                            F.col("pr")
                            * (F.col("c2").cast("double") / F.col("c1"))
                        ).cast("decimal(28,10)")
                    )
                ).alias("s")
            )
        )
        pr = (
            nodes.join(contrib, "w", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "w",
                squeeze(
                    F.lit(0.15) / F.lit(float(n))
                    + F.lit(0.85)
                    * (
                        F.coalesce(F.col("s"), F.lit(0))
                        + F.col("m") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
        )
    return pr.select(
        F.col("w").alias("token"), F.round("pr", 6).alias("pagerank")
    ).orderBy(F.desc("pr"), F.asc("w"))


EMIT_SEQ_LEN = 32
EMIT_VOCAB = 32768
EMIT_SHARDS = 4


@register(
    "pipeline_emit_shards",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, STRING_SPLIT(text, ' ') AS tk
            FROM documents
        ),
        off AS (
            SELECT source, tk,
                   CAST(SUM(LEN(tk)) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) - LEN(tk) AS BIGINT) AS doc_off
            FROM toks
        ),
        tok AS (
            SELECT source,
                   doc_off + t.u.i - 1 AS p,
                   CAST('0x' || substr(md5(t.u.w), 1, 15) AS BIGINT)
                       % {EMIT_VOCAB} AS tid
            FROM (
                SELECT source, doc_off,
                       LIST_TRANSFORM(tk, (x, i) -> {{'i': i, 'w': x}}) AS iw
                FROM off
            ) s, UNNEST(s.iw) AS t(u)
        ),
        seqs AS (
            SELECT source,
                   CAST(p // {EMIT_SEQ_LEN} AS BIGINT) AS seq_id,
                   CAST(COUNT(*) AS INT) AS n_tok,
                   md5(STRING_AGG(CAST(tid AS VARCHAR), ' ' ORDER BY p))
                       AS seq_md5
            FROM tok
            GROUP BY source, CAST(p // {EMIT_SEQ_LEN} AS BIGINT)
            HAVING COUNT(*) = {EMIT_SEQ_LEN}
        )
        SELECT source, seq_id,
               CAST(CAST('0x' || substr(md5('shard:' || source || ':'
                        || CAST(seq_id AS VARCHAR)), 1, 15) AS BIGINT)
                    % {EMIT_SHARDS} AS INT) AS shard,
               n_tok, seq_md5, 1 AS resumed_ok
        FROM seqs
        ORDER BY source, seq_id
    """,
    tags=("llm-pipeline", "curation", "packing", "table-format",
          "emit", "end-to-end"),
)
def pipeline_emit_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard emission — the pipeline's terminal stage
    (``operators/emit.py``), run INSIDE the oracle gate end to end:
    documents tokenize to a bounded md5 vocabulary, pack GPT-style into
    fixed-length 32-token sequences (documents cross sequence
    boundaries; the per-source tail partial is dropped), hash-assign to
    4 shards, and are APPENDED through the catalog into a
    shard-partitioned table-format table as snapshot-isolated commits.

    The resume contract is exercised for real: the first emit call is
    budget-capped at ONE commit (an "interrupted" run that shipped half
    the shards), the second call reads the latest committed identifier
    from snapshot metadata (Paimon's ``commitIdentifier`` sink-resume
    contract) and emits only the missing half, and a third call is a
    proven no-op — ``resumed_ok`` rides the gate alongside the content. The
    returned rows are read BACK from the table and their md5s recomputed
    from the STORED token-id arrays, so the hash certifies the entire
    write → snapshot → partitioned read roundtrip bit-for-bit against
    DuckDB's replay of the packing (same certification style as
    ``dedup_boilerplate_chunks``).

    Scale shape: tokenize/fan-out is map-side; the one shuffle keys
    (source, seq_id) whose groups are exactly seq_len rows — perfectly
    balanced at any corpus size; commits move KB of manifest metadata;
    the only driver-side data is the 4-value shard list.
    """
    from paimon_presto_spark.catalog import Catalog
    from paimon_presto_spark.operators.emit import emit_training_shards
    from paimon_presto_spark.queries.advanced import _scratch_dir

    docs = load_table(spark, sf_dir, "documents")
    wh = _scratch_dir("emit-")
    cat = Catalog(spark, wh)
    cat.create_database("emit", ignore_if_exists=True)
    t = cat.create_table(
        "emit", "shards",
        "source string, seq_id bigint, shard int, n_tok int, ids array<int>",
        partition_keys=["shard"],
    )
    kw = dict(seq_len=EMIT_SEQ_LEN, vocab=EMIT_VOCAB,
              n_shards=EMIT_SHARDS, shards_per_commit=2)
    r1 = emit_training_shards(docs, t, max_commits=1, **kw)  # interrupted
    r2 = emit_training_shards(docs, t, **kw)                 # resume
    r3 = emit_training_shards(docs, t, **kw)                 # proven no-op
    resumed_ok = int(
        r1 == {"shards_written": 2, "shards_skipped": 0, "n_commits": 1}
        and r2 == {"shards_written": 2, "shards_skipped": 2, "n_commits": 1}
        and r3 == {"shards_written": 0, "shards_skipped": 4, "n_commits": 0}
    )
    stored = t.to_df()
    return (
        stored.select(
            "source",
            "seq_id",
            "shard",
            "n_tok",
            F.md5(
                F.array_join(
                    F.transform("ids", lambda x: x.cast("string")), " "
                )
            ).alias("seq_md5"),
            F.lit(resumed_ok).alias("resumed_ok"),
        )
        .orderBy("source", "seq_id")
    )


@register(
    "mix_epoch_schedule",
    oracle="""
        WITH s AS (
            SELECT source,
                   CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT)
                       AS n_tok,
                   CAST(1 + CAST('0x' || substr(md5('mix:' || source), 1, 15)
                                 AS BIGINT) % 4 AS INT) AS weight
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tok,
                   CAST(SUM(weight) AS BIGINT) AS total_w
            FROM s
        ),
        e AS (
            SELECT source, n_tok, weight,
                   CAST(2 * total_tok * weight AS DOUBLE)
                       / (total_w * n_tok) AS epochs_raw,
                   CAST(FLOOR(LEAST(
                       CAST(2 * total_tok * weight AS DOUBLE) / total_w,
                       4.0 * n_tok)) AS BIGINT) AS eff_tok
            FROM s, tot
        ),
        t2 AS (SELECT CAST(SUM(eff_tok) AS BIGINT) AS total_eff FROM e)
        SELECT source, n_tok, weight,
               ROUND(LEAST(epochs_raw, 4.0), 6) AS epochs,
               CAST(epochs_raw > 4.0 AS INT) AS capped,
               eff_tok,
               ROUND(CAST(eff_tok AS DOUBLE) / total_eff, 6) AS final_share
        FROM e, t2
        ORDER BY source
    """,
    tags=("llm-pipeline", "curation", "mixing", "epochs", "scheduling"),
)
def mix_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-epoch scheduling — the data-mixing decision a training run
    makes BEFORE sampling: given target mixture weights per source (here
    a portable hash-derived 1..4, standing in for a quality/composition
    policy) and a total token budget (2x the corpus), compute how many
    EPOCHS of each domain to draw. Small domains that would need more
    than the repetition cap (4 epochs — the "don't repeat data too often"
    rule) are capped, their effective token count floored, and the final
    realized mixture share renormalized over the capped totals — so the
    schedule states both the intent (epochs) and the achievable mixture
    (final_share) in one pass.

    Complements ``mix_domain_reweight`` (per-row sampling probabilities)
    and ``sample_priority_per_source`` (the draw itself): this entry is
    the planner above them. Scale shape: one scan aggregates per-source
    token counts; everything after operates on |sources| rows, with the
    two global totals carried as single-row broadcasts (the declared
    bm25/dsir scalar class). Exactness: every ratio is a SINGLE IEEE
    division of exact integers, sums run over integers — no float
    accumulation anywhere, so both engines agree bit-for-bit at round 6.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.select("source", F.size(F.split("text", " ")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tok"))
        .withColumn(
            "weight",
            (
                F.lit(1)
                + md5_long(F.concat(F.lit("mix:"), F.col("source"))) % 4
            ).cast("int"),
        )
    )
    tot = s.agg(
        F.sum("n_tok").alias("total_tok"),
        F.sum("weight").cast("long").alias("total_w"),
    )
    e = (
        s.crossJoin(F.broadcast(tot))
        .withColumn(
            "epochs_raw",
            (F.lit(2) * F.col("total_tok") * F.col("weight")).cast("double")
            / (F.col("total_w") * F.col("n_tok")),
        )
        .withColumn(
            "eff_tok",
            F.floor(
                F.least(
                    (F.lit(2) * F.col("total_tok") * F.col("weight"))
                    .cast("double") / F.col("total_w"),
                    F.lit(4.0) * F.col("n_tok"),
                )
            ).cast("long"),
        )
    )
    t2 = e.agg(F.sum("eff_tok").alias("total_eff"))
    return (
        e.crossJoin(F.broadcast(t2))
        .select(
            "source",
            "n_tok",
            "weight",
            F.round(F.least(F.col("epochs_raw"), F.lit(4.0)), 6).alias("epochs"),
            (F.col("epochs_raw") > 4.0).cast("int").alias("capped"),
            "eff_tok",
            F.round(
                F.col("eff_tok").cast("double") / F.col("total_eff"), 6
            ).alias("final_share"),
        )
        .orderBy("source")
    )
