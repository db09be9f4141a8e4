"""Retrieval & data-selection operators: BM25 lexical ranking, DSIR
importance resampling, and matryoshka embedding-truncation auditing.

These extend the LLM-pipeline surface (SURVEY §7 M4) toward the
retrieval/selection half of a training-data stack: score documents
against queries (BM25 — the lexical ranker RAG pipelines pair with the
ANN operators in ``operators/similarity.py``), score documents against a
target DISTRIBUTION (DSIR — importance weights from hashed-unigram
models, arXiv:2302.03169), and quantify what an embedding index loses by
storing dimension prefixes (MRL truncation, arXiv:2205.13147).

All three follow the registry's determinism rules: exact integer
statistics, correctly-rounded double ops written in the oracle's exact
shape, transcendentals squeezed through DECIMAL(28,10), and
order-insensitive decimal sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from paimon_presto_spark.functions.hashing import single_partition_key
from paimon_presto_spark.queries import register
from paimon_presto_spark.sources.testdata import load_table

#: BM25 probe terms: two common corpus words plus one absent word
#: ("shuffle" does not occur in the synthetic corpus), so the query
#: exercises both the hit path and the zero-df path.
BM25_TERMS = ["merge", "window", "shuffle"]
DSIR_BUCKETS = 256


@register(
    "text_bm25_topk",
    oracle="""
        WITH words AS (
            SELECT doc_id, w AS wd
            FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
            WHERE w <> ''
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        tf AS (
            SELECT doc_id, wd, COUNT(*) AS tf
            FROM words
            WHERE wd IN ('merge', 'window', 'shuffle')
            GROUP BY doc_id, wd
        ),
        idf AS (
            SELECT d.wd,
                   CAST(CAST(CAST(
                       LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE) AS idf,
                   s.n_docs, s.sum_dl
            FROM (SELECT wd, COUNT(*) AS df FROM tf GROUP BY wd) d, stats s
        ),
        scored AS (
            SELECT tf.doc_id,
                   idf.idf * (
                       (tf.tf * (1.2 + 1.0))
                       / (tf.tf + 1.2 * (
                             (1.0 - 0.75)
                             + (0.75 * dl.dl)
                               / (CAST(idf.sum_dl AS DOUBLE) / idf.n_docs)
                         ))
                   ) AS term_score
            FROM tf
            JOIN idf ON tf.wd = idf.wd
            JOIN dl ON dl.doc_id = tf.doc_id
        ),
        ranked AS (
            SELECT doc_id,
                   COUNT(*) AS n_terms_hit,
                   SUM(CAST(term_score AS DECIMAL(28,10))) AS score_dec
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_terms_hit,
               CAST(CAST(score_dec AS VARCHAR) AS DOUBLE) AS score,
               CAST(ROW_NUMBER() OVER (ORDER BY score_dec DESC, doc_id ASC)
                    AS INT) AS rnk
        FROM ranked
        ORDER BY score_dec DESC, doc_id ASC
        LIMIT 15
    """,
    tags=("text", "retrieval", "bm25", "ranking", "topk"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-15 over the documents table for a 3-term query
    (``operators/text.py:bm25_topk``) — the lexical retrieval scorer of
    Lucene/Elasticsearch and the BM25 half of hybrid RAG retrieval,
    expressed as two count aggregations plus broadcast term statistics.
    One query term ("shuffle") is absent from the corpus, exercising the
    zero-df path. The shuffle carries only matching postings; the text
    column never leaves the scan; the top-k is TakeOrderedAndProject."""
    from paimon_presto_spark.operators.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, BM25_TERMS, k=15, k1=1.2, b=0.75)
    return out.select(
        "doc_id",
        "n_terms_hit",
        F.col("score_dec").cast("string").cast("double").alias("score"),
        "rnk",
    ).orderBy("rnk")


@register(
    "sample_dsir_importance",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, (lang = 'en') AS tgt, w AS wd
            FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
            WHERE w <> ''
        ),
        b AS (
            SELECT doc_id, tgt,
                   CAST('0x' || SUBSTR(MD5(wd), 1, 15) AS BIGINT)
                       % {DSIR_BUCKETS} AS bkt
            FROM toks
        ),
        per_doc AS (
            SELECT doc_id, bkt, COUNT(*) AS cnt FROM b GROUP BY doc_id, bkt
        ),
        model AS (
            SELECT bkt,
                   CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                   COUNT(*) AS cr
            FROM b GROUP BY bkt
        ),
        totals AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM model),
        lr AS (
            SELECT bkt,
                   CAST(CAST(CAST(LN(
                       ((ct + 1.0) / (tt + {DSIR_BUCKETS}.0))
                       / ((cr + 1.0) / (tr + {DSIR_BUCKETS}.0))
                   ) AS DECIMAL(28,10)) AS VARCHAR) AS DOUBLE) AS lr
            FROM model, totals
        ),
        wts AS (
            SELECT p.doc_id,
                   CAST(SUM(p.cnt) AS BIGINT) AS n_tokens,
                   SUM(CAST(CAST(p.cnt AS DOUBLE) * lr.lr
                            AS DECIMAL(28,10))) AS weight_dec
            FROM per_doc p JOIN lr ON p.bkt = lr.bkt
            GROUP BY p.doc_id
        )
        SELECT doc_id, n_tokens,
               CAST(CAST(weight_dec AS VARCHAR) AS DOUBLE) AS dsir_weight,
               CAST(ROW_NUMBER() OVER (ORDER BY weight_dec DESC, doc_id ASC)
                    AS INT) AS rnk
        FROM wts
        ORDER BY weight_dec DESC, doc_id ASC
        LIMIT 25
    """,
    tags=("sampling", "dsir", "importance", "selection", "curation"),
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (``operators/selection.py:
    dsir_importance_weights``): the 25 documents whose hashed-unigram
    distribution is most like the target domain (lang='en'), by
    importance weight Σ ln(p_target/p_raw) over 256 md5 buckets — the
    published recipe for picking pre-training data that matches a small
    high-quality corpus (Xie et al. 2023). Two corpus scans, a 256-row
    broadcast log-ratio table, decimal-summed weights, and a
    TakeOrderedAndProject top-k — nothing quadratic, no UDFs."""
    from paimon_presto_spark.operators.selection import (
        dsir_importance_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    wts = dsir_importance_weights(
        docs, F.col("lang") == "en", n_buckets=DSIR_BUCKETS
    )
    top = wts.orderBy(F.desc("weight_dec"), F.asc("doc_id")).limit(25)
    w = Window.partitionBy(single_partition_key("doc_id")).orderBy(
        F.desc("weight_dec"), F.asc("doc_id")
    )
    return top.select(
        "doc_id",
        "n_tokens",
        F.col("weight_dec").cast("string").cast("double").alias("dsir_weight"),
        F.row_number().over(w).alias("rnk"),
    ).orderBy("rnk")


@register(
    "knn_matryoshka_recall",
    oracle="""
        WITH fullk AS (
            SELECT q_id, n_id FROM (
                SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY LIST_COSINE_SIMILARITY(
                               q.embedding::DOUBLE[],
                               c.embedding::DOUBLE[]) DESC,
                           c.vec_id
                       ) AS rnk
                FROM embeddings q JOIN embeddings c ON c.vec_id >= 8
                WHERE q.vec_id < 8
            ) WHERE rnk <= 10
        ),
        trunck AS (
            SELECT q_id, n_id FROM (
                SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY LIST_COSINE_SIMILARITY(
                               (q.embedding::DOUBLE[])[1:16],
                               (c.embedding::DOUBLE[])[1:16]) DESC,
                           c.vec_id
                       ) AS rnk
                FROM embeddings q JOIN embeddings c ON c.vec_id >= 8
                WHERE q.vec_id < 8
            ) WHERE rnk <= 10
        )
        SELECT f.q_id,
               COUNT(*) AS n_full,
               CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_overlap,
               SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                   / COUNT(*) AS recall
        FROM fullk f
        LEFT JOIN trunck t ON t.q_id = f.q_id AND t.n_id = f.n_id
        GROUP BY f.q_id
        ORDER BY f.q_id
    """,
    tags=("similarity", "knn", "matryoshka", "truncation", "recall"),
)
def knn_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (``operators/similarity.py:
    truncated_dim_recall``): recall@10 of cosine ranking over the FIRST
    16 of 64 embedding dimensions vs the full-dimension ground truth, for
    8 query vectors — the measurement that justifies (or vetoes) storing
    prefix-truncated vectors in a 100 TB ANN index (4x less memory and
    dot-product work). Cosine is scale-invariant so the prefix needs no
    re-normalization; recall crosses the engine boundary as exact integer
    counts."""
    from paimon_presto_spark.operators.similarity import truncated_dim_recall

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    c = e.filter(F.col("vec_id") >= 8)
    return truncated_dim_recall(c, q, trunc_dims=16, k=10).orderBy("q_id")


def _oracle_rrf_fusion(k: int, c: int, n_queries: int) -> str:
    """DuckDB twin of the hybrid-fusion entry: both constituent rankings
    replay through their existing oracle builders (IVF probe, LSH
    multiprobe) as CTE subqueries, then the RRF formula — 1/(c+rnk) is
    one exact-integer double division, summed as DECIMAL (order-free)."""
    from paimon_presto_spark.queries.advanced import (
        _oracle_ivf_knn,
        _oracle_lsh_knn,
    )

    r_ivf = _oracle_ivf_knn(k=k, n_queries=n_queries)
    r_lsh = _oracle_lsh_knn(n_planes=4, dim=64, k=k, n_queries=n_queries)
    return f"""
        WITH r_ivf AS ({r_ivf}),
        r_lsh AS ({r_lsh}),
        u AS (
            SELECT q_id, n_id, rnk FROM r_ivf
            UNION ALL
            SELECT q_id, n_id, rnk FROM r_lsh
        ),
        fused AS (
            SELECT q_id, n_id,
                   CAST(SUM(CAST(1.0 / ({c}.0 + CAST(rnk AS DOUBLE))
                        AS DECIMAL(28,10))) AS DOUBLE) AS rrf_score,
                   CAST(COUNT(*) AS BIGINT) AS n_lists
            FROM u GROUP BY q_id, n_id
        )
        SELECT q_id, n_id, ROUND(rrf_score, 6) AS rrf_score, n_lists, rnk
        FROM (
            SELECT q_id, n_id, rrf_score, n_lists,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY rrf_score DESC, n_id) AS rnk
            FROM fused
        ) WHERE rnk <= {k}
        ORDER BY q_id, rnk
    """


@register(
    "retrieval_rrf_fusion",
    oracle=_oracle_rrf_fusion(k=10, c=60, n_queries=5),
    tags=("retrieval", "fusion", "rrf", "hybrid", "ann"),
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retriever fusion (``operators/text.py:rrf_fuse``):
    reciprocal-rank fusion of two heterogeneous ANN rankings — IVF
    posting-list probe and LSH multiprobe — per query, score =
    Σ 1/(60+rank). RRF is THE standard for merging retrievers whose raw
    scores aren't comparable (BM25 vs dense cosine in RAG stacks; two
    differently-biased ANN indexes here): rank-level fusion needs no
    score calibration, and candidates surfaced by BOTH lists rise.
    Fusion cost is bounded by k x |queries| x |lists| regardless of
    corpus size; both constituent rankings replay exactly in the oracle,
    so the fused list is hash-gated end to end."""
    from paimon_presto_spark.operators.similarity import (
        ivf_topk,
        lsh_bucketed_topk,
    )
    from paimon_presto_spark.operators.text import rrf_fuse
    from paimon_presto_spark.queries.advanced import IVF_PROBE, _ivf_cents

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    r_ivf = ivf_topk(e, queries, _ivf_cents(), k=10, n_probe=IVF_PROBE)
    r_lsh = lsh_bucketed_topk(e, queries, k=10, n_planes=4, dim=64)
    out = rrf_fuse([r_ivf, r_lsh], k=10, c=60)
    return out.select(
        "q_id", "n_id",
        F.round("rrf_score", 6).alias("rrf_score"),
        "n_lists", "rnk",
    ).orderBy("q_id", "rnk")



_SQ8_ORACLE = """
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS emb,
                   list_aggregate(
                       list_transform(embedding,
                                      x -> abs(CAST(x AS DOUBLE))), 'max')
                       AS mx
            FROM embeddings
        ),
        coded AS (
            SELECT vec_id, emb,
                   list_transform(
                       emb,
                       x -> floor(x * (127.0 / mx) + 0.5)) AS codes
            FROM base WHERE mx > 0
        ),
        pairs AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                   CAST(list_dot_product(q.codes, c.codes) AS BIGINT)
                       AS int_dot,
                   q.emb AS q_emb, c.emb AS n_emb
            FROM coded q JOIN coded c ON c.vec_id >= 5
            WHERE q.vec_id < 5
        ),
        coarse AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id
                       ORDER BY int_dot DESC, n_id ASC) AS crnk
            FROM pairs
        ),
        rer AS (
            SELECT q_id, n_id, int_dot,
                   ROUND(LIST_COSINE_SIMILARITY(q_emb, n_emb), 6) AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id
                       ORDER BY LIST_COSINE_SIMILARITY(q_emb, n_emb) DESC,
                                n_id ASC) AS rnk
            FROM coarse WHERE crnk <= 25
        )
        SELECT q_id, n_id, int_dot, cos_sim, rnk
        FROM rer WHERE rnk <= 10
        ORDER BY q_id, rnk
"""


@register(
    "knn_sq8_rerank",
    oracle=_SQ8_ORACLE,
    tags=("similarity", "knn", "quantization", "sq8", "rerank"),
)
def knn_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN: int8 coarse scan + exact top-k re-rank
    (``operators/similarity.py:sq8_rerank_topk``) — the third production
    index family next to IVF-PQ (``knn_ivf_pq_stored``) and LSH
    (``knn_lsh_bucketed``): SQ8 keeps per-dimension resolution (no
    codebook training), cuts scanned bytes 4x, and its coarse stage is
    pure INTEGER codegen, so the candidate cut itself is bit-reproducible
    across engines — which is why this entry can hash-gate both stages
    end to end (coarse_k=25 candidates, k=10 exact survivors). Same
    query/corpus split as ``knn_bruteforce_topk`` (the recall baseline:
    any coarse-stage loss shows up as a diff against it)."""
    from paimon_presto_spark.operators.similarity import sq8_rerank_topk

    e = load_table(spark, sf_dir, "embeddings")
    out = sq8_rerank_topk(
        e.filter(F.col("vec_id") >= 5),
        e.filter(F.col("vec_id") < 5),
        k=10,
        coarse_k=25,
    )
    return out.orderBy("q_id", "rnk")


@register(
    "knn_sq8_stored",
    oracle=_SQ8_ORACLE,
    tags=("similarity", "knn", "quantization", "sq8", "index", "stored"),
)
def knn_sq8_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 with a PERSISTED codes table — the stored-column split the
    inline entry's docstring promises (``operators/similarity.py:
    sq8_codes`` / ``sq8_probe_topk``): the (id, codes) table is WRITTEN
    as parquet once, the coarse integer scan reads ONLY those stored
    codes (4x fewer bytes than float32 vectors, no re-quantization), and
    the exact refine stage joins the |Q| x coarse_k survivors back to
    the full-precision corpus BY ID — the big-vector table is read
    candidate-wise, never scanned (the FAISS ``refine`` topology, the
    SQ8 sibling of ``knn_ivf_pq_stored``'s train-once contract).
    Results are identical to the inline two-stage pipeline, so this
    entry shares ``knn_sq8_rerank``'s oracle verbatim: the stored
    index's fidelity is hash-certified, not assumed. Appends encode
    only the increment — codes are per-vector."""
    import os as _os
    import shutil
    import tempfile as _tempfile

    from paimon_presto_spark.operators.similarity import (
        sq8_codes,
        sq8_probe_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 5)
    wh = _tempfile.mkdtemp(prefix="sq8-")
    try:
        codes_path = _os.path.join(wh, "sq8_codes")
        sq8_codes(corpus).write.mode("overwrite").parquet(codes_path)
        out = sq8_probe_topk(
            spark.read.parquet(codes_path),
            corpus,
            e.filter(F.col("vec_id") < 5),
            k=10,
            coarse_k=25,
        ).orderBy("q_id", "rnk")
        # materialize before the index directory disappears
        rows = out.collect()
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        "q_id long, n_id long, int_dot long, cos_sim double, rnk int",
    ).orderBy("q_id", "rnk")


def _ndcg_constants(k: int = 10) -> tuple[str, str]:
    """Shared nDCG discount table: a CASE over ranks mapping r ->
    round(1/log2(r+1), 12) as a fixed-point literal, plus the ideal DCG
    (graded relevance 10..1) as an exact decimal literal — IDENTICAL
    text injected into the Spark expression and the DuckDB oracle, so
    the only float op either engine performs is one final division of
    bit-equal inputs (log2 itself never runs inside a query engine)."""
    import math
    from decimal import Decimal

    ws = {r: f"{1.0 / math.log2(r + 1):.12f}" for r in range(1, k + 1)}
    case = (
        "CASE rnk "
        + " ".join(f"WHEN {r} THEN {w}" for r, w in ws.items())
        + " ELSE 0.000000000000 END"
    )
    idcg = sum(Decimal(k + 1 - r) * Decimal(ws[r]) for r in range(1, k + 1))
    return case, str(idcg)


_NDCG_CASE, _NDCG_IDCG = _ndcg_constants(10)


def _ndcg_oracle() -> str:
    from paimon_presto_spark.queries.advanced import IVF_PROBE, _ivf_cents

    cents = ",\n".join(
        f"({cid}, [{', '.join(repr(x) for x in vec)}]::DOUBLE[])"
        for cid, vec in _ivf_cents()
    )
    return f"""
        WITH cent(cid, cvec) AS (VALUES {cents}),
        cassign AS (
            SELECT vec_id, embedding, cid AS bucket FROM (
                SELECT e.vec_id, e.embedding, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY LIST_COSINE_SIMILARITY(
                               e.embedding::DOUBLE[], c.cvec) DESC, c.cid
                       ) AS rk
                FROM embeddings e, cent c
            ) WHERE rk = 1
        ),
        qassign AS (
            SELECT vec_id, embedding, cid AS bucket FROM (
                SELECT e.vec_id, e.embedding, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY LIST_COSINE_SIMILARITY(
                               e.embedding::DOUBLE[], c.cvec) DESC, c.cid
                       ) AS rk
                FROM embeddings e, cent c
                WHERE e.vec_id < 5
            ) WHERE rk <= {IVF_PROBE}
        ),
        scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                   LIST_COSINE_SIMILARITY(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]) AS cos_raw
            FROM qassign q JOIN cassign c ON q.bucket = c.bucket
        ),
        approx AS (
            -- rank by the RAW cosine (n_id tie-break), exactly as
            -- ivf_topk's window does: nDCG turns any intra-top-10 rank
            -- flip into a value diff, so the approx ordering must mirror
            -- the Spark side bit-for-bit (the unrounded cross-engine
            -- ordering is the long-green knn_bruteforce_topk contract);
            -- (q_id, n_id) pairs are unique — a corpus row has ONE
            -- coarse bucket — so no DISTINCT is needed before ranking
            SELECT q_id, n_id, rnk FROM (
                SELECT q_id, n_id,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                                          ORDER BY cos_raw DESC, n_id) AS rnk
                FROM scored
            ) WHERE rnk <= 10
        ),
        exact AS (
            SELECT q_id, n_id, rx FROM (
                SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY LIST_COSINE_SIMILARITY(
                               q.embedding::DOUBLE[],
                               c.embedding::DOUBLE[]) DESC, c.vec_id
                       ) AS rx
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 5
            ) WHERE rx <= 10
        ),
        joined AS (
            SELECT a.q_id, a.rnk,
                   COALESCE(11 - e.rx, 0) AS rel
            FROM approx a
            LEFT JOIN exact e ON a.q_id = e.q_id AND a.n_id = e.n_id
        )
        SELECT q_id,
               CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS INT)
                   AS hits,
               ROUND(CAST(SUM(rel * ({_NDCG_CASE})) AS DOUBLE)
                     / CAST({_NDCG_IDCG} AS DOUBLE), 6) AS ndcg
        FROM joined
        GROUP BY q_id
        ORDER BY q_id
    """


@register(
    "retrieval_ndcg_eval",
    oracle=_ndcg_oracle(),
    tags=("retrieval", "evaluation", "ndcg", "ranking", "ann"),
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking-quality audit: nDCG@10 of the IVF multi-probe
    ranking against the exact-cosine ground truth, per query — the
    retrieval-eval metric that complements ``dedup_minhash_recall`` /
    ``knn_lsh_recall`` (set recall weighs every hit equally; nDCG
    charges the index for returning the right neighbors in the WRONG
    order). Ground-truth relevance is graded by exact rank (11-r for
    the true top-10), discounts come from a shared literal table
    (``_ndcg_constants``), and both engines accumulate the DCG in exact
    DECIMAL before one final IEEE division — so an approximation-quality
    METRIC is itself hash-gated, not eyeballed.

    Scale shape: the IVF side is the posting-list-pruned probe
    (`knn_ivf_probe`); the exact side is the bounded |Q| x corpus
    broadcast scan every recall audit pays by definition (the
    knn_lsh_recall class); the metric itself is one |Q| x 10 join +
    aggregation — free. At 100 TB the audit runs on a sampled query
    panel exactly like this one.
    """
    from paimon_presto_spark.operators.similarity import (
        cosine_similarity,
        ivf_topk,
    )
    from paimon_presto_spark.queries.advanced import IVF_PROBE, _ivf_cents

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    approx = ivf_topk(
        e, queries, _ivf_cents(), k=10, n_probe=IVF_PROBE
    ).select("q_id", "n_id", "rnk")
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
    )
    c = e.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"))
    wx = Window.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("n_id"))
    exact = (
        c.crossJoin(q)
        .withColumn("cos_raw", cosine_similarity(F.col("q_emb"), F.col("n_emb")))
        .withColumn("rx", F.row_number().over(wx))
        .filter(F.col("rx") <= 10)
        .select("q_id", "n_id", "rx")
    )
    j = approx.join(exact, ["q_id", "n_id"], "left").withColumn(
        "rel", F.coalesce(F.lit(11) - F.col("rx"), F.lit(0))
    )
    return (
        j.groupBy("q_id")
        .agg(
            F.sum((F.col("rel") > 0).cast("int")).cast("int").alias("hits"),
            F.sum(F.col("rel") * F.expr(_NDCG_CASE)).alias("dcg"),
        )
        .select(
            "q_id",
            "hits",
            F.round(
                F.col("dcg").cast("double")
                / F.expr(f"CAST({_NDCG_IDCG} AS DOUBLE)"),
                6,
            ).alias("ndcg"),
        )
        .orderBy("q_id")
    )
