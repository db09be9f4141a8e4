"""Vector-table recipe: IVF list assignment composed with the table
format's partitioning, so ANN probes become PARTITION PRUNING.

This is the 100 TB shape for similarity search over an embedding corpus:
assign each vector its IVF list at ingest (a column, computed once),
partition the table by list id, and a query's n-probe list choice turns
into a partition predicate — the scan plans only the probed partitions'
files, no index server, no full scan. The pieces are all existing
features (deterministic centroids, relational argmax assignment,
partition pruning with pushdown counts in ``last_plan``); this test pins
the composition end-to-end on real testdata embeddings.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from paimon_presto_spark.functions.vectors import cosine_similarity
from paimon_presto_spark.plans.predicate import P

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_partitioned_vector_table(spark, catalog):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    id_col, vec_col = emb.columns[0], emb.columns[1]

    # deterministic centroids: 4 fixed corpus vectors (a seeded k-means
    # sample in production — any reproducible choice works)
    cent_rows = (
        emb.filter(F.col(id_col) % 25 == 0).orderBy(id_col).limit(4).collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(cent_rows)]
    cent_df = F.broadcast(spark.createDataFrame(
        [(c, v) for c, v in centroids], "cid int, cvec array<double>"))

    # relational argmax assignment: one narrow |centroids|-way expansion
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.desc("__cd"), F.asc("cid"))
    assigned = (
        emb.crossJoin(cent_df)
        .withColumn("__cd", cosine_similarity(
            F.col(vec_col).cast("array<double>"), F.col("cvec")))
        .withColumn("__rk", F.row_number().over(w))
        .filter("__rk = 1")
        .select(F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<double>").alias("embedding"),
                F.col("cid").alias("list_id"))
    )

    t = catalog.create_table(
        "default", "vecs",
        "vec_id bigint, embedding array<double>, list_id int",
        partition_keys=["list_id"],
    )
    t.append(assigned)

    # query = an existing corpus vector → its own list is the top probe
    probe_q = assigned.filter(F.col("vec_id") == 7).collect()[0]
    qv = np.array(probe_q["embedding"])
    cvecs = np.array([v for _, v in centroids])
    sims = (cvecs @ qv) / (np.linalg.norm(cvecs, axis=1) * np.linalg.norm(qv))
    probes = [int(i) for i in np.argsort(-sims)[:2]]
    assert probe_q["list_id"] == probes[0]

    scan = t.scan(predicate=P.in_("list_id", probes))
    cand = scan.to_df()
    n_cand = cand.count()
    # the probe predicate PRUNED partitions at plan time
    assert scan.last_plan["after_partition_prune"] < scan.last_plan["total_files"]
    per_list = {r["list_id"]: r["n"] for r in
                t.to_df().groupBy("list_id").agg(F.count("*").alias("n")).collect()}
    assert n_cand == sum(per_list[p] for p in probes)

    # top-1 over the probed candidates is the query vector itself
    top = (
        cand.withColumn("__s", cosine_similarity(
            F.col("embedding"),
            F.array(*[F.lit(float(x)) for x in qv])))
        .orderBy(F.desc("__s"), F.asc("vec_id"))
        .limit(1)
        .collect()[0]
    )
    assert top["vec_id"] == 7
