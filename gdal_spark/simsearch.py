"""Embedding similarity search: exact cosine top-k + LSH-bucketed ANN.

The embeddings table is (vec_id, embedding: array<float>, label). Cosine
arithmetic is a **sequential left-fold in both engines** (Spark
`aggregate`, DuckDB `list_reduce`), element-wise cast to double — IEEE
ops in identical order, so Spark and the DuckDB oracle produce
bit-identical cosines and therefore identical top-k sets and thresholds.

Scale design (10^12 vectors):
- norms are computed once per vector in a narrow pass and carried as a
  column — pairwise work only evaluates the dot product;
- brute-force top-k broadcasts the (small) query set against the
  distributed corpus: one narrow pass + one shuffle for the per-query
  window rank — the baseline every ANN variant is measured against;
- the ANN scale path buckets vectors by random-hyperplane sign sketches
  (`lsh_bucket_topk`): candidate generation is an equi-join on the
  sketch, never a cross join. Probing sketches within hamming≤1 of the
  query's sketch trades recall for the removal of the O(N·Q) term.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPARK = "spark"
DUCKDB = "duckdb"

PERTURB_DELTA = 0.1  # synthetic near-dup: first element shifted by +0.1
# (vectors are unit-norm → cos(orig, perturbed) ≈ 1 - δ²/2 ≈ 0.995, far
# above the ≈0.52 max of natural pairs)


def dot_sql(a: str, b: str, engine: str) -> str:
    """Sequential-fold dot product (bit-identical across engines)."""
    if engine == SPARK:
        return (
            f"aggregate(transform(sequence(1, size({a})),"
            f" i -> cast(element_at({a}, i) as double)"
            f" * cast(element_at({b}, i) as double)),"
            f" cast(0 as double), (x, y) -> x + y)"
        )
    return (
        f"list_reduce(list_concat([0.0],"
        f" list_transform(range(1, length({a})+1),"
        f" i -> {a}[i]::double * {b}[i]::double)), (x, y) -> x + y)"
    )


def norm2_sql(a: str, engine: str) -> str:
    return dot_sql(a, a, engine)


def as_double_list_sql(a: str, engine: str) -> str:
    if engine == SPARK:
        return f"transform({a}, x -> cast(x as double))"
    return f"list_transform({a}, x -> x::double)"


def perturb_sql(a: str, engine: str) -> str:
    """First element shifted by PERTURB_DELTA (cosine stays ≈0.999…)."""
    if engine == SPARK:
        return (
            f"concat(array(cast(element_at({a}, 1) as double)"
            f" + {PERTURB_DELTA}),"
            f" transform(slice({a}, 2, size({a}) - 1),"
            f" x -> cast(x as double)))"
        )
    return (
        f"list_concat([{a}[1]::double + {PERTURB_DELTA}],"
        f" list_transform(list_slice({a}, 2, length({a})), x -> x::double))"
    )


def aug_sql(emb_view: str, engine: str) -> str:
    """embeddings → augmented table with deterministic near-duplicates:
    every vector once ('orig'), vec_id % 4 == 1 perturbed (+100000).
    Vectors carried as double lists with precomputed squared norm."""
    base = as_double_list_sql("embedding", engine)
    pert = perturb_sql("embedding", engine)
    inner = f"""
select vec_id, {base} as vec, label from {emb_view}
union all
select vec_id + 100000, {pert}, label from {emb_view} where vec_id % 4 = 1
"""
    return (
        f"select vec_id, vec, label, {norm2_sql('vec', engine)} as n2"
        f" from ({inner}) a"
    )


def aug_embeddings(emb: DataFrame) -> DataFrame:
    """DataFrame version of aug_sql (same arithmetic)."""
    base = emb.select(
        "vec_id",
        F.expr(as_double_list_sql("embedding", SPARK)).alias("vec"), "label")
    pert = emb.filter("vec_id % 4 = 1").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(perturb_sql("embedding", SPARK)).alias("vec"), "label")
    return (
        base.unionByName(pert)
        .withColumn("n2", F.expr(norm2_sql("vec", SPARK)))
    )


def cosine_pair_expr(va: str, vb: str, na2: str, nb2: str) -> str:
    return f"{dot_sql(va, vb, SPARK)} / (sqrt({na2}) * sqrt({nb2}))"


def neardup_pairs(aug: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Exact cosine near-duplicate pairs (verification-grade). Quadratic —
    the ground-truth kernel that LSH candidates are verified against; run
    standalone only at fixture scale or on a blocked candidate set."""
    a = aug.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"),
                   F.col("n2").alias("na2"))
    b = aug.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"),
                   F.col("n2").alias("nb2"))
    pairs = (
        a.crossJoin(b).filter("vec_a < vec_b")
        .withColumn("_cos", F.expr(cosine_pair_expr("va", "vb", "na2", "nb2")))
        .filter(F.col("_cos") >= threshold)
    )
    return pairs.select("vec_a", "vec_b", F.round("_cos", 6).alias("cosine"))


def brute_topk(aug: DataFrame, query_filter: str, k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast query set × distributed corpus +
    per-query window rank. Ties broken by vec_id (cosines bit-exact)."""
    qs = aug.filter(query_filter).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv"),
        F.col("n2").alias("qn2"))
    corpus = aug.select("vec_id", "vec", "n2")
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter("vec_id <> qid")
        .withColumn("_cos", F.expr(cosine_pair_expr("qv", "vec", "qn2", "n2")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("_cos", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; approximate → rows-only correctness check)
# ---------------------------------------------------------------------------

N_PLANES = 12


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(987654321)
    return rng.standard_normal((N_PLANES, dim))


def sign_sketch(df: DataFrame, dim: int, vec_col: str = "vec",
                out_col: str = "sketch") -> DataFrame:
    """Random-hyperplane sign sketch (N_PLANES bits) via a vectorized
    Arrow-batched pandas UDF: one matmul per batch, no per-row Python."""
    import pandas as pd
    planes = _hyperplanes(dim)

    def _sketch_kernel(v):
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(N_PLANES)).astype(np.int64)
        return pd.Series(signs @ weights)

    sketch_udf = F.pandas_udf(_sketch_kernel, "long")
    return df.withColumn(out_col, sketch_udf(F.col(vec_col)))


def ivf_topk(aug: DataFrame, query_filter: str, k: int = 10,
             n_probe: int = 3, centroid_filter: str =
             "vec_id % 125 = 7 and vec_id < 100000") -> DataFrame:
    """IVF ANN: coarse quantizer = a deterministic centroid subset;
    every vector joins its nearest centroid's inverted list, queries
    probe their ``n_probe`` nearest lists. Candidate generation is an
    equi-join on the centroid id — the inverted-file structure — so the
    O(N·Q) term is gone; recall is governed by n_probe (near-duplicate
    neighbors share their original's list with near-certainty)."""
    cents = aug.filter(centroid_filter).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec"),
        F.col("n2").alias("cn2"))

    def nearest(df: DataFrame, id_col: str, n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).withColumn(
            "_cc", F.expr(cosine_pair_expr("vec", "cvec", "n2", "cn2")))
        w = Window.partitionBy(id_col).orderBy(F.desc("_cc"), F.asc("cid"))
        return (scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= n).drop("_cc", "_rn", "cvec", "cn2"))

    lists = nearest(aug.select("vec_id", "vec", "n2"), "vec_id", 1) \
        .select("cid", "vec_id", "vec", "n2")
    probes = nearest(
        aug.filter(query_filter).select(
            F.col("vec_id").alias("qid"), F.col("vec").alias("qv"),
            F.col("n2").alias("qn2"))
        .withColumnRenamed("qv", "vec").withColumnRenamed("qn2", "n2"),
        "qid", n_probe,
    ).select("cid", "qid", F.col("vec").alias("qv"),
             F.col("n2").alias("qn2"))

    cand = probes.join(lists, "cid").filter("vec_id <> qid") \
        .dropDuplicates(["qid", "vec_id"])
    scored = cand.withColumn(
        "_cos", F.expr(cosine_pair_expr("qv", "vec", "qn2", "n2")))
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("_cos", 6).alias("cosine"))
    )


def lsh_bucket_topk(aug: DataFrame, query_filter: str, dim: int,
                    k: int = 10) -> DataFrame:
    """ANN top-k: candidates share the query's sign sketch or differ in
    exactly one bit (multi-probe, hamming ≤ 1) — an equi-join on the
    sketch key, never a cross join. Approximate recall; exactness is
    brute_topk's job."""
    sk = sign_sketch(aug, dim)
    qs = sk.filter(query_filter).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv"),
        F.col("n2").alias("qn2"), F.col("sketch").alias("qsk"))
    probes = qs.withColumn(
        "sketch",
        F.explode(F.expr(
            "concat(array(qsk), transform(sequence(0, %d),"
            " b -> cast(qsk as bigint) ^ shiftleft(1L, b)))" % (N_PLANES - 1)
        )),
    )
    cand = probes.join(sk.select("vec_id", "vec", "n2", "sketch"), "sketch")
    scored = (
        cand.filter("vec_id <> qid")
        .dropDuplicates(["qid", "vec_id"])
        .withColumn("_cos", F.expr(cosine_pair_expr("qv", "vec", "qn2", "n2")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("_cos", 6).alias("cosine"))
    )
