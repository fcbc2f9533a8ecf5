"""Embedding similarity search: exact cosine top-k, sign-LSH ANN, IVF ANN,
and LSH-blocked near-duplicate pairs.

The embeddings table is (vec_id, embedding: array<float>, label). All
arithmetic — cosines AND the random-hyperplane sign sketches — is expressed
as **shared SQL text** evaluated by both engines (Spark Catalyst and the
DuckDB oracle): sequential left-folds for dot products, `e0`-suffixed
double literals for the hyperplane constants. IEEE ops in identical order
make every stage bit-identical, so even the "approximate" ANN operators are
fully oracle-checked — approximation lives in the *algorithm* (which
candidates are generated), not in any nondeterminism.

Scale design (10^12 vectors):
- norms are computed once per vector in a narrow pass and carried as a
  column — pairwise work only evaluates the dot product;
- brute-force top-k broadcasts the (small) query set against the
  distributed corpus: one narrow pass + one shuffle for the per-query
  window rank — the baseline every ANN variant is measured against;
- `lsh_bucket_topk` buckets vectors by an n-bit random-hyperplane sign
  sketch: candidate generation is an equi-join on the sketch (hamming≤1
  multiprobe), never a cross join. `n_bits` scales with log2(N) — 6 bits
  at fixture scale (64 buckets over 625 vectors keeps every bucket
  non-starved), 20+ bits at 10^12;
- `ivf_topk` assigns every vector to its nearest coarse centroid and
  probes the query's n_probe nearest inverted lists — an equi-join on the
  centroid id;
- `neardup_pairs` (the contract near-dup path) generates candidates by
  banded sign-LSH (B bands × R bits: a pair is a candidate iff some band's
  R sketch bits all agree) and exact-verifies each candidate's cosine.
  Never quadratic: the only pairwise work is on band-bucket collisions.
  Design margin at the fixture's cosine (≈0.995, bit-flip prob p=θ/π≈
  0.032): miss probability per true pair = (1-(1-p)^R)^B = (0.176)^8 ≈
  9e-7 at R=6, B=8 — and because planes and vectors are fixed, the
  fixture output is deterministically identical to the exact quadratic
  oracle (asserted). Borderline pairs at cosine exactly 0.9 see the usual
  LSH S-curve (miss ≈ 0.12) — the production knob is more bands.

Reference precedent: GDAL has no similarity search; this family is the
LLM-training-data extension (nearest analog: the quadtree kNN search in
alg/gdalgrid.cpp:879-923, restated as bucketed equi-joins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPARK = "spark"
DUCKDB = "duckdb"

PERTURB_DELTA = 0.1  # synthetic near-dup: first element shifted by +0.1
# (vectors are unit-norm → cos(orig, perturbed) ≈ 1 - δ²/2 ≈ 0.995, far
# above the ≈0.52 max of natural pairs)

EMB_DIM = 64

# Hyperplanes for every LSH variant, frozen: 144 planes cover the
# near-dup bands (12 bands × 12 bits — R=12 prunes unrelated pairs to
# ~2^-12 per band while B=12 keeps the miss probability per true pair at
# (1-(1-p)^12)^12 ≈ 1.2e-6 for the fixture's p≈0.032); the ANN sketch
# reuses the first `n_bits`.
_N_PLANES_TOTAL = 144
NEARDUP_BANDS = 12
NEARDUP_BITS = 12
ANN_N_BITS = 6


def _hyperplanes() -> np.ndarray:
    rng = np.random.default_rng(987654321)
    return rng.standard_normal((_N_PLANES_TOTAL, EMB_DIM))


_PLANES = _hyperplanes()


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


def cosine_pair_expr(va: str, vb: str, na2: str, nb2: str,
                     engine: str = SPARK) -> str:
    return f"{dot_sql(va, vb, engine)} / (sqrt({na2}) * sqrt({nb2}))"


# ---------------------------------------------------------------------------
# Sign sketches as shared SQL (JVM-side on Spark: no Python anywhere). The
# hyperplanes travel as ONE array<array<double>> literal column (`_pl`) and
# each plane's dot product is a compact HOF fold over it — a flat 3,072-term
# expression tree made Catalyst's optimizer quadratic (~70 s of plan time
# for the banded variant; the fold form plans in <1 s, measured). The fold
# order (0 + t1) + t2 + … is identical in both dialects, so sketches are
# bit-exact cross-engine.
# ---------------------------------------------------------------------------


def _dlit(v) -> str:
    """Exact DOUBLE literal in both dialects: bare decimals are DECIMAL in
    Spark SQL, so append e0 — unless repr already carries an exponent
    (e.g. 1e-05), which is an approximate-numeric (double) literal as-is."""
    r = repr(float(v))
    return r if "e" in r or "E" in r else f"{r}e0"


def planes_literal_sql(engine: str) -> str:
    """The 48×64 hyperplane matrix as an array-of-arrays literal."""
    fn = "array" if engine == SPARK else "list_value"
    rows = [
        f"{fn}({', '.join(_dlit(v) for v in _PLANES[p])})"
        for p in range(_N_PLANES_TOTAL)
    ]
    return f"{fn}({', '.join(rows)})"


def _plane_dot_sql(plane_idx: int, vec: str, engine: str,
                   pl: str = "_pl") -> str:
    """Fold dot(planes[plane_idx], vec): (0 + p1*v1) + p2*v2 + …"""
    if engine == SPARK:
        return (
            f"aggregate(transform(sequence(1, {EMB_DIM}),"
            f" i -> element_at(element_at({pl}, {plane_idx + 1}), i)"
            f" * element_at({vec}, i)), 0e0, (s, v) -> s + v)"
        )
    return (
        f"list_reduce(list_concat([0e0],"
        f" list_transform(range(1, {EMB_DIM + 1}),"
        f" i -> {pl}[{plane_idx + 1}][i] * {vec}[i])), (s, v) -> s + v)"
    )


def sketch_bits_sql(vec: str, engine: str, first_plane: int, n_bits: int,
                    pl: str = "_pl") -> str:
    """n-bit integer sign sketch from planes[first_plane:first_plane+n]."""
    parts = []
    for b in range(n_bits):
        dot = _plane_dot_sql(first_plane + b, vec, engine, pl)
        parts.append(f"(case when {dot} > 0e0 then {1 << b} else 0 end)")
    return "(" + " + ".join(parts) + ")"


def _sketch_np(mat: np.ndarray, first_plane: int, n_bits: int) -> np.ndarray:
    """Sign sketch over a (rows, EMB_DIM) batch with the SAME fold order
    as the SQL form: dot = ((0 + p1·v1) + p2·v2) + …, sequential over
    dims, vectorized over rows — bit-identical to the HOF fold, so the
    DuckDB oracle (which runs the SQL form) compares exactly. The SQL
    twin exists because a 48×64 plane array literal as a Spark column is
    materialized per row (measured 20-30 s at 6k rows); one Arrow batch
    matures 3,072 vectorized ops instead."""
    out = np.zeros(mat.shape[0], dtype=np.int64)
    for b in range(n_bits):
        plane = _PLANES[first_plane + b]
        acc = np.zeros(mat.shape[0], dtype=np.float64)
        for j in range(EMB_DIM):
            acc = acc + plane[j] * mat[:, j]
        out |= (acc > 0.0).astype(np.int64) << b
    return out


def _vec_matrix(v: pd.Series) -> np.ndarray:
    if len(v) == 0:
        return np.zeros((0, EMB_DIM), dtype=np.float64)
    return np.asarray([np.asarray(x, dtype=np.float64) for x in v])


def with_sketch(df: DataFrame, vec_col: str = "vec", out_col: str = "sketch",
                n_bits: int = ANN_N_BITS) -> DataFrame:
    def kern(v):
        return pd.Series(_sketch_np(_vec_matrix(v), 0, n_bits))

    kern.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # asNondeterministic is a planning barrier, not a semantic marker
    # (the kernel is pure): without it Catalyst clones the UDF into every
    # consuming projection — the lsh plan showed SIX ArrowEvalPython
    # evaluations of the same sketch column
    udf = F.pandas_udf(kern, "long").asNondeterministic()
    return df.withColumn(out_col, udf(F.col(vec_col)))


# ---------------------------------------------------------------------------
# Near-duplicate pairs (contract path): banded LSH candidates + exact verify
# ---------------------------------------------------------------------------


def band_sketch_array_sql(vec: str, engine: str) -> str:
    """Array of NEARDUP_BANDS band sketches (each NEARDUP_BITS bits) —
    SQL twin of the banded numpy kernel, kept for oracle construction
    and the cross-engine sketch-equality test."""
    sketches = [
        sketch_bits_sql(vec, engine, b * NEARDUP_BITS, NEARDUP_BITS)
        for b in range(NEARDUP_BANDS)
    ]
    fn = "array" if engine == SPARK else "list_value"
    return f"{fn}({', '.join(sketches)})"


def neardup_pairs(aug: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Near-duplicate pairs by banded sign-LSH candidates + exact cosine
    verification. Candidate generation is an equi-join on (band, sketch)
    — O(collisions), never O(N²); precision is exact (every candidate is
    verified), recall margin is documented in the module docstring."""
    def band_kern(v):
        mat = _vec_matrix(v)
        cols = [_sketch_np(mat, b * NEARDUP_BITS, NEARDUP_BITS)
                for b in range(NEARDUP_BANDS)]
        return pd.Series(np.stack(cols, axis=1).tolist() if len(mat)
                         else [], dtype="object")

    band_kern.__annotations__ = {"v": pd.Series, "return": pd.Series}
    band_udf = F.pandas_udf(band_kern, "array<long>").asNondeterministic()
    # the band self-join carries IDs only — shipping the 64-dim vectors
    # through the collision join multiplied the shuffle by the collision
    # count; vectors re-join once per DISTINCT candidate pair below
    bands = aug.select(
        "vec_id", F.posexplode(band_udf(F.col("vec"))).alias("band", "bsk"))
    a = bands.select(F.col("vec_id").alias("vec_a"), "band", "bsk")
    b = bands.select(F.col("vec_id").alias("vec_b"), "band", "bsk")
    cand_ids = (
        a.join(b, ["band", "bsk"])
        .filter("vec_a < vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = aug.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"),
                    F.col("n2").alias("na2"))
    vb = aug.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"),
                    F.col("n2").alias("nb2"))
    cand = cand_ids.join(va, "vec_a").join(vb, "vec_b")

    # exact verification in a vectorized kernel with the same ordered
    # fold as the SQL cosine (sequential over dims — bit-exact to the
    # oracle); the HOF-fold expression on ~10^4 candidate pairs was the
    # top bench cost (8.6 s → Arrow batch)
    def cos_kern(va, vb, na2, nb2):
        ma, mb = _vec_matrix(va), _vec_matrix(vb)
        acc = np.zeros(len(ma), dtype=np.float64)
        for j in range(EMB_DIM):
            acc = acc + ma[:, j] * mb[:, j]
        return pd.Series(acc / (np.sqrt(na2.to_numpy())
                                * np.sqrt(nb2.to_numpy())))

    cos_kern.__annotations__ = {"va": pd.Series, "vb": pd.Series,
                                "na2": pd.Series, "nb2": pd.Series,
                                "return": pd.Series}
    cos_udf = F.pandas_udf(cos_kern, "double").asNondeterministic()
    pairs = (
        cand.withColumn("_cos", cos_udf("va", "vb", "na2", "nb2"))
        .filter(F.col("_cos") >= threshold)
    )
    return pairs.select("vec_a", "vec_b", F.round("_cos", 6).alias("cosine"))


def neardup_pairs_bruteforce(aug: DataFrame,
                             threshold: float = 0.9) -> DataFrame:
    """Exact all-pairs near-dup (verification-grade, O(N²)) — the in-Spark
    ground truth that the LSH-blocked contract path is tested against;
    never registered as a contract query."""
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
# LSH-bucketed ANN top-k (fully oracle-checked: sketches are shared SQL)
# ---------------------------------------------------------------------------


def lsh_bucket_topk(aug: DataFrame, query_filter: str, k: int = 10,
                    n_bits: int = ANN_N_BITS) -> DataFrame:
    """ANN top-k: candidates share the query's n-bit sign sketch or differ
    in exactly one bit (multi-probe, hamming ≤ 1) — an equi-join on the
    sketch key, never a cross join. n_bits is the density knob: 6 bits at
    fixture scale (~1/9 of the corpus probed per query), grows with
    log2(N) so bucket sizes stay bounded at 10^12."""
    sk = with_sketch(aug, n_bits=n_bits)
    qs = sk.filter(query_filter).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv"),
        F.col("n2").alias("qn2"), F.col("sketch").alias("qsk"))
    probes = qs.withColumn(
        "sketch",
        F.explode(F.expr(
            "concat(array(qsk), transform(sequence(0, %d),"
            " b -> cast(qsk as bigint) ^ shiftleft(1L, b)))" % (n_bits - 1)
        )),
    )
    cand = probes.join(sk.select("vec_id", "vec", "n2", "sketch"), "sketch")
    scored = (
        cand.filter("vec_id <> qid")
        .withColumn("_cos", F.expr(cosine_pair_expr("qv", "vec", "qn2", "n2")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("_cos", 6).alias("cosine"))
    )


def lsh_topk_oracle_sql(aug_view_sql: str, query_filter: str, k: int = 10,
                        n_bits: int = ANN_N_BITS) -> str:
    """DuckDB replication of lsh_bucket_topk (bit-exact)."""
    sk = sketch_bits_sql("vec", DUCKDB, 0, n_bits)
    probes = ", ".join(["q.qsk"] +
                       [f"xor(q.qsk, {1 << b})" for b in range(n_bits)])
    cos = (f"{dot_sql('qv', 'vec', DUCKDB)}"
           f" / (sqrt(qn2) * sqrt(n2))")
    return f"""
with a as ({aug_view_sql}),
pl as (select {planes_literal_sql(DUCKDB)} as _pl),
s as (select vec_id, vec, n2, {sk} as sketch from a cross join pl),
q as (select vec_id as qid, vec as qv, n2 as qn2, sketch as qsk from s
      where {query_filter}),
cand as (
  select q.qid, q.qv, q.qn2, s.vec_id, s.vec, s.n2
  from q join s on s.sketch in ({probes})
  where s.vec_id <> q.qid
)
select qid, vec_id,
       cast(row_number() over (partition by qid
            order by {cos} desc, vec_id) as int) as "rank",
       round({cos}, 6) as cosine
from cand
qualify "rank" <= {k}
"""


# ---------------------------------------------------------------------------
# IVF ANN top-k (fully oracle-checked: deterministic coarse quantizer)
# ---------------------------------------------------------------------------

IVF_CENTROID_FILTER = "vec_id % 125 = 7 and vec_id < 100000"


def ivf_topk(aug: DataFrame, query_filter: str, k: int = 10,
             n_probe: int = 3,
             centroid_filter: str = IVF_CENTROID_FILTER) -> DataFrame:
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


def ivf_topk_oracle_sql(aug_view_sql: str, query_filter: str, k: int = 10,
                        n_probe: int = 3,
                        centroid_filter: str = IVF_CENTROID_FILTER) -> str:
    """DuckDB replication of ivf_topk (bit-exact)."""
    cc = (f"{dot_sql('x.vec', 'c.cvec', DUCKDB)}"
          f" / (sqrt(x.n2) * sqrt(c.cn2))")
    cos = (f"{dot_sql('qv', 'vec', DUCKDB)}"
           f" / (sqrt(qn2) * sqrt(n2))")
    return f"""
with a as ({aug_view_sql}),
c as (select vec_id as cid, vec as cvec, n2 as cn2 from a
      where {centroid_filter}),
asn as (
  select x.vec_id, x.vec, x.n2, c.cid,
         row_number() over (partition by x.vec_id
                            order by {cc} desc, c.cid) as rn
  from a x cross join c
),
lists as (select cid, vec_id, vec, n2 from asn where rn = 1),
qasn as (
  select x.vec_id as qid, x.vec as qv, x.n2 as qn2, c.cid,
         row_number() over (partition by x.vec_id
                            order by {cc} desc, c.cid) as rn
  from (select * from a where {query_filter}) x cross join c
),
probes as (select cid, qid, qv, qn2 from qasn where rn <= {n_probe}),
cand as (
  select distinct q.qid, q.qv, q.qn2, l.vec_id, l.vec, l.n2
  from probes q join lists l on q.cid = l.cid
  where l.vec_id <> q.qid
)
select qid, vec_id,
       cast(row_number() over (partition by qid
            order by {cos} desc, vec_id) as int) as "rank",
       round({cos}, 6) as cosine
from cand
qualify "rank" <= {k}
"""


def kmeans_sql(emb_view: str, engine: str, k: int = 8,
               rounds: int = 3, quant: int = 1000000) -> str:
    """Distributed Lloyd k-means over the embedding corpus (the
    semantic-clustering stage LLM pipelines run for cluster-balanced
    data mixing and SemDeDup-style semantic dedup) — ``rounds``
    assignment/update iterations UNROLLED into one shared dual-dialect
    SQL text, so the oracle runs the identical arithmetic.

    Determinism design (the reason this is oracle-checkable at all):
    - init = the k smallest vec_ids (no RNG);
    - assignment distances are sequential-fold dot products (dot_sql) —
      IEEE ops in identical order on both engines;
    - the centroid update is an INTEGER-DETERMINISTIC mean: per-dim
      values are quantized to round(val·quant) BIGINTs, summed exactly
      (associative — immune to partial-aggregation order), and divided
      back — so cross-row float summation order, the classic source of
      distributed-float nondeterminism, never occurs. Ties break by cid.

    Scale shape: each round is one broadcast product vectors × k
    centroids (k is a constant — a bounded product, the IVF precedent)
    + a per-vector window rank + a (cid, dim)-keyed aggregate with
    map-side partials. Nothing is ever quadratic in N.
    """
    base = as_double_list_sql("embedding", engine)
    dot = dot_sql("vec", "cvec", engine)
    q = float(quant)
    parts = [f"""
with a as (select vec_id, {base} as vec from {emb_view}),
v as (select vec_id, vec, {norm2_sql('vec', engine)} as n2 from a),
c0 as (
  select vec_id as cid, vec as cvec, n2 as cn2
  from (select vec_id, vec, n2,
               row_number() over (order by vec_id) as _r from v) i
  where _r <= {k})"""]
    for r in range(rounds):
        parts.append(f""",
s{r} as (
  select vec_id, vec, n2, cid,
         (n2 - 2.0 * {dot} + cn2) as dist
  from v cross join c{r}),
a{r} as (
  select vec_id, vec, n2, cid, dist from (
    select *, row_number() over (partition by vec_id
                                 order by dist, cid) as rn from s{r}) z
  where rn = 1)""")
        if r == rounds - 1:
            break
        if engine == SPARK:
            expl = (f"select cid, posexplode(vec) as (dim, val)"
                    f" from a{r}")
            rebuild = ("transform(array_sort(collect_list("
                       "struct(dim, mu))), s -> s.mu)")
        else:
            expl = (f"select cid, dim, vec[dim + 1] as val from ("
                    f"select cid, vec, unnest(range(0, len(vec)))"
                    f" as dim from a{r}) e")
            rebuild = "list(mu order by dim)"
        parts.append(f""",
m{r} as (
  select cid, dim,
         cast(sum(cast(round(val * {q}) as bigint)) as double)
           / {q} / count(*) as mu
  from ({expl}) x group by cid, dim),
cv{r} as (select cid, {rebuild} as cvec from m{r} group by cid),
c{r + 1} as (
  select cid, cvec, {norm2_sql('cvec', engine)} as cn2 from cv{r})""")
    parts.append(f"""
select cast(vec_id as bigint) as vec_id, cast(cid as bigint) as cluster,
       round(dist, 6) as dist_sq
from a{rounds - 1}""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Scalar-quantized (int8) ANN — the memory-bound scale path
# ---------------------------------------------------------------------------


def int_dot_sql(a: str, b: str, engine: str) -> str:
    """Integer dot product over bigint lists — EXACT, so rank order is
    engine-independent by arithmetic, not by shared fold order."""
    if engine == SPARK:
        return (
            f"aggregate(transform(sequence(1, size({a})),"
            f" i -> element_at({a}, i) * element_at({b}, i)),"
            f" cast(0 as bigint), (x, y) -> x + y)"
        )
    return (
        f"list_reduce(list_concat([cast(0 as bigint)],"
        f" list_transform(range(1, length({a})+1),"
        f" i -> {a}[i] * {b}[i])), (x, y) -> x + y)"
    )


def sq8_topk_sql(emb_view: str, query_filter: str, k: int,
                 engine: str) -> str:
    """Scalar-quantized int8 ANN top-k (the SQ8 storage layout of
    FAISS/Milvus-class engines): per-dimension symmetric scales
    s_d = max|v_d| over the corpus, q_d = round(v_d/s_d*127) clamped to
    [-127, 127], ranking by the EXACT integer quantized dot product
    (vectors are unit-norm, so dot ≈ cosine). 4x memory reduction and
    integer SIMD at scale; recall vs the float baseline is pinned in
    tests (the quantization error story), while the driver hash checks
    the quantized ranking itself bit-for-bit — integer scores make
    cross-engine ties impossible to get wrong.

    Shape: the scale pass is one (dim)-keyed aggregate (64 rows,
    broadcast back); quantization is narrow; the search is the
    broadcast bounded-query-set product of the brute baseline
    (BOUNDED_PRODUCTS; the scale path for unbounded query sets remains
    ann_lsh/ann_ivf, which this composes with)."""
    aug = aug_sql(emb_view, engine)
    if engine == SPARK:
        d_gen = "explode(sequence(1, size(vec))) as d"
        elem = "element_at(vec, d)"
        reasm = "transform(array_sort(collect_list(struct(d, q))), x -> x.q)"
    else:
        d_gen = "unnest(range(1, length(vec)+1)) as d"
        elem = "vec[d]"
        reasm = "list(q order by d)"
    qdot = int_dot_sql("c.qvec", "q.qq", engine)
    return f"""
with aug as ({aug}),
ex as (select vec_id, {d_gen}, vec from aug),
ex2 as (select vec_id, d, {elem} as v from ex),
sc as (select d, max(abs(v)) as s from ex2 group by d),
qd as (
  select vec_id, ex2.d,
         cast(greatest(-127.0, least(127.0, round(v / s * 127)))
              as bigint) as q
  from ex2 join sc on sc.d = ex2.d),
qv as (select vec_id, {reasm} as qvec from qd group by vec_id),
qs as (select vec_id as qid, qvec as qq from qv
       where {query_filter}),
scored as (
  select q.qid, c.vec_id, {qdot} as qdot
  from qv c cross join qs q where c.vec_id <> q.qid),
ranked as (
  select qid, vec_id, qdot,
         row_number() over (partition by qid
                            order by qdot desc, vec_id) as rank
  from scored)
select qid, vec_id, cast(rank as bigint) as rank, qdot
from ranked where rank <= {k}
"""
