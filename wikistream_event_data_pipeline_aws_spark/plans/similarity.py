"""Similarity-search queries over the embeddings table (north-star:
brute-force cosine top-k baseline + LSH-bucketed ANN scale path +
embedding near-dup detection).

The cosine expression is a left-fold in double precision on both
engines — bit-exact parity (DuckDB's builtin list_cosine_similarity
computes in float32 and is deliberately NOT used).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.detmath import (
    LN2,
    det_ln_ratio,
    ln_e_sql,
    ln_m_sql,
    ln_val_sql,
    ln_z_sql,
)
from ..operators.textops import hex_hash
from ..operators.textops import tokenize as _tokenize
from ..operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_duplicates,
    ivf_assign_cells,
    ivf_topk,
    lsh_bucket_topk,
    lsh_multi_table_candidates,
    lsh_multi_table_topk,
)

# zero-norm guard mirrors operators.similarity.cosine: a zero vector has
# similarity 0, never NaN (both engines order NaN above every number);
# COALESCE(dot / NULLIF(denom, 0), 0) computes the norm product once
_COS_SQL = """
  COALESCE(
    list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]), t -> t[1] * t[2]))
    / NULLIF(sqrt(list_sum(list_transform({a}::DOUBLE[], x -> x * x)))
             * sqrt(list_sum(list_transform({b}::DOUBLE[], x -> x * x))), 0.0),
    0.0)
"""

N_QUERIES = 5
TOP_K = 10
CLONE_OFFSET = 100_000

# Hash-sampled audit legs (VERDICT r8 item 5): brute-force ground truth
# in the eval queries is an AUDIT of the approximate path, not the
# product path — at 100x query volume it need not cover every query.
# Each audit leg keeps a deterministic md5-sampled query subset (the
# sample_stratified_hash discipline: hex_hash(seed || id) % 1000 <
# per-mille), so the audit's O(n_audited · N) cost is a tunable
# fraction. AUDIT_SAMPLE_PER_MILLE is the shared knob (1000 = audit
# everything, right at test SF where queries are few);
# similarity_ann_recall runs at RECALL_AUDIT_PER_MILLE = 600 to
# exercise the knob live (drops query 1 of 0..4 — visible in its
# driver-verified rows).
#
# ADVICE r13 scope note: since the exact leg is served by the
# session-shared _exact_topk_shared kernel, the knob is an OUTPUT
# filter over the shared top-k (computed once for all N_QUERIES
# benchmark queries), no longer a bound on the brute-force stage's
# computation. That is the right trade while the kernel has six
# consumers (one shared pass beats per-query partial passes); if a
# deployment audits far below 1000‰ with a COLD kernel and no other
# exact-top-k consumer, brute-force the audited subset directly
# instead of warming the shared kernel.
AUDIT_SEED = "auditq"
AUDIT_SAMPLE_PER_MILLE = 1000
RECALL_AUDIT_PER_MILLE = 600


def audit_sample_pred(col: Column, per_mille: int) -> Column:
    """True iff this query id is in the md5-sampled audit subset."""
    return hex_hash(col.cast("string"), seed=AUDIT_SEED) % 1000 < per_mille


def audit_sample_sql(expr: str, per_mille: int) -> str:
    """The DuckDB twin of :func:`audit_sample_pred`."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{AUDIT_SEED}', "
        f"CAST({expr} AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 < {per_mille}"
    )


# session-shared exact cosine top-k ground truth (r13, guide §1.2):
# SIX queries consume the exact top-TOP_K of the benchmark query set
# (vec_id < N_QUERIES) over the full corpus — similarity_cosine_topk
# (it IS the query), eval_ann_ranking's graded-relevance leg,
# similarity_ann_recall's + similarity_ann_sweep's audit legs, and both
# RRF queries' semantic legs. A per-query top-k is INDEPENDENT per
# query with a deterministic tie-break, so every consumer derives its
# leg by FILTERING the shared kernel (query-subset / audit-sample /
# rank prefix) — filters commute with the kernel, and the audit knobs
# the invariants suite monkeypatches are applied per call, after the
# memo. Memo discipline: operators/memo.py (app-id keyed,
# file-fingerprint invalidated; nothing survives the session).
_EXACT_TOPK_CACHE: dict[tuple, DataFrame] = {}


def _exact_topk_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.memo import file_fingerprint, session_memo

    def build() -> DataFrame:
        e = load_table(spark, sf_dir, "embeddings")
        return brute_force_topk(
            e.filter(F.col("vec_id") < N_QUERIES), e, k=TOP_K
        )

    return session_memo(
        _EXACT_TOPK_CACHE,
        spark,
        (sf_dir, file_fingerprint(sf_dir, "embeddings"), TOP_K, N_QUERIES),
        build,
        label="exact_topk",
    )


def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _exact_topk_shared(spark, sf_dir)


SIMILARITY_COSINE_TOPK_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.embedding", b="c.embedding")} AS cosine_sim
  FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q, embeddings c
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim
FROM ranked WHERE rank <= {TOP_K}
"""


def similarity_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embeddings: clones planted at +{offset} must pair
    with their originals at cosine ~1.0.

    Routed through the multi-table-LSH production path (candidates from
    signature collisions, exact left-fold cosine re-verify) — no O(N²)
    enumeration anywhere reachable from ``queries()``. The oracle stays
    the EXACT all-pairs SQL: emitted pairs are bit-exact by
    construction, and the planted clones (the only >=0.95 pairs in the
    corpus, verified at sf0.01 and sf0.1) are identical vectors, which
    collide in every signature table — so recall is exactly 1 here and
    parity is a real check, not luck."""
    e = load_table(spark, sf_dir, "embeddings")
    clones = e.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + CLONE_OFFSET).alias("vec_id"),
        F.col("embedding"),
        F.col("label"),
    )
    aug = e.unionByName(clones)
    return embedding_near_duplicates(aug, threshold=0.95, dim=DIM)


SIMILARITY_EMBEDDING_NEARDUP_SQL = f"""
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {CLONE_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id < 10
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS_SQL.format(a="a.embedding", b="b.embedding")} AS cosine_sim
FROM aug a, aug b
WHERE a.vec_id < b.vec_id
  AND {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= CAST(0.95 AS DOUBLE)
"""


N_PLANES = 6
DIM = 64


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k. Approximate vs brute force, but
    fully deterministic: the hyperplanes are md5-derived constants, so
    the oracle below reproduces the exact bucket assignment (same
    coefficients as SQL literals, same left-fold projection) and the
    query is value-checked like everything else."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return lsh_bucket_topk(queries, e, dim=DIM, k=TOP_K, n_planes=N_PLANES)


def _lsh_oracle_sql() -> str:
    from ..operators.similarity import _hyperplane

    proj_terms = []
    for p in range(N_PLANES):
        coeffs = ", ".join(repr(_hyperplane(p, d)) for d in range(DIM))
        proj = (
            f"list_sum(list_transform(list_zip(embedding::DOUBLE[], [{coeffs}]::DOUBLE[]),"
            " t -> t[1] * t[2]))"
        )
        proj_terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(proj_terms)
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
qry AS (SELECT * FROM sig WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.embedding", b="c.embedding")} AS cosine_sim
  FROM qry q JOIN sig c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim
FROM ranked WHERE rank <= {TOP_K}
"""


SIMILARITY_ANN_LSH_SQL = _lsh_oracle_sql()


N_TABLES = 3


# session-shared multi-table LSH top-k (r13, guide §1.2): three queries
# consume this exact kernel — the query itself, similarity_ann_recall
# and eval_ann_ranking — memoized with the app-id / file-fingerprint
# discipline of operators/memo.py (nothing survives the session)
_LSH_MULTI_CACHE: dict[tuple, DataFrame] = {}


def similarity_ann_lsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH ANN (union-of-tables candidate set, deduped):
    the recall lever over the single-table path, still deterministic —
    every table's hyperplanes are md5-derived, so the oracle reproduces
    the exact candidate set and the result is value-checked."""
    from ..operators.memo import file_fingerprint, session_memo

    def build() -> DataFrame:
        e = load_table(spark, sf_dir, "embeddings")
        queries = e.filter(F.col("vec_id") < N_QUERIES)
        return lsh_multi_table_topk(
            queries, e, dim=DIM, k=TOP_K, n_planes=N_PLANES, n_tables=N_TABLES
        )

    return session_memo(
        _LSH_MULTI_CACHE,
        spark,
        (sf_dir, file_fingerprint(sf_dir, "embeddings"), DIM, TOP_K, N_PLANES, N_TABLES, N_QUERIES),
        build,
        label="lsh_multi_topk",
    )


def _lsh_multi_oracle_sql() -> str:
    from ..operators.similarity import _hyperplane

    bucket_cols = []
    for t in range(N_TABLES):
        proj_terms = []
        for p in range(N_PLANES):
            coeffs = ", ".join(
                repr(_hyperplane(t * 1000 + p, d)) for d in range(DIM)
            )
            proj = (
                "list_sum(list_transform(list_zip(embedding::DOUBLE[],"
                f" [{coeffs}]::DOUBLE[]), t -> t[1] * t[2]))"
            )
            proj_terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        bucket_cols.append(" + ".join(proj_terms) + f" AS b{t}")
    any_table = " OR ".join(f"q.b{t} = c.b{t}" for t in range(N_TABLES))
    return f"""
WITH sig AS (
  SELECT vec_id, {', '.join(bucket_cols)} FROM embeddings
),
qry AS (SELECT * FROM sig WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM qry q JOIN sig c ON q.vec_id <> c.vec_id AND ({any_table})
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {_COS_SQL.format(a="qe.embedding", b="ce.embedding")} AS cosine_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim
FROM ranked WHERE rank <= {TOP_K}
"""


SIMILARITY_ANN_LSH_MULTI_SQL = _lsh_multi_oracle_sql()


N_CELLS = 16


def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(nprobe=1) ANN — deterministic coarse quantizer, so unlike the
    LSH path this one IS exactly SQL-expressible and value-checked."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return ivf_topk(queries, e, k=TOP_K, n_cells=N_CELLS)


_ASSIGN_SQL = f"""
  SELECT vec_id, embedding, centroid_id AS cell
  FROM (
    SELECT v.vec_id, v.embedding, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_COS_SQL.format(a="v.embedding", b="c.cent")} DESC,
                      c.centroid_id ASC) AS rn
    FROM ({{src}}) v,
         (SELECT vec_id AS centroid_id, embedding AS cent
          FROM embeddings WHERE vec_id < {N_CELLS}) c
  ) WHERE rn = 1
"""

SIMILARITY_ANN_IVF_SQL = f"""
WITH corp AS ({_ASSIGN_SQL.format(src="SELECT vec_id, embedding FROM embeddings")}),
qry AS ({_ASSIGN_SQL.format(src=f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}")}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.embedding", b="c.embedding")} AS cosine_sim
  FROM qry q JOIN corp c ON q.cell = c.cell AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine_sim
FROM ranked WHERE rank <= {TOP_K}
"""


def similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k evaluation: the multi-table LSH ANN path audited
    against the exact brute-force top-k — the measurement every ANN
    deployment needs before trusting the approximate path at 100 TB
    (tune n_tables/n_planes until recall clears the bar, then retire
    the exact scan). Ground truth joins the ANN result on (query,
    neighbor); recall = hit fraction per query.

    SAMPLING KNOB (VERDICT r8 item 5): the brute-force leg covers only
    the md5-sampled audit subset of the queries —
    ``RECALL_AUDIT_PER_MILLE`` = {pm}‰ here, which keeps queries
    {{0, 2, 3, 4}} and drops query 1 — so the exact O(n_audited · N)
    scan is a tunable fraction of query volume at 100x. One recall row
    per AUDITED query; the ANN path itself still serves every query.
    Both inputs are the already-registered deterministic pipelines, so
    even this eval is value-hash-checked."""
    # derived from the session-shared exact kernel: filtering queries
    # commutes with a per-query top-k, and the audit knob is applied
    # per call (the monkeypatch tests turn it) — never memoized
    exact = (
        _exact_topk_shared(spark, sf_dir)
        .filter(audit_sample_pred(F.col("query_id"), RECALL_AUDIT_PER_MILLE))
        .select("query_id", "neighbor_id")
    )
    ann = (
        similarity_ann_lsh_multi(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            (F.col("n_hits") / F.col("n_exact")).alias("recall_at_k"),
        )
    )


similarity_ann_recall.__doc__ = similarity_ann_recall.__doc__.format(
    pm=RECALL_AUDIT_PER_MILLE
)


SIMILARITY_ANN_RECALL_SQL = f"""
WITH exact AS (
  SELECT * FROM ({SIMILARITY_COSINE_TOPK_SQL})
  WHERE {audit_sample_sql("query_id", RECALL_AUDIT_PER_MILLE)}
),
ann AS ({SIMILARITY_ANN_LSH_MULTI_SQL})
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
FROM exact e
LEFT JOIN ann a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""


def eval_ann_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking metrics for the production ANN path — nDCG@k and
    (M)RR, the two scores a retrieval deployment actually reports
    (``similarity_ann_recall`` answers "did the true neighbors
    appear?"; this answers "did they appear IN THE RIGHT ORDER, near
    the top?"). Relevance is graded from the exact top-k: the rank-j
    exact neighbor carries rel = k+1−j, so swapping positions 1 and 10
    costs nDCG even at recall 1.0.

    The log2 discount is ``det_ln_ratio(rank+1, 1) / ln2`` — an exact
    integer-argument log (bit-identical cross-engine; the same ln2
    double literal on both sides), so even the discount curve is
    value-hash-checked. DCG/iDCG sums cast DECIMAL(28,12) (terms
    ≤ k·1.45 — far inside the ≤15-sig-digit cast-parity bound); RR is
    one exact division; MRR is the windowed mean over queries. The
    exact leg is the same bounded-nq audit discipline as the recall
    query (AUDIT knob documented there)."""
    # session-shared exact kernel (already checkpoint-fenced there —
    # the rel join AND the iDCG leg read the same checkpointed blocks)
    exact = _exact_topk_shared(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("exact_rank")
    )
    ann = similarity_ann_lsh_multi(spark, sf_dir).select(
        "query_id", "neighbor_id", "rank"
    )
    one = F.lit(1).cast("long")
    j = ann.join(exact, ["query_id", "neighbor_id"], "left")
    rel = F.when(
        F.col("exact_rank").isNotNull(), F.lit(TOP_K + 1) - F.col("exact_rank")
    ).otherwise(F.lit(0)).cast("long")
    dcg_term = (rel.cast("double") * F.lit(LN2)) / det_ln_ratio(
        F.col("rank") + 1, one
    )
    per_q = j.groupBy("query_id").agg(
        F.sum((rel > 0).cast("bigint")).alias("n_hits"),
        F.sum(dcg_term.cast("decimal(28,12)")).alias("dcg_d"),
        F.min(F.when(rel > 0, F.col("rank"))).alias("first_hit_rank"),
    )
    idcg_term = (
        (F.lit(TOP_K + 1) - F.col("exact_rank")).cast("double") * F.lit(LN2)
    ) / det_ln_ratio(F.col("exact_rank") + 1, one)
    ideal = exact.groupBy("query_id").agg(
        F.sum(idcg_term.cast("decimal(28,12)")).alias("idcg_d")
    )
    rr = F.when(
        F.col("first_hit_rank").isNotNull(),
        F.lit(1.0) / F.col("first_hit_rank").cast("double"),
    ).otherwise(F.lit(0.0))
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = per_q.join(ideal, "query_id").select(
        "query_id",
        "n_hits",
        F.col("dcg_d").cast("double").alias("dcg"),
        F.col("idcg_d").cast("double").alias("idcg"),
        (
            F.col("dcg_d").cast("double") / F.col("idcg_d").cast("double")
        ).alias("ndcg_at_k"),
        rr.alias("reciprocal_rank"),
    )
    return out.select(
        "*",
        (
            F.sum(F.col("reciprocal_rank").cast("decimal(28,12)"))
            .over(wall)
            .cast("double")
            / F.count(F.lit(1)).over(wall).cast("double")
        ).alias("mrr"),
    )


EVAL_ANN_RANKING_SQL = f"""
WITH exact AS (
  -- outer-select alias, NOT a .replace("rank", "exact_rank") on the base
  -- SQL: a blanket substring replace would silently corrupt this oracle
  -- the moment the base text grows another 'rank' in a different role
  -- (a rank() window, a rank_score column).
  SELECT query_id, neighbor_id, rank AS exact_rank
  FROM ({SIMILARITY_COSINE_TOPK_SQL})
),
ann AS ({SIMILARITY_ANN_LSH_MULTI_SQL}),
j AS (
  SELECT a.query_id, a.rank,
         CASE WHEN e.neighbor_id IS NOT NULL
              THEN CAST({TOP_K + 1} - e.exact_rank AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS rel,
         a.rank + 1 AS arg1
  FROM ann a
  LEFT JOIN exact e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
),
jl1 AS (SELECT *, {ln_e_sql("arg1", "1")} AS e1 FROM j),
jl2 AS (SELECT *, {ln_m_sql("arg1", "1", "e1")} AS m1 FROM jl1),
jl3 AS (SELECT *, {ln_z_sql("m1")} AS z1 FROM jl2),
jl4 AS (SELECT *, z1 * z1 AS w1 FROM jl3),
per_q AS (
  SELECT query_id,
         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         SUM(CAST((CAST(rel AS DOUBLE) * CAST({LN2!r} AS DOUBLE))
                  / {ln_val_sql("e1", "z1", "w1")} AS DECIMAL(28,12))) AS dcg_d,
         MIN(CASE WHEN rel > 0 THEN rank END) AS first_hit_rank
  FROM jl4 GROUP BY query_id
),
ex0 AS (SELECT query_id, exact_rank, exact_rank + 1 AS arg2 FROM exact),
el1 AS (SELECT *, {ln_e_sql("arg2", "1")} AS e2 FROM ex0),
el2 AS (SELECT *, {ln_m_sql("arg2", "1", "e2")} AS m2 FROM el1),
el3 AS (SELECT *, {ln_z_sql("m2")} AS z2 FROM el2),
el4 AS (SELECT *, z2 * z2 AS w2 FROM el3),
ideal AS (
  SELECT query_id,
         SUM(CAST((CAST({TOP_K + 1} - exact_rank AS DOUBLE)
                   * CAST({LN2!r} AS DOUBLE))
                  / {ln_val_sql("e2", "z2", "w2")} AS DECIMAL(28,12))) AS idcg_d
  FROM el4 GROUP BY query_id
),
out AS (
  SELECT p.query_id, p.n_hits,
         CAST(CAST(p.dcg_d AS VARCHAR) AS DOUBLE) AS dcg,
         CAST(CAST(i.idcg_d AS VARCHAR) AS DOUBLE) AS idcg,
         CAST(CAST(p.dcg_d AS VARCHAR) AS DOUBLE)
           / CAST(CAST(i.idcg_d AS VARCHAR) AS DOUBLE) AS ndcg_at_k,
         CASE WHEN p.first_hit_rank IS NOT NULL
              THEN CAST(1.0 AS DOUBLE) / CAST(p.first_hit_rank AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS reciprocal_rank
  FROM per_q p JOIN ideal i ON p.query_id = i.query_id
)
SELECT *,
       CAST(CAST(SUM(CAST(reciprocal_rank AS DECIMAL(28,12))) OVER ()
                 AS VARCHAR) AS DOUBLE)
       / CAST(COUNT(*) OVER () AS DOUBLE) AS mrr
FROM out
"""


# (n_tables, n_planes) grid: the tables axis buys recall at linear
# candidate cost; the planes axis cuts candidates at recall cost. Five
# points trace the frontier's two edges plus the deployed corner.
SWEEP_CONFIGS: tuple[tuple[int, int], ...] = ((1, 6), (2, 6), (3, 4), (3, 6), (3, 8))

# (n_cells, nprobe) grid for the IVF family: cells cut candidates
# ~1/n_cells, nprobe buys recall back linearly. Shares the sweep's
# cost/quality axes so the two index families land in ONE artifact.
IVF_SWEEP_CONFIGS: tuple[tuple[int, int], ...] = ((8, 1), (8, 2), (16, 1), (16, 3))


def similarity_ann_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/cost frontier sweep across BOTH index families — the
    tuning artifact an actual 100 TB ANN deployment needs: pick the
    cheapest config whose recall clears the product bar, then retire
    the exact scan. One row per config:
    ``index_family`` ('lsh_multi' rows parameterized by
    (param_a=n_tables, param_b=n_planes); 'ivf' rows by
    (param_a=n_cells, param_b=nprobe)), ``n_candidates`` (pairs scored
    — the cost axis) and micro-averaged ``micro_recall`` against the
    exact brute-force top-k (the quality axis). Deterministic end to
    end (md5 hyperplanes; first-N-vector centroids), so even this eval
    is value-hash-checked against the DuckDB oracle.

    Cost-sharing discipline (the production shape — signatures/indexes
    built once, every tuning evaluation reuses them):
    - LSH: every config's bucket is a BIT-PREFIX of the same per-table
      plane-bit vector, so the hyperplane projections (the dominant
      cost: DIM-literal folds per plane per row) are computed ONCE for
      the maximal (tables, planes) grid and fenced with a lazy
      localCheckpoint. Further (VERDICT r7 item 6), every config's
      CANDIDATE SET is a subset of the coarsest config's (fewer planes
      = coarser buckets = more collisions; fewer tables = a subset of
      the table axis), so ONE bucket join at (all tables, min planes)
      granularity feeds every config: each collision row records how
      long the two bit vectors' common prefix runs, a pair-keyed
      aggregation folds that into per-(table, planes) hit flags plus
      ONE shared exact cosine, and each config is then a pure filter
      over the fenced flag table — 5 joins + 5 dedups + 5 cosine
      passes collapse into 1 + 1 + 1.
    - IVF: one corpus cell assignment per DISTINCT n_cells (different
      quantizers genuinely differ), fenced; the query side ranks ALL
      centroids once per n_cells and each nprobe config is a pure
      ``rank <= nprobe`` filter over that ranking.
    - Ground truth: one brute-force pass over the md5-sampled audit
      query subset (``AUDIT_SAMPLE_PER_MILLE`` — the sampling knob
      that makes the exact leg a tunable fraction of query volume at
      100x; 1000 = audit every query at test SF), fenced, shared by
      every row.
    """
    from functools import reduce

    from pyspark.sql import Window

    from ..operators.similarity import _hyperplane, cosine

    max_tables = max(nt for nt, _ in SWEEP_CONFIGS)
    max_planes = max(npl for _, npl in SWEEP_CONFIGS)

    def with_bits(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        # ONE F.expr string per table, not max_planes x DIM F.lit objects
        # + per-plane HOF lambdas: each Python-side lambda/literal costs
        # py4j round-trips, and the DSL formulation measured ~6s of pure
        # driver time per sweep invocation (the same lesson as the
        # simhash _bit_vote_cols rewrite) — the JVM parses these strings
        # in milliseconds. The expression tree is identical: left-fold
        # dot product in double, bit = projection > 0.
        def plane_sql(t: int, p: int) -> str:
            coeffs = ", ".join(
                f"{_hyperplane(t * 1000 + p, d)!r}D" for d in range(DIM)
            )
            return (
                f"IF(aggregate(zip_with(embedding, array({coeffs}),"
                " (x, y) -> CAST(x AS DOUBLE) * y),"
                " 0.0D, (acc, x) -> acc + x) > 0, 1, 0)"
            )

        cols = [F.col("vec_id").alias(out_id), F.col("embedding").alias(out_vec)]
        for t in range(max_tables):
            bits = ", ".join(plane_sql(t, p) for p in range(max_planes))
            cols.append(F.expr(f"array({bits})").alias(f"__bits{t}"))
        return df.select(*cols)

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    # r14: NOT checkpointed — each bit table has exactly ONE consumer
    # (the coarse bucket join below), so the fence bought nothing and
    # cost an eager analyze+optimize+plan pass per side at build time
    # (~0.3s each measured; the sweep's cost at bench SF is DRIVER time)
    q_bits = with_bits(queries, "query_id", "__qv")
    c_bits = with_bits(e, "neighbor_id", "__cv")
    # the ground-truth leg audits only the md5-sampled query subset
    # (AUDIT_SAMPLE_PER_MILLE — 1000 = every query at test SF; the
    # 100x knob for the one O(n_audited * N) stage of this artifact) —
    # derived from the session-shared exact kernel (query filters
    # commute with a per-query top-k; the knob applies per call)
    exact = (
        _exact_topk_shared(spark, sf_dir)
        .filter(audit_sample_pred(F.col("query_id"), AUDIT_SAMPLE_PER_MILLE))
        .select("query_id", "neighbor_id")
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )

    def config_row(cand: DataFrame, family: str, pa: int, pb: int) -> DataFrame:
        """Cost + recall row for one config from its SCORED candidate
        pairs (columns: query_id, neighbor_id, cosine_sim). Scoring
        happens upstream, before any pair-keyed shuffle — the shuffle
        then carries an 8-byte double per pair instead of two
        DIM-length float vectors."""
        # NOT fenced: cand is a pure column-filter over the already-
        # checkpointed pair_flags/cell tables, so its two consumers
        # re-filter a materialized RDD (cheap, executor-side) — while a
        # localCheckpoint here costs a full analyze+optimize+plan pass
        # on the driver PER CONFIG (~0.2s x 9 configs measured; lazy
        # checkpoints still plan eagerly to build their RDD).
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        ann = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id")
            .withColumn("hit", F.lit(1))
        )
        # ann is <= N_QUERIES * TOP_K rows by construction — broadcast it
        # (the checkpointed inputs carry no size stats, so the planner
        # would otherwise fall back to a sort-merge join)
        rec = exact.join(F.broadcast(ann), ["query_id", "neighbor_id"], "left").agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
        return n_cand.crossJoin(rec).select(
            F.lit(family).alias("index_family"),
            F.lit(pa).cast("long").alias("param_a"),
            F.lit(pb).cast("long").alias("param_b"),
            "n_candidates",
            "n_exact",
            "n_hits",
            (F.col("n_hits") / F.col("n_exact")).alias("micro_recall"),
        )

    # ONE bucket join at the coarsest granularity (all tables, minimum
    # plane count) feeds every LSH config: coarser buckets collide a
    # SUPERSET of every finer config's pairs, and per-collision prefix-
    # agreement flags recover exactly each config's candidate set
    plane_lens = sorted({npl for _, npl in SWEEP_CONFIGS})
    min_planes = plane_lens[0]

    def coarse(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        # ONE expr string, not max_tables x (struct + per-plane Column
        # arithmetic) DSL objects: the sweep's cost at bench SF is py4j
        # round-trips at build time (same lesson as with_bits above)
        structs = ", ".join(
            "struct({t} AS table, {bucket} AS bucket, __bits{t} AS bits)".format(
                t=t,
                bucket=" + ".join(
                    f"(__bits{t}[{p}] * {1 << p})" for p in range(min_planes)
                ),
            )
            for t in range(max_tables)
        )
        return df.select(id_col, vec_col, F.expr(f"explode(array({structs}))").alias("s")).select(
            id_col,
            vec_col,
            F.col("s.table").alias("table"),
            F.col("s.bucket").alias("bucket"),
            F.col("s.bits").alias("bits"),
        )

    collided = (
        coarse(q_bits, "query_id", "__qv")
        .withColumnRenamed("bits", "__qb")
        .join(
            coarse(c_bits, "neighbor_id", "__cv").withColumnRenamed("bits", "__cb"),
            ["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    # longest-common-prefix flags: the join guarantees planes
    # [0, min_planes) agree; each further sweep length extends the check
    agree: dict[int, F.Column] = {min_planes: F.lit(True)}
    prev = F.lit(True)
    for lo, hi in zip(plane_lens, plane_lens[1:]):
        for p in range(lo, hi):
            prev = prev & (F.col("__qb")[p] == F.col("__cb")[p])
        agree[hi] = prev
    # cosine BEFORE the pair-keyed groupBy: a pair colliding in k tables
    # recomputes k cheap dot products map-side, but the shuffle then
    # moves one double + a few flag ints per pair instead of two
    # DIM-float vectors; first() over identical recomputed scores is
    # deterministic
    scored_rows = collided.select(
        "query_id",
        "neighbor_id",
        "table",
        cosine("__qv", "__cv").alias("cosine_sim"),
        *[agree[npl].alias(f"__m{npl}") for npl in plane_lens],
    )
    pair_flags = (
        scored_rows.groupBy("query_id", "neighbor_id")
        .agg(
            F.first("cosine_sim").alias("cosine_sim"),
            *[
                F.expr(
                    f"max(CASE WHEN table = {t} AND __m{npl} THEN 1 ELSE 0 END)"
                ).alias(f"__hit_{t}_{npl}")
                for t in range(max_tables)
                for npl in plane_lens
            ],
        )
        .localCheckpoint(eager=False)
    )

    parts = []
    for nt, npl in SWEEP_CONFIGS:
        flag = reduce(
            lambda a, b: a | b,
            [F.col(f"__hit_{t}_{npl}") == 1 for t in range(nt)],
        )
        cand = pair_flags.filter(flag).select(
            "query_id", "neighbor_id", "cosine_sim"
        )
        parts.append(config_row(cand, "lsh_multi", nt, npl))

    for n_cells in sorted({c for c, _ in IVF_SWEEP_CONFIGS}):
        cents = e.filter(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("__cent")
        )
        cw = Window.partitionBy("vec_id").orderBy(
            F.col("__csim").desc(), F.col("centroid_id").asc()
        )
        max_probe = max(pb for ca, pb in IVF_SWEEP_CONFIGS if ca == n_cells)
        # r14: ONE corpus x centroids scoring pass + window per n_cells
        # (was two — the query side is e.filter(vec_id < N_QUERIES), a
        # SUBSET of the corpus side with the identical per-vec_id
        # ranking, so its separate crossJoin + rank + fence recomputed
        # the same rows). Rows up to max_probe are fenced once; the
        # corpus consumer is the rank-1 slice, the probe consumer the
        # vec_id < N_QUERIES slice — both pure filters over the fence.
        ranked = (
            e.crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                "embedding",
                "centroid_id",
                cosine("embedding", "__cent").alias("__csim"),
            )
            .withColumn("__rn", F.row_number().over(cw))
            .filter(F.col("__rn") <= max_probe)
            .select("vec_id", "embedding", F.col("centroid_id").alias("cell"), "__rn")
            .localCheckpoint(eager=False)
        )
        corp_cells = (
            ranked.filter(F.col("__rn") == 1)
            .select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("__cv"),
                "cell",
            )
        )
        for ca, nprobe in IVF_SWEEP_CONFIGS:
            if ca != n_cells:
                continue
            cand = (
                # the probe side is <= N_QUERIES x nprobe rows —
                # broadcast it (checkpointed ranked carries no size
                # stats, so the planner would otherwise sort-merge)
                F.broadcast(
                    ranked.filter(
                        (F.col("vec_id") < N_QUERIES) & (F.col("__rn") <= nprobe)
                    ).select(
                        F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("__qv"),
                        "cell",
                    )
                )
                .join(corp_cells, "cell")
                .filter(F.col("query_id") != F.col("neighbor_id"))
                # IVF pairs are unique by construction (one cell per
                # neighbor) — score inline, no dedup needed
                .select(
                    "query_id",
                    "neighbor_id",
                    cosine("__qv", "__cv").alias("cosine_sim"),
                )
            )
            parts.append(config_row(cand, "ivf", n_cells, nprobe))

    return reduce(lambda a, b: a.unionByName(b), parts)


def _bucket_cols_sql(n_tables: int, n_planes: int) -> str:
    from ..operators.similarity import _hyperplane

    bucket_cols = []
    for t in range(n_tables):
        proj_terms = []
        for p in range(n_planes):
            coeffs = ", ".join(
                repr(_hyperplane(t * 1000 + p, d)) for d in range(DIM)
            )
            proj = (
                "list_sum(list_transform(list_zip(embedding::DOUBLE[],"
                f" [{coeffs}]::DOUBLE[]), t -> t[1] * t[2]))"
            )
            proj_terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        bucket_cols.append(" + ".join(proj_terms) + f" AS b{t}")
    return ", ".join(bucket_cols)


def _sweep_cfg_sql(i: int, n_tables: int, n_planes: int) -> str:
    """CTE chunk computing one sweep row (same candidate/re-rank shape
    as the registered multi-table oracle, parameterized)."""
    any_table = " OR ".join(f"q.b{t} = c.b{t}" for t in range(n_tables))
    return f"""
sig{i} AS (
  SELECT vec_id, {_bucket_cols_sql(n_tables, n_planes)} FROM embeddings
),
cand{i} AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM (SELECT * FROM sig{i} WHERE vec_id < {N_QUERIES}) q
  JOIN sig{i} c ON q.vec_id <> c.vec_id AND ({any_table})
),
ranked{i} AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {_COS_SQL.format(a="qe.embedding", b="ce.embedding")} DESC,
                                     neighbor_id ASC) AS rank
  FROM cand{i}
  JOIN embeddings qe ON qe.vec_id = cand{i}.query_id
  JOIN embeddings ce ON ce.vec_id = cand{i}.neighbor_id
),
cfg{i} AS (
  SELECT 'lsh_multi' AS index_family,
         CAST({n_tables} AS BIGINT) AS param_a,
         CAST({n_planes} AS BIGINT) AS param_b,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{i}) AS n_candidates,
         CAST(COUNT(*) AS BIGINT) AS n_exact,
         CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           / CAST(COUNT(*) AS DOUBLE) AS micro_recall
  FROM exact e
  LEFT JOIN (SELECT * FROM ranked{i} WHERE rank <= {TOP_K}) a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
)"""


def _ivf_cfg_sql(i: int, n_cells: int, nprobe: int) -> str:
    """CTE chunk for one IVF sweep row: corpus cells (rank-1 centroid),
    query cells (rank <= nprobe), equi-join candidates, exact re-rank."""
    assign = f"""
    SELECT v.vec_id, v.embedding, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_COS_SQL.format(a="v.embedding", b="c.cent")} DESC,
                      c.centroid_id ASC) AS rn
    FROM ({{src}}) v,
         (SELECT vec_id AS centroid_id, embedding AS cent
          FROM embeddings WHERE vec_id < {n_cells}) c
"""
    return f"""
icorp{i} AS (
  SELECT vec_id, centroid_id AS cell
  FROM ({assign.format(src="SELECT vec_id, embedding FROM embeddings")}) WHERE rn = 1
),
iqry{i} AS (
  SELECT vec_id, centroid_id AS cell
  FROM ({assign.format(src=f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}")})
  WHERE rn <= {nprobe}
),
icand{i} AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM iqry{i} q JOIN icorp{i} c ON q.cell = c.cell AND q.vec_id <> c.vec_id
),
iranked{i} AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {_COS_SQL.format(a="qe.embedding", b="ce.embedding")} DESC,
                                     neighbor_id ASC) AS rank
  FROM icand{i}
  JOIN embeddings qe ON qe.vec_id = icand{i}.query_id
  JOIN embeddings ce ON ce.vec_id = icand{i}.neighbor_id
),
icfg{i} AS (
  SELECT 'ivf' AS index_family,
         CAST({n_cells} AS BIGINT) AS param_a,
         CAST({nprobe} AS BIGINT) AS param_b,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM icand{i}) AS n_candidates,
         CAST(COUNT(*) AS BIGINT) AS n_exact,
         CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           / CAST(COUNT(*) AS DOUBLE) AS micro_recall
  FROM exact e
  LEFT JOIN (SELECT * FROM iranked{i} WHERE rank <= {TOP_K}) a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
)"""


def _sweep_oracle_sql() -> str:
    chunks = ",".join(
        _sweep_cfg_sql(i, nt, npl) for i, (nt, npl) in enumerate(SWEEP_CONFIGS)
    ) + "," + ",".join(
        _ivf_cfg_sql(i, nc, npr) for i, (nc, npr) in enumerate(IVF_SWEEP_CONFIGS)
    )
    union = "\nUNION ALL\n".join(
        [f"SELECT * FROM cfg{i}" for i in range(len(SWEEP_CONFIGS))]
        + [f"SELECT * FROM icfg{i}" for i in range(len(IVF_SWEEP_CONFIGS))]
    )
    exact = (
        f"SELECT * FROM ({SIMILARITY_COSINE_TOPK_SQL}) "
        f"WHERE {audit_sample_sql('query_id', AUDIT_SAMPLE_PER_MILLE)}"
    )
    return f"WITH exact AS ({exact}),{chunks}\n{union}"


SIMILARITY_ANN_SWEEP_SQL = _sweep_oracle_sql()


HARDNEG_QUERIES = 10  # the clone-planted originals: their positives exist
HARDNEG_POS_THRESHOLD = 0.95  # at/above = positive (near-dup), excluded
HARDNEG_TOPK = 5


def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training — the
    pair-construction step every retrieval/embedding fine-tune needs:
    for each anchor vector, the highest-cosine candidates that are NOT
    positives (near-dups) — similar enough to be informative, distinct
    enough to be true negatives. Candidates come from the multi-table
    LSH bucket join (never an O(nq·N) scan); the positive exclusion is
    a cosine >= {pos} cut, which on the clone-augmented corpus provably
    matters: every anchor's planted identical clone collides in every
    signature table and would otherwise top the list. Output: top-{k}
    negatives per anchor with exact cosine. Deterministic end to end
    (md5 hyperplanes, exact re-rank), so value-hash-checked; scale
    shape identical to ``similarity_ann_lsh_multi``."""
    e = load_table(spark, sf_dir, "embeddings")
    clones = e.filter(F.col("vec_id") < HARDNEG_QUERIES).select(
        (F.col("vec_id") + CLONE_OFFSET).alias("vec_id"),
        F.col("embedding"),
        F.col("label"),
    )
    aug = e.unionByName(clones)
    anchors = aug.filter(F.col("vec_id") < HARDNEG_QUERIES)
    cand = lsh_multi_table_candidates(
        anchors, aug, dim=DIM, n_planes=N_PLANES, n_tables=N_TABLES
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine("__qv", "__cv").alias("cosine_sim"),
    ).filter(F.col("cosine_sim") < HARDNEG_POS_THRESHOLD)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= HARDNEG_TOPK)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neg_rank").cast("long").alias("neg_rank"),
            F.col("neighbor_id").alias("negative_id"),
            "cosine_sim",
        )
    )


mine_hard_negatives.__doc__ = mine_hard_negatives.__doc__.format(
    pos=HARDNEG_POS_THRESHOLD, k=HARDNEG_TOPK
)


def _hardneg_oracle_sql() -> str:
    from ..operators.similarity import _hyperplane

    bucket_cols = []
    for t in range(N_TABLES):
        proj_terms = []
        for p in range(N_PLANES):
            coeffs = ", ".join(
                repr(_hyperplane(t * 1000 + p, d)) for d in range(DIM)
            )
            proj = (
                "list_sum(list_transform(list_zip(embedding::DOUBLE[],"
                f" [{coeffs}]::DOUBLE[]), t -> t[1] * t[2]))"
            )
            proj_terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        bucket_cols.append(" + ".join(proj_terms) + f" AS b{t}")
    any_table = " OR ".join(f"q.b{t} = c.b{t}" for t in range(N_TABLES))
    return f"""
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {CLONE_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id < {HARDNEG_QUERIES}
),
sig AS (
  SELECT vec_id, {', '.join(bucket_cols)} FROM aug
),
qry AS (SELECT * FROM sig WHERE vec_id < {HARDNEG_QUERIES}),
cand AS (
  SELECT DISTINCT q.vec_id AS anchor_id, c.vec_id AS negative_id
  FROM qry q JOIN sig c ON q.vec_id <> c.vec_id AND ({any_table})
),
scored AS (
  SELECT cand.anchor_id, cand.negative_id,
         {_COS_SQL.format(a="qe.embedding", b="ce.embedding")} AS cosine_sim
  FROM cand
  JOIN aug qe ON qe.vec_id = cand.anchor_id
  JOIN aug ce ON ce.vec_id = cand.negative_id
),
negs AS (
  SELECT * FROM scored WHERE cosine_sim < CAST({HARDNEG_POS_THRESHOLD} AS DOUBLE)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                               ORDER BY cosine_sim DESC, negative_id ASC) AS neg_rank
  FROM negs
)
SELECT anchor_id, neg_rank, negative_id, cosine_sim
FROM ranked WHERE neg_rank <= {HARDNEG_TOPK}
"""


MINE_HARD_NEGATIVES_SQL = _hardneg_oracle_sql()


_ANN_SIG_SRC_CACHE: dict[str, str] = {}


def _ann_sig_stream_src(spark: SparkSession, sf_dir: str) -> str:
    """Two-file (even/odd vec_id) replay source, built once per
    (session, sf_dir) — immutable input; bench.warmup pre-builds it
    with the other setup artifacts."""
    import tempfile

    src = _ANN_SIG_SRC_CACHE.get(sf_dir)
    if src is None:
        e = load_table(spark, sf_dir, "embeddings")
        src = tempfile.mkdtemp(prefix="annsig_stream_src_") + "/src"
        for parity in (0, 1):
            e.filter(F.col("vec_id") % 2 == parity).select(
                "vec_id", "embedding"
            ).coalesce(1).write.mode("append").parquet(src)
        _ANN_SIG_SRC_CACHE[sf_dir] = src
    return src


def streaming_ann_index_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN-index maintenance end-to-end — the vector-leg
    twin of ``streaming_postings_sink``: the embeddings table replays
    as TWO micro-batches (even/odd vec_id files) through
    ``streaming.ingest.start_ann_signature_sink``, whose foreachBatch
    INSERT-ONLY merges each batch's multi-table LSH signatures into a
    persistent signature table (signatures are pure functions of the
    vectors — set semantics, so replays and duplicate deliveries
    no-op). The readout then serves the multi-table ANN top-k FROM THE
    STREAMED TABLE — bucket equi-join over the persisted (vec_id,
    table, bucket) rows, exact-cosine re-rank after joining the
    vectors back — and is value-checked against the BATCH multi-table
    oracle: the streamed index answering identically to the batch
    index is the strongest form of the incremental-maintenance claim.
    Replay idempotency is pinned separately in the streaming tests."""
    import tempfile

    from ..streaming.ingest import file_stream, start_ann_signature_sink

    e = load_table(spark, sf_dir, "embeddings")
    src = _ann_sig_stream_src(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="annsig_stream_")
    sig_path, ckpt = f"{tmp}/sigs", f"{tmp}/ckpt"
    schema = spark.read.parquet(src).schema
    stream = file_stream(spark, src, schema, max_files_per_trigger=1)
    q = start_ann_signature_sink(
        stream,
        sig_path,
        checkpoint_dir=ckpt,
        dim=DIM,
        n_planes=N_PLANES,
        n_tables=N_TABLES,
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
        raise TimeoutError("ann signature stream did not finish in 300s")
    sigs = spark.read.parquet(sig_path)
    qs = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cs = sigs.select(F.col("vec_id").alias("neighbor_id"), "table", "bucket")
    cand = (
        qs.join(cs, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"))
    cv = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv")
    )
    scored = (
        cand.join(F.broadcast(qv.filter(F.col("query_id") < N_QUERIES)), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine("__qv", "__cv").alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cosine_sim",
        )
    )


_Q_SCALE = 127.0


def embedding_int8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 embedding quantization via ``mapInArrow`` — the Arrow-native
    batch transform (one step lower-level than the Pandas UDFs: raw
    RecordBatches in, zero pandas materialization) that a vector-index
    build pipeline runs to shrink storage 4x before ANN indexing. The
    quantizer is ``floor(x * {_Q_SCALE} + 0.5)`` clamped to [-127, 127]
    — floor/multiply/add are IEEE-exact, so the DuckDB oracle
    (list_transform with the identical expression) matches bit-for-bit.
    Per-vector outputs (dims, code sum, min/max code) come from
    offset-segmented numpy reductions over the FLATTENED list buffer —
    vectorized per batch, never per row. At 100 TB this is
    embarrassingly parallel: no shuffle at all."""
    import numpy as np
    import pyarrow as pa

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def quantize(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id")
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):  # pragma: no cover
                emb = emb.combine_chunks()
            if emb.null_count:  # offsets arithmetic below assumes no nulls
                raise ValueError("embedding column must not contain nulls")
            # flatten() + rebased offsets, NOT .values: a zero-copy sliced
            # batch keeps the parent values buffer, where raw offsets start
            # past 0 and reduceat's implicit to-end last segment would
            # absorb codes beyond this slice into the final vector
            offsets = np.asarray(emb.offsets, dtype=np.int64)
            offsets = offsets - offsets[0]
            flat = np.asarray(emb.flatten().cast(pa.float64()))
            codes = np.clip(np.floor(flat * _Q_SCALE + 0.5), -127, 127).astype(
                np.int64
            )
            starts = offsets[:-1]
            n_dims = offsets[1:] - starts
            # reduceat is undefined on empty segments (it returns the next
            # vector's first code, or raises when start == len): reduce only
            # the non-empty ones; empty embeddings surface NULL sum/min/max,
            # matching DuckDB's list_sum/list_min/list_max on [].
            nonempty = n_dims > 0
            sums = np.zeros(len(starts), dtype=np.int64)
            mins = np.zeros(len(starts), dtype=np.int64)
            maxs = np.zeros(len(starts), dtype=np.int64)
            ne_starts = starts[nonempty]
            if ne_starts.size:
                sums[nonempty] = np.add.reduceat(codes, ne_starts)
                mins[nonempty] = np.minimum.reduceat(codes, ne_starts)
                maxs[nonempty] = np.maximum.reduceat(codes, ne_starts)
            mask = ~nonempty  # numpy bool mask: True marks NULL slots
            yield pa.RecordBatch.from_arrays(
                [
                    vec_ids,
                    pa.array(n_dims, type=pa.int64()),
                    pa.array(sums, type=pa.int64(), mask=mask),
                    pa.array(mins, type=pa.int64(), mask=mask),
                    pa.array(maxs, type=pa.int64(), mask=mask),
                ],
                names=["vec_id", "n_dims", "code_sum", "min_code", "max_code"],
            )

    return e.mapInArrow(
        quantize,
        "vec_id long, n_dims long, code_sum long, min_code long, max_code long",
    )


EMBEDDING_INT8_CODES_SQL = f"""
WITH codes AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> LEAST(127.0, GREATEST(-127.0, FLOOR(x * {_Q_SCALE} + 0.5)))) AS c
  FROM embeddings
)
SELECT vec_id,
       CAST(len(c) AS BIGINT) AS n_dims,
       CAST(list_sum(c) AS BIGINT) AS code_sum,
       CAST(list_min(c) AS BIGINT) AS min_code,
       CAST(list_max(c) AS BIGINT) AS max_code
FROM codes
"""


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_QUERIES = 3
RRF_TOPK = 10


def _lexical_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared lexical retrieval leg: per query document, the top-{topk}
    candidates by distinct-token Jaccard, candidates bounded by posting
    intersection (only docs sharing >= 1 token with a query are scored;
    the query postings broadcast). Returns (query_id, cand_id,
    lex_rank)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(_tokenize(F.col("text")))).alias("token"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    qtoks = toks.filter(F.col("doc_id") < RRF_QUERIES).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    inter = (
        toks.join(F.broadcast(qtoks), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    qsizes = sizes.filter(F.col("doc_id") < RRF_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("n_toks").alias("n_q")
    )
    jac = F.col("n_inter") / (F.col("n_q") + F.col("n_toks") - F.col("n_inter"))
    w_lex = Window.partitionBy("query_id").orderBy(
        jac.desc(), F.col("doc_id").asc()
    )
    return (
        inter.join(sizes, "doc_id")
        .join(F.broadcast(qsizes), "query_id")
        .withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= RRF_TOPK)
        .select("query_id", F.col("doc_id").alias("cand_id"), "lex_rank")
    )


def _rrf_fused(lexk: DataFrame, semk: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic top-k list:
    score = sum(1/(k + rank)) over the legs where the candidate appears;
    re-ranked and cut to the fused top-{topk}."""
    fused = lexk.join(semk, ["query_id", "cand_id"], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0)
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.col("cand_id").asc()
    )
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= RRF_TOPK)
        .select(
            "query_id", "fused_rank", "cand_id",
            "lex_rank", "sem_rank", "rrf_score",
        )
    )


_lexical_jaccard_topk.__doc__ = _lexical_jaccard_topk.__doc__.format(
    topk=RRF_TOPK
)
_rrf_fused.__doc__ = _rrf_fused.__doc__.format(topk=RRF_TOPK)


def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    SIGIR 2009): for each of {nq} query documents, fuse a LEXICAL
    ranking (distinct-token Jaccard against every candidate sharing a
    token) with a SEMANTIC ranking (exact cosine over the embeddings
    table, ``brute_force_topk`` — vec_id aligns with doc_id in this
    corpus) via ``score = sum(1/(k + rank))``, k={k}. The modern RAG
    retrieval stack in one plan: BM25-family and vector legs each
    produce a top-{topk} list; RRF needs only the RANKS, so the legs'
    incomparable scores never mix — and rank integers fuse with a
    fixed two-term double sum, so oracle parity is exact.

    Scale shape: the query side of both legs is a broadcast ({nq}
    docs / vectors); lexical candidates are bounded by posting
    intersection (one token-keyed shuffle of matching postings only);
    the semantic leg is the documented brute-force baseline (the
    ANN-routed variant is ``retrieval_rrf_ann``). Fusion joins two
    <= {nq}x{topk}-row lists — negligible."""
    lexk = _lexical_jaccard_topk(spark, sf_dir)
    # semantic leg derived from the session-shared exact kernel: a
    # per-query top-k's rank prefix IS the smaller-k result, and the
    # RRF query set is a subset of the kernel's (guarded loudly)
    assert RRF_TOPK <= TOP_K and RRF_QUERIES <= N_QUERIES
    semk = (
        _exact_topk_shared(spark, sf_dir)
        .filter(
            (F.col("query_id") < RRF_QUERIES) & (F.col("rank") <= RRF_TOPK)
        )
        .select("query_id", F.col("neighbor_id").alias("cand_id"),
                F.col("rank").alias("sem_rank"))
    )
    return _rrf_fused(lexk, semk)


retrieval_rrf_hybrid.__doc__ = retrieval_rrf_hybrid.__doc__.format(
    nq=RRF_QUERIES, k=RRF_K, topk=RRF_TOPK
)

RETRIEVAL_RRF_HYBRID_SQL = rf"""
WITH toks AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id),
qt AS (SELECT doc_id AS query_id, token FROM toks WHERE doc_id < {RRF_QUERIES}),
inter AS (
  SELECT q.query_id, t.doc_id, COUNT(*) AS n_inter
  FROM toks t JOIN qt q USING (token)
  WHERE t.doc_id <> q.query_id
  GROUP BY q.query_id, t.doc_id
),
lex AS (
  SELECT i.query_id, i.doc_id AS cand_id,
         ROW_NUMBER() OVER (
           PARTITION BY i.query_id
           ORDER BY (i.n_inter / (nq.n_toks + nc.n_toks - i.n_inter)) DESC,
                    i.doc_id ASC) AS lex_rank
  FROM inter i
  JOIN sizes nc ON i.doc_id = nc.doc_id
  JOIN sizes nq ON i.query_id = nq.doc_id
),
lexk AS (SELECT * FROM lex WHERE lex_rank <= {RRF_TOPK}),
sem0 AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         {_COS_SQL.format(a="q.embedding", b="c.embedding")} AS cs
  FROM (SELECT * FROM embeddings WHERE vec_id < {RRF_QUERIES}) q, embeddings c
  WHERE c.vec_id <> q.vec_id
),
semk AS (
  SELECT query_id, cand_id, sem_rank FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cs DESC, cand_id ASC) AS sem_rank
    FROM sem0
  ) WHERE sem_rank <= {RRF_TOPK}
),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.cand_id, s.cand_id) AS cand_id,
         l.lex_rank, s.sem_rank,
         COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.lex_rank), CAST(0 AS DOUBLE))
         + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + s.sem_rank), CAST(0 AS DOUBLE))
           AS rrf_score
  FROM lexk l FULL OUTER JOIN semk s
    ON l.query_id = s.query_id AND l.cand_id = s.cand_id
)
SELECT query_id, fused_rank, cand_id, lex_rank, sem_rank, rrf_score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, cand_id ASC) AS fused_rank
  FROM fused
) WHERE fused_rank <= {RRF_TOPK}
"""


def retrieval_rrf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF hybrid retrieval with the semantic leg on the ANN scale path
    (VERDICT r7 item 2): identical lexical leg and fusion algebra to
    ``retrieval_rrf_hybrid``, but the vector leg's candidates come from
    the multi-table LSH bucket join (``lsh_multi_table_topk`` — same
    index as ``similarity_ann_lsh_multi``) instead of a brute-force
    query x corpus scan. This is the 100 TB RAG retrieval shape: the
    semantic leg touches only signature-colliding candidates (Σ|bucket|²
    work through one (table, bucket)-keyed equi-join), never O(nq·N)
    pairs.

    Each output row additionally carries the agreement audit vs the
    exact-fused variant: ``in_exact_fused`` (this candidate appears in
    ``retrieval_rrf_hybrid``'s fused top-k for the query) and the
    per-query ``fused_recall`` (fraction of the exact fused list that
    the ANN-fused list retrieved) — the measurement that justifies
    retiring the brute-force leg at scale. The exact variant appears
    here ONLY as that audit's ground truth, exactly like
    ``similarity_ann_recall`` — and like it, the audit covers only the
    md5-sampled query subset (``AUDIT_SAMPLE_PER_MILLE``, the 100x
    knob; 1000 = audit every query at test SF): unaudited queries
    still get the full ANN ranking, with NULL audit columns. The
    ranking itself is ANN end to end and never depends on the audit.
    Deterministic throughout (md5 hyperplanes, rank-based fusion), so
    even the recall column is value-hash-checked."""
    # ONE lexical leg, localCheckpoint-fenced, feeds BOTH fused lists
    # (the ANN ranking and the exact ground truth share it verbatim —
    # recomputing the posting-intersection join for the audit would
    # double the query's largest text-side shuffle)
    lexk = _lexical_jaccard_topk(spark, sf_dir).localCheckpoint(eager=False)
    e = load_table(spark, sf_dir, "embeddings")
    semk = lsh_multi_table_topk(
        e.filter(F.col("vec_id") < RRF_QUERIES),
        e,
        dim=DIM,
        k=RRF_TOPK,
        n_planes=N_PLANES,
        n_tables=N_TABLES,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.col("rank").alias("sem_rank"),
    )
    ann_fused = _rrf_fused(lexk, semk)
    # audit legs: only the sampled queries pay the brute-force scan
    # (the lexical leg must be cut identically or the full-outer fusion
    # would resurrect unaudited queries into the ground truth)
    aud = lambda c: audit_sample_pred(c, AUDIT_SAMPLE_PER_MILLE)  # noqa: E731
    # derived from the session-shared exact kernel (subset + rank
    # prefix + per-call audit knob all commute with a per-query top-k)
    assert RRF_TOPK <= TOP_K and RRF_QUERIES <= N_QUERIES
    semk_exact = (
        _exact_topk_shared(spark, sf_dir)
        .filter(
            (F.col("query_id") < RRF_QUERIES)
            & aud(F.col("query_id"))
            & (F.col("rank") <= RRF_TOPK)
        )
        .select(
            "query_id",
            F.col("neighbor_id").alias("cand_id"),
            F.col("rank").alias("sem_rank"),
        )
    )
    exact = _rrf_fused(lexk.filter(aud(F.col("query_id"))), semk_exact).select(
        "query_id", "cand_id", F.lit(1).alias("__hit")
    )
    exact_n = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("__n_exact")
    )
    w_q = Window.partitionBy("query_id")
    return (
        ann_fused.join(F.broadcast(exact), ["query_id", "cand_id"], "left")
        .join(F.broadcast(exact_n), "query_id", "left")
        .withColumn(
            "in_exact_fused",
            F.when(
                aud(F.col("query_id")),
                F.coalesce(F.col("__hit"), F.lit(0)),
            ).cast("long"),
        )
        .withColumn(
            "fused_recall",
            F.sum("in_exact_fused").over(w_q).cast("double")
            / F.col("__n_exact"),
        )
        .select(
            "query_id", "fused_rank", "cand_id", "lex_rank", "sem_rank",
            "rrf_score", "in_exact_fused", "fused_recall",
        )
    )


_LEX_CTES_SQL = rf"""
toks AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
    FROM documents
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id),
qt AS (SELECT doc_id AS query_id, token FROM toks WHERE doc_id < {RRF_QUERIES}),
inter AS (
  SELECT q.query_id, t.doc_id, COUNT(*) AS n_inter
  FROM toks t JOIN qt q USING (token)
  WHERE t.doc_id <> q.query_id
  GROUP BY q.query_id, t.doc_id
),
lex AS (
  SELECT i.query_id, i.doc_id AS cand_id,
         ROW_NUMBER() OVER (
           PARTITION BY i.query_id
           ORDER BY (i.n_inter / (nq.n_toks + nc.n_toks - i.n_inter)) DESC,
                    i.doc_id ASC) AS lex_rank
  FROM inter i
  JOIN sizes nc ON i.doc_id = nc.doc_id
  JOIN sizes nq ON i.query_id = nq.doc_id
),
lexk AS (SELECT * FROM lex WHERE lex_rank <= {RRF_TOPK})
"""

# The embedded SIMILARITY_ANN_LSH_MULTI_SQL oracle cuts its semantic
# rank list at TOP_K, while the Spark side calls
# lsh_multi_table_topk(k=RRF_TOPK) — the two constants must stay equal
# or oracle and engine silently diverge (ADVICE r8). Fail loudly here.
assert TOP_K == RRF_TOPK, (
    f"RETRIEVAL_RRF_ANN_SQL reuses the ANN-multi oracle whose rank cut "
    f"is TOP_K={TOP_K}, but the Spark semantic leg cuts at "
    f"RRF_TOPK={RRF_TOPK}; parameterize the embedded oracle before "
    "changing either constant"
)

RETRIEVAL_RRF_ANN_SQL = f"""
WITH hyb AS (
  SELECT * FROM ({RETRIEVAL_RRF_HYBRID_SQL})
  WHERE {audit_sample_sql("query_id", AUDIT_SAMPLE_PER_MILLE)}
),
annm AS ({SIMILARITY_ANN_LSH_MULTI_SQL}),
semk AS (
  SELECT query_id, neighbor_id AS cand_id, rank AS sem_rank
  FROM annm WHERE query_id < {RRF_QUERIES}
),
{_LEX_CTES_SQL},
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.cand_id, s.cand_id) AS cand_id,
         l.lex_rank, s.sem_rank,
         COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.lex_rank), CAST(0 AS DOUBLE))
         + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + s.sem_rank), CAST(0 AS DOUBLE))
           AS rrf_score
  FROM lexk l FULL OUTER JOIN semk s
    ON l.query_id = s.query_id AND l.cand_id = s.cand_id
),
ann AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rrf_score DESC, cand_id ASC) AS fused_rank
    FROM fused
  ) WHERE fused_rank <= {RRF_TOPK}
),
exn AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM hyb GROUP BY query_id)
SELECT a.query_id, a.fused_rank, a.cand_id, a.lex_rank, a.sem_rank, a.rrf_score,
       CAST(CASE WHEN {audit_sample_sql("a.query_id", AUDIT_SAMPLE_PER_MILLE)}
                 THEN (CASE WHEN h.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            END AS BIGINT) AS in_exact_fused,
       CAST(SUM(CASE WHEN h.cand_id IS NOT NULL THEN 1 ELSE 0 END)
              OVER (PARTITION BY a.query_id) AS DOUBLE) / exn.n_exact AS fused_recall
FROM ann a
LEFT JOIN hyb h ON a.query_id = h.query_id AND a.cand_id = h.cand_id
LEFT JOIN exn ON a.query_id = exn.query_id
"""


# --- IVF-PQ: product-quantized ADC search over the IVF cells ----------
# Completes the ANN trio (LSH buckets / IVF cells / PQ codes): the
# serving-tier layout where candidate distances come from compact codes
# instead of raw vectors. DIM=64 splits into PQ_BLOCKS x PQ_BLOCK_DIM;
# PQ_CODES codewords per block => each vector compresses to
# PQ_BLOCKS small ints (here 4 nibbles — a 64x storage cut vs 64 f64).
PQ_BLOCKS = 4
PQ_BLOCK_DIM = DIM // PQ_BLOCKS
PQ_CODES = 16


def _sq_dist(x: Column | str, c: Column | str) -> Column:
    """Left-fold Σ(x_i−c_i)² in double, dim order — the bit-stable twin
    of ``_PQ_DIST_SQL`` (same shape as plans/kmeans._sq_dist)."""
    return F.aggregate(
        F.zip_with(
            F.col(x) if isinstance(x, str) else x,
            F.col(c) if isinstance(c, str) else c,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_blocks(col: Column) -> Column:
    """The PQ_BLOCKS contiguous sub-vector slices of a DIM-double vector."""
    return F.array(
        *[
            F.slice(col, m * PQ_BLOCK_DIM + 1, PQ_BLOCK_DIM)
            for m in range(PQ_BLOCKS)
        ]
    )


def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN search (the FAISS ``IVFPQ`` shape, deterministic):
    coarse cells route each query to a bounded candidate set (the
    ``similarity_ann_ivf`` quantizer, nprobe=1), and candidate
    distances are computed from {PQ_BLOCKS}-code PQ encodings via an
    asymmetric-distance lookup table (ADC) instead of the raw
    {DIM}-double vectors — the memory/bandwidth trade a billion-vector
    serving tier makes (Jégou et al. 2011). ``exact_dist`` re-scores
    only the surviving top-k from the raw vectors, so the quantization
    error of the winning list is visible in every row.

    Determinism & parity: block distances are the dim-order left-fold
    (bit-stable on both engines); the ADC sum over the {PQ_BLOCKS}
    per-block LUT entries casts each to DECIMAL(28,12) BEFORE summing
    (order-free exact — the embedding_pq_residuals discipline); encode
    argmin and ranking tie-break on code / neighbor_id. The codebook is
    the block slices of the first {PQ_CODES} corpus vectors — same
    deterministic-init discipline as the IVF centroids; a trained
    k-means codebook is the drop-in at scale (``embedding_pq_residuals``
    is the statistic that sizes it).

    100 TB: codebook ({PQ_CODES}×{PQ_BLOCKS} rows) and the per-query
    LUT (nq×{PQ_CODES}×{PQ_BLOCKS} rows) broadcast; corpus encoding is
    a map-only broadcast argmin, linear in N, done once at index-build
    time; query-time work is the cell equi-join (candidates bounded by
    the IVF trade) + one keyed agg over codes — no raw-vector reads
    until the final top-k re-score."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    cwords = e.filter(F.col("vec_id") < PQ_CODES).select(
        F.col("vec_id").alias("code"),
        F.posexplode(_pq_blocks(F.col("x"))).alias("block", "cw"),
    )
    corp_bl = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode(_pq_blocks(F.col("x"))).alias("block", "bx"),
    )
    # Encode: per (vector, block) the argmin-L2 codeword. min over
    # struct(dist, code) is order-free; dist is the bit-stable fold.
    enc = (
        corp_bl.join(F.broadcast(cwords), "block")
        .select(
            "neighbor_id",
            "block",
            F.struct(_sq_dist("bx", "cw").alias("d"), F.col("code")).alias("dc"),
        )
        .groupBy("neighbor_id", "block")
        .agg(F.min("dc").alias("m"))
        .select("neighbor_id", "block", F.col("m.code").alias("code"))
    )
    cents = e.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("centroid_id"), F.col("x").alias("__cent")
    )
    corp_cell = ivf_assign_cells(e, cents, vec_col="x").select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    q = e.filter(F.col("vec_id") < N_QUERIES)
    q_cell = ivf_assign_cells(q, cents, vec_col="x").select(
        F.col("vec_id").alias("query_id"), "cell"
    )
    q_bl = q.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(_pq_blocks(F.col("x"))).alias("block", "qbx"),
    )
    lut = q_bl.join(F.broadcast(cwords), "block").select(
        "query_id",
        "block",
        "code",
        _sq_dist("qbx", "cw").cast("decimal(28,12)").alias("qd"),
    )
    cand = (
        q_cell.join(corp_cell, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    adc = (
        cand.join(enc, "neighbor_id")
        .join(F.broadcast(lut), ["query_id", "block", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd").alias("adc_dec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dec").asc(), F.col("neighbor_id").asc()
    )
    topk = adc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )
    qv = e.select(F.col("vec_id").alias("query_id"), F.col("x").alias("qx"))
    nv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("x").alias("nx"))
    return (
        topk.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("adc_dec").cast("double").alias("adc_dist"),
            _sq_dist("qx", "nx").alias("exact_dist"),
        )
    )


_PQ_DIST_SQL = (
    "list_sum(list_transform(list_zip({x}, {c}), t -> (t[1] - t[2]) * (t[1] - t[2])))"
)
_PQ_BLOCK_SQL = (
    f"list_slice(x, b.block * {PQ_BLOCK_DIM} + 1, "
    f"b.block * {PQ_BLOCK_DIM} + {PQ_BLOCK_DIM})"
)

SIMILARITY_ANN_PQ_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
),
blocks AS (SELECT unnest(generate_series(0, {PQ_BLOCKS - 1})) AS block),
cw AS (
  SELECT vec_id AS code, b.block, {_PQ_BLOCK_SQL} AS cwv
  FROM e, blocks b WHERE vec_id < {PQ_CODES}
),
corp_bl AS (
  SELECT vec_id AS neighbor_id, b.block, {_PQ_BLOCK_SQL} AS bx
  FROM e, blocks b
),
enc AS (
  SELECT neighbor_id, block, code FROM (
    SELECT cb.neighbor_id, cb.block, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY cb.neighbor_id, cb.block
             ORDER BY {_PQ_DIST_SQL.format(x="cb.bx", c="c.cwv")} ASC,
                      c.code ASC) AS rn
    FROM corp_bl cb JOIN cw c ON cb.block = c.block
  ) WHERE rn = 1
),
corp AS ({_ASSIGN_SQL.format(src="SELECT vec_id, embedding FROM embeddings")}),
qry AS ({_ASSIGN_SQL.format(src=f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}")}),
qbl AS (
  SELECT vec_id AS query_id, b.block, {_PQ_BLOCK_SQL} AS qbx
  FROM e, blocks b WHERE vec_id < {N_QUERIES}
),
lut AS (
  SELECT query_id, c.block, c.code,
         CAST({_PQ_DIST_SQL.format(x="qbx", c="c.cwv")} AS DECIMAL(28,12)) AS qd
  FROM qbl JOIN cw c ON qbl.block = c.block
),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM qry q JOIN corp c ON q.cell = c.cell AND q.vec_id <> c.vec_id
),
adc AS (
  SELECT cand.query_id, cand.neighbor_id, SUM(l.qd) AS adc_dec
  FROM cand
  JOIN enc ON cand.neighbor_id = enc.neighbor_id
  JOIN lut l ON l.query_id = cand.query_id
            AND l.block = enc.block AND l.code = enc.code
  GROUP BY cand.query_id, cand.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_dec ASC, neighbor_id ASC) AS rank
  FROM adc
)
SELECT r.query_id, r.neighbor_id, r.rank,
       CAST(CAST(r.adc_dec AS VARCHAR) AS DOUBLE) AS adc_dist,
       {_PQ_DIST_SQL.format(x="q.x", c="n.x")} AS exact_dist
FROM ranked r
JOIN e q ON r.query_id = q.vec_id
JOIN e n ON r.neighbor_id = n.vec_id
WHERE r.rank <= {TOP_K}
"""


QUERIES = {
    "similarity_cosine_topk": similarity_cosine_topk,
    "retrieval_rrf_hybrid": retrieval_rrf_hybrid,
    "retrieval_rrf_ann": retrieval_rrf_ann,
    "similarity_embedding_neardup": similarity_embedding_neardup,
    "similarity_ann_lsh": similarity_ann_lsh,
    "similarity_ann_lsh_multi": similarity_ann_lsh_multi,
    "streaming_ann_index_sink": streaming_ann_index_sink,
    "mine_hard_negatives": mine_hard_negatives,
    "similarity_ann_ivf": similarity_ann_ivf,
    "similarity_ann_pq": similarity_ann_pq,
    "similarity_ann_recall": similarity_ann_recall,
    "eval_ann_ranking": eval_ann_ranking,
    "similarity_ann_sweep": similarity_ann_sweep,
    "embedding_int8_codes": embedding_int8_codes,
}

ORACLES = {
    "retrieval_rrf_hybrid": RETRIEVAL_RRF_HYBRID_SQL,
    "retrieval_rrf_ann": RETRIEVAL_RRF_ANN_SQL,
    "similarity_ann_sweep": SIMILARITY_ANN_SWEEP_SQL,
    "similarity_ann_lsh_multi": SIMILARITY_ANN_LSH_MULTI_SQL,
    "streaming_ann_index_sink": SIMILARITY_ANN_LSH_MULTI_SQL,
    "mine_hard_negatives": MINE_HARD_NEGATIVES_SQL,
    "similarity_cosine_topk": SIMILARITY_COSINE_TOPK_SQL,
    "similarity_embedding_neardup": SIMILARITY_EMBEDDING_NEARDUP_SQL,
    "similarity_ann_lsh": SIMILARITY_ANN_LSH_SQL,
    "similarity_ann_ivf": SIMILARITY_ANN_IVF_SQL,
    "similarity_ann_pq": SIMILARITY_ANN_PQ_SQL,
    "similarity_ann_recall": SIMILARITY_ANN_RECALL_SQL,
    "eval_ann_ranking": EVAL_ANN_RANKING_SQL,
    "embedding_int8_codes": EMBEDDING_INT8_CODES_SQL,
}
