"""End-to-end corpus curation — the flagship composition query.

One pass over the documents table produces the per-doc disposition a
training-data pipeline needs, chaining the individually-verified
operators in their real order:

1. held-out fencing  (benchmark slice never trains)
2. quality filter    (repetition fractions + minimum length)
3. near-dup dedup    (minhash -> LSH bands -> Jaccard verify ->
                      connected components -> keep cluster minimum)
4. decontamination   (drop train docs sharing a 5-gram with held-out)
5. stratified sample (deterministic md5-uniform per language)
6. sequence packing  (survivors get their training-sequence id)

Output: one row per doc — (doc_id, lang, disposition, seq_first) with
``disposition`` ∈ {heldout, quality, duplicate, contaminated,
sampled_out, kept} decided with exactly that precedence, and
``seq_first`` non-null only for kept docs.

Scale shape: every stage is the already-audited bucketed/broadcast
form (LSH bands not all-pairs, broadcast held-out shingles, keyed
aggregations, partitioned packing window); the composition adds no new
shuffle beyond its parts. The DuckDB oracle replays the entire
pipeline — including the recursive-CTE transitive closure — so the
composition itself is value-checked, not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.clusters import connected_components
from ..operators.textops import (
    exploded_shingles,
    hex_hash,
    shingles_expr,
    tokenize,
)
from .dedup import _MH_COLS, _SHINGLES_SQL, _SIGS_SQL, N_HASHES
from .llmprep import (
    DECON_K,
    DECON_MOD,
    SEQ_BUDGET,
    _DECON_SHINGLES_SQL,
    _TOKS_SQL,
)

CURATE_JACCARD = 0.5
MIN_TOKENS = 5
# stricter than llmprep.REPETITION_THRESHOLD (0.2): curation trims the
# p99 repetition tail of this corpus rather than only pathological docs
CURATE_REP_THRESHOLD = 0.1
CURATE_SEED = "curate"
CURATE_RATES = {"en": 700, "es": 800}  # per-mille; other langs: 900
CURATE_DEFAULT_RATE = 900
PACK_SHARDS = 8


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    is_heldout = F.col("doc_id") % DECON_MOD == 0

    # 2. quality signals (pure array expressions)
    t = d.select("doc_id", "lang", tokenize(F.col("text")).alias("toks"))
    g2 = shingles_expr("toks", k=2)
    n2 = F.size(g2)
    dup_2g = F.when(
        n2 > 0, (n2 - F.size(F.array_distinct(g2))) / n2
    ).otherwise(F.lit(0.0))
    rep = t.select(
        "doc_id",
        "lang",
        F.size("toks").cast("long").alias("n_tokens"),
        ((dup_2g > CURATE_REP_THRESHOLD) | (F.size("toks") < MIN_TOKENS)).alias(
            "bad_quality"
        ),
    )

    # 3. near-dup clusters on the raw corpus (organic dups only).
    # r13 (guide §1.2): derived from the SESSION-shared verified pair
    # kernel over the clone-AUGMENTED corpus (plans/dedup.py::
    # _minhash_pairs_shared) instead of re-running the whole LSH
    # pipeline privately. Equivalence: the augmented corpus is the raw
    # corpus plus clone rows whose ids are >= CLONE_OFFSET (raw ids are
    # < CLONE_OFFSET by corpus contract — the same contract the planted-
    # pair oracles already rely on); adding rows changes NOTHING about
    # the raw docs' shingle sets, minhash signatures, band buckets or
    # pairwise Jaccard values, so the kernel's raw-raw pairs ARE the
    # raw-corpus pair set, and its verify threshold (0.5) equals
    # CURATE_JACCARD — the filter below keeps the expression honest if
    # either constant ever moves (guarded: a CURATE_JACCARD below the
    # kernel's floor must fail loudly, not silently drop pairs).
    from .dedup import CLONE_OFFSET, _minhash_pairs_shared

    assert CURATE_JACCARD >= 0.5, "shared kernel verifies at 0.5"
    pairs = (
        _minhash_pairs_shared(spark, sf_dir)
        .filter(
            (F.col("id_a") < CLONE_OFFSET)
            & (F.col("id_b") < CLONE_OFFSET)
            & (F.col("jaccard") >= CURATE_JACCARD)
        )
        .select("id_a", "id_b")
    )
    dups = (
        connected_components(pairs, "id_a", "id_b")
        .filter(F.col("node") != F.col("label"))
        .select(F.col("node").alias("doc_id"), F.lit(True).alias("is_dup"))
    )

    # 4. decontamination evidence (broadcast the held-out shingle set)
    held_sh = (
        exploded_shingles(d.filter(is_heldout), "doc_id", "text", k=DECON_K)
        .select("shingle")
        .distinct()
    )
    cont = (
        exploded_shingles(d.filter(~is_heldout), "doc_id", "text", k=DECON_K)
        .distinct()
        .join(F.broadcast(held_sh), "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(True))
    )

    # 5. sampling uniform + per-lang rate
    u = hex_hash(F.col("doc_id").cast("string"), seed=CURATE_SEED) % 1000
    rate = F.lit(CURATE_DEFAULT_RATE)
    for lang, r in CURATE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)

    disposition = (
        F.when(F.col("doc_id") % DECON_MOD == 0, "heldout")
        .when(F.col("bad_quality"), "quality")
        .when(F.coalesce(F.col("is_dup"), F.lit(False)), "duplicate")
        .when(F.coalesce(F.col("is_cont"), F.lit(False)), "contaminated")
        .when(u >= rate, "sampled_out")
        .otherwise("kept")
    )
    flags = (
        rep.join(dups, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select("doc_id", "lang", "n_tokens", disposition.alias("disposition"))
    )

    # 6. pack the survivors
    kept = flags.filter(F.col("disposition") == "kept")
    w = (
        Window.partitionBy("lang", (F.col("doc_id") % PACK_SHARDS))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = kept.select(
        "doc_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(SEQ_BUDGET)
        ).alias("seq_first"),
    )
    return flags.join(packed, "doc_id", "left").select(
        "doc_id", "lang", "disposition", "seq_first"
    )


_BANDS_SQL = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, concat_ws('|', m{2 * b}, m{2 * b + 1}) AS bucket FROM sigs"
    for b in range(N_HASHES // 2)
)

_RATE_SQL = (
    "CASE lang WHEN 'en' THEN 700 WHEN 'es' THEN 800 ELSE 900 END"
)

CURATE_CORPUS_SQL = rf"""
WITH RECURSIVE
sh_all AS ({_SHINGLES_SQL.format(src="documents")}),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh_all),
sigs AS ({_SIGS_SQL.format(shingles="SELECT * FROM sh_all")}),
banded AS (
  {_BANDS_SQL}
),
cands AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN cands c ON s.id_a = c.id_a AND s.id_b = c.id_b
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE s.n_shared / CAST(sa.n_shingles + sb.n_shingles - s.n_shared AS DOUBLE)
        >= CAST({CURATE_JACCARD} AS DOUBLE)
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, label) AS (
  SELECT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, r.label FROM reach r JOIN edges e ON e.src = r.node
),
dups AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING node != MIN(label)
),
held_sh AS (
  SELECT DISTINCT shingle FROM (
    {_DECON_SHINGLES_SQL.format(src=f"SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} = 0")}
  )
),
cont AS (
  SELECT DISTINCT doc_id FROM (
    {_DECON_SHINGLES_SQL.format(src=f"SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} != 0")}
  ) WHERE shingle IN (SELECT shingle FROM held_sh)
),
rep AS (
  SELECT doc_id, lang,
         CAST(len(t) AS BIGINT) AS n_tokens,
         (CASE WHEN len(g2) > 0
               THEN (len(g2) - len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE)
               ELSE 0.0 END) > {CURATE_REP_THRESHOLD}
         OR len(t) < {MIN_TOKENS} AS bad_quality
  FROM (
    SELECT doc_id, lang, t,
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)),
                                    i -> concat_ws(' ', t[i], t[i+1]))
                ELSE [] END AS g2
    FROM (SELECT doc_id, lang, {_TOKS_SQL} AS t FROM documents)
  )
),
flags AS (
  SELECT doc_id, lang, n_tokens,
         CASE WHEN doc_id % {DECON_MOD} = 0 THEN 'heldout'
              WHEN bad_quality THEN 'quality'
              WHEN doc_id IN (SELECT doc_id FROM dups) THEN 'duplicate'
              WHEN doc_id IN (SELECT doc_id FROM cont) THEN 'contaminated'
              WHEN CAST(concat('0x', substr(md5(concat('{CURATE_SEED}', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000
                   >= {_RATE_SQL} THEN 'sampled_out'
              ELSE 'kept' END AS disposition
  FROM rep
),
kept AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang, doc_id % {PACK_SHARDS}
                             ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM flags WHERE disposition = 'kept'
)
SELECT f.doc_id, f.lang, f.disposition,
       (k.cum - k.n_tokens) // {SEQ_BUDGET} AS seq_first
FROM flags f LEFT JOIN kept k ON f.doc_id = k.doc_id
"""


GATE_Q = 0.25  # drop the bottom quartile by quality score
_GATE_UNITS = 10**9  # float score -> integer units (identical doubles both engines)


# quality_score is bounded [0, 1] by construction (length saturation x
# diversity x stopword penalty, every factor in [0, 1]), so integer
# units live in [0, 1e9] and a FIXED bucket width covers the range with
# <= 1024 buckets — no lo/hi pre-pass needed to size the histogram.
_GATE_BUCKET_W = (_GATE_UNITS + 1023) // 1024


def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative quality gating: drop documents below the corpus
    p25 of the deterministic quality score — curation thresholds in
    practice are percentile-derived, not hand-tuned constants, so the
    gate needs an exact order statistic over the whole corpus.

    Scale shape — exact percentile with NO global sort and (since r12)
    NO driver actions at all: rounds <= 11 issued four driver actions
    (range agg, histogram collect, threshold lookup, final job), each
    paying the synchronization tail on a steal-y host (single slowest
    r11 bench row, 49.6s degraded vs 1.4s quiet — VERDICT r11 item 4).
    Now the entire threshold computation stays in-plan: scores collapse
    to integer units (floor(score * 1e9) — identical doubles floor to
    identical ints in both engines, and the score's [0, 1] bound fixes
    the bucket width statically), one keyed shuffle builds (units, cnt),
    a <= 1024-row bucket rollup takes a single-partition running sum
    (bounded — this is the two-level trick: the only unpartitioned
    window in the plan sees bucket cardinality, never corpus rows), a
    per-bucket cumulative window ranks units inside their bucket, and
    the threshold joins back as a broadcast 1-row scalar. One action
    from the caller runs the whole thing. NULL units (zero-token docs)
    count toward n and gate to 'drop', never entering the cumulative.
    Output: per (lang, disposition) doc and token totals plus the
    threshold units — the artifact that says what the gate cost each
    language slice."""
    from .text import text_quality_score

    scores = text_quality_score(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # fence the scored corpus: two consumers (distinct-units counts and
    # the final rollup) would otherwise each re-run tokenize + scoring
    # over the whole documents table — the same multiply-consumed-
    # subtree discipline as jaccard_pairs / dedup_minhash_pairs
    u = (
        scores.join(d, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor(F.col("quality_score") * _GATE_UNITS).cast("long").alias("units"),
        )
        .localCheckpoint(eager=False)
    )
    # the units-grain counts feed three plan legs (total, bucket rollup,
    # threshold scan) — fence them too so the keyed shuffle runs once
    counts = (
        u.groupBy("units")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # rank position: NULL units count toward n (they sort nowhere and
    # gate to 'drop'), exactly as the rounds-<=11 driver-side math did
    total = counts.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(GATE_Q) * F.sum("cnt")).cast("long"),
        ).alias("pos")
    )
    bucketed = counts.filter(F.col("units").isNotNull()).withColumn(
        "bucket", F.floor(F.col("units") / F.lit(_GATE_BUCKET_W))
    )
    # level 1: <= 1024 bucket totals; the running sum's single-partition
    # window is bounded by the bucket count, not the corpus
    w_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bcum = (
        bucketed.groupBy("bucket")
        .agg(F.sum("cnt").alias("bcnt"))
        .withColumn("bprev", F.sum("bcnt").over(w_buckets) - F.col("bcnt"))
        .select("bucket", "bprev")
    )
    # level 2: cumulative WITHIN each bucket (parallel across buckets);
    # global rank of a distinct-units row = bprev + within-bucket cum,
    # and the threshold is the first units whose rank reaches pos
    w_in = Window.partitionBy("bucket").orderBy("units").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    thr = (
        bucketed.withColumn("icum", F.sum("cnt").over(w_in))
        .join(F.broadcast(bcum), "bucket")
        .crossJoin(F.broadcast(total))
        .filter(F.col("bprev") + F.col("icum") >= F.col("pos"))
        .agg(F.min("units").alias("threshold_units"))
    )
    return (
        u.crossJoin(F.broadcast(thr))
        .withColumn(
            "disposition",
            F.when(F.col("units") >= F.col("threshold_units"), "keep").otherwise(
                "drop"
            ),
        )
        .groupBy("lang", "disposition", "threshold_units")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "lang", "disposition", "n_docs", "sum_tokens", "threshold_units"
        )
    )


def _quality_gate_oracle_sql() -> str:
    from .text import TEXT_QUALITY_SCORE_SQL

    return f"""
WITH q AS ({TEXT_QUALITY_SCORE_SQL}),
u AS (
  SELECT q.doc_id, d.lang, q.n_tokens,
         CAST(floor(q.quality_score * {_GATE_UNITS}) AS BIGINT) AS units
  FROM q JOIN documents d ON q.doc_id = d.doc_id
),
ranked AS (
  SELECT units, ROW_NUMBER() OVER (ORDER BY units) AS rn, COUNT(*) OVER () AS n
  FROM u
),
thr AS (
  SELECT units AS t FROM ranked
  WHERE rn = GREATEST(1, CAST(ceil({GATE_Q} * n) AS BIGINT))
)
SELECT u.lang,
       CASE WHEN u.units >= thr.t THEN 'keep' ELSE 'drop' END AS disposition,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(u.n_tokens) AS BIGINT) AS sum_tokens,
       thr.t AS threshold_units
FROM u, thr
GROUP BY 1, 2, 5
"""


QUALITY_PERCENTILE_GATE_SQL = _quality_gate_oracle_sql()


QUERIES = {
    "curate_corpus": curate_corpus,
    "quality_percentile_gate": quality_percentile_gate,
}

ORACLES = {
    "curate_corpus": CURATE_CORPUS_SQL,
    "quality_percentile_gate": QUALITY_PERCENTILE_GATE_SQL,
}
