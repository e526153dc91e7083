"""Text-analysis + document-dedup expression builders (north-star
LLM-data-pipeline operators; BASELINE.json scope beyond the reference).

Everything here is built-in column expressions — no UDFs — so Catalyst
optimizes end-to-end (whole-stage codegen, pushdown). Hash functions
are md5-hex based so a DuckDB oracle reproduces them bit-for-bit:
``hex_hash`` maps a string to a bigint via the first 15 hex chars of
md5; minhash signatures are lexicographic minima of seeded md5 strings
(a valid random permutation family).

Scale notes:
- tokenize/shingle/fingerprint: narrow per-row ops, no shuffle;
- minhash: one explode + one groupBy(doc) shuffle, state bounded by
  n_hashes per doc;
- LSH banding: join only within band buckets — never all-pairs;
- simhash: explode + conditional sums per bit, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokenize(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def bpe_piece_count(col: Column | str) -> Column:
    """BPE-ish piece count: alpha runs, digit runs, single punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))


def shingles_expr(tokens_field: str, k: int = 3) -> Column:
    """k-token shingles over an existing array column name."""
    parts = ", ".join(f"{tokens_field}[i+{j}]" for j in range(k))
    return F.when(
        F.size(F.col(tokens_field)) >= k,
        F.expr(
            f"transform(sequence(0, size({tokens_field}) - {k}),"
            f" i -> concat_ws(' ', {parts}))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def hex_hash(col: Column, seed: str = "") -> Column:
    """Deterministic 60-bit integer hash reproducible in any engine with
    md5: bigint of the first 15 hex chars."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), col)), 1, 15), 16, 10).cast(
        "long"
    )


def hex_hash16(col: Column, seed: str = "") -> Column:
    """16-bit variant (simhash bit source)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), col)), 1, 4), 16, 10).cast(
        "int"
    )


def fingerprint(tokens_col: Column) -> Column:
    """Canonical content fingerprint: md5 over sorted distinct tokens
    (catches token-order shuffles and repeated-run near-dups)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col))))


def minhash_signature(
    docs: DataFrame, id_col: str, text_col: str, n_hashes: int = 8, k: int = 3
) -> DataFrame:
    """One row per doc: m0..m{n-1} minhash values (md5-string minima over
    shingles). Docs with < k tokens get NULL signatures.

    Pure per-row array expressions — no explode, no shuffle: at 100 TB
    the signature stage is a map-only projection."""
    toks = docs.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    ).withColumn("__sh", shingles_expr("__toks", k))
    def sig(j: int):
        # one-arg lambda only: a second parameter would be bound to the
        # array INDEX by F.transform, corrupting the seed
        return F.array_min(
            F.transform(F.col("__sh"), lambda s: F.md5(F.concat(F.lit(f"s{j}:"), s)))
        )

    return toks.select(F.col(id_col), *[sig(j).alias(f"m{j}") for j in range(n_hashes)])


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, n_hashes: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Band the signature and join within buckets (never all-pairs).
    Returns distinct (id_a < id_b) candidate pairs."""
    n_bands = n_hashes // rows_per_band
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("bucket"),
            )
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity for (candidate) pairs sharing >=1
    shingle. Without ``candidates`` every co-shingled pair is scored."""
    if candidates is not None:
        # verify only candidate docs: explode shingles for that subset alone
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        docs = docs.join(cand_ids, id_col, "left_semi")
    sh = (
        docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
        .withColumn("__sh", shingles_expr("__toks", k))
        .select(id_col, F.explode("__sh").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    if candidates is not None:
        shared = shared.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    out = shared.join(sa, "id_a").join(sb, "id_b")
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return out.select("id_a", "id_b", "n_shared", "n_a", "n_b", jac.alias("jaccard"))


def simhash16(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit simhash per doc: majority vote per bit over token hashes
    (token multiplicity = weight)."""
    tok = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    ).withColumn("h", hex_hash16(F.col("token")))
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when((F.shiftright(F.col("h"), b).bitwiseAND(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(16)
        ]
    )
    fp = None
    for b in range(16):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(0)
        fp = term if fp is None else (fp + term)
    return bit_sums.select(F.col(id_col), fp.alias("simhash"))
