"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of each shape):

- **Exact**: ``groupBy(md5(text))`` — one hash-agg shuffle keyed on the digest,
  partial agg map-side; never a self-join.
- **MinHash+LSH**: signature is P independent min-hashes computed per row
  (narrow, codegen'd array lambdas); banding explodes each doc into B rows and
  the *only* shuffle is a groupBy/self-join on ``(band, band_hash)`` buckets —
  candidate pairs ~ O(collisions), not O(n²). Exact Jaccard verifies candidates.
- **SimHash**: one 32-bit signature per doc from token-hash bit votes; banding
  on the 4 signature bytes; Hamming-distance verify via ``bit_count(a ^ b)``.
- **n-gram Jaccard**: the verify kernel exposed standalone.

Every step is deterministic and portable (md5-based hashing — see
functions/text.py), so the DuckDB ``*_sql`` twins reproduce results
bit-for-bit: the driver hash-compares actual pair lists and scores.

Reference parity: the reference dedups task outputs by content checksum
(/root/reference/investigraph/cache.py:41-45) and merges identical entities by
deterministic id (/root/reference/investigraph/logic/aggregate.py:68-75);
these operators generalize that to fuzzy content identity for corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from investigraph_etl_spark.functions import text as X

# ---------------------------------------------------------------------- exact


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: digest → canonical (min) id + member count.

    Returns one row per duplicated digest (n_docs >= 2).
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def exact_duplicates_sql(table: str = "documents", text_col: str = "text") -> str:
    return (
        f"SELECT md5({text_col}) AS digest, min(doc_id) AS keep_id, "
        f"count(*) AS n_docs FROM {table} "
        f"GROUP BY md5({text_col}) HAVING count(*) >= 2"
    )


# ------------------------------------------------------------------- minhash

#: Default MinHash geometry: P = BANDS * ROWS_PER_BAND hash "permutations".
N_PERM = 12
BANDS = 4
ROWS_PER_BAND = 3


def _token_sets(docs: DataFrame, text_col: str, shingle_k: int) -> DataFrame:
    tok = X.tokens(F.col(text_col))
    sh = tok if shingle_k <= 1 else X.shingles(tok, shingle_k)
    return docs.select("doc_id", F.array_distinct(sh).alias("sh"))


def _token_sets_sql(table: str, text_col: str, shingle_k: int) -> str:
    tok = X.tokens_sql(text_col)
    sh = tok if shingle_k <= 1 else X.shingles_sql(tok, shingle_k)
    return f"SELECT doc_id, list_distinct({sh}) AS sh FROM {table}"


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    n_perm: int = N_PERM,
    shingle_k: int = 1,
) -> DataFrame:
    """Per-doc MinHash signature: array of ``n_perm`` minimum md5 digests.

    "Permutation" p is the keyed hash ``md5('p<p>:' || shingle)``; the
    signature element is the lexicographic min over the doc's shingle set —
    the classic min-wise independent family, portable across engines.
    """
    sets = _token_sets(docs, text_col, shingle_k)

    def perm_hash(p: int):
        return lambda s: F.md5(F.concat(F.lit(f"p{p}:"), s))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("sh"), perm_hash(p)))
            for p in range(n_perm)
        ]
    )
    return sets.select("doc_id", "sh", sig.alias("sig"))


def _signature_sql(
    table: str, text_col: str, n_perm: int, shingle_k: int
) -> str:
    sets = _token_sets_sql(table, text_col, shingle_k)
    elems = ", ".join(
        f"list_aggregate(list_transform(sh, s -> md5('p{p}:' || s)), 'min')"
        for p in range(n_perm)
    )
    return f"SELECT doc_id, sh, [{elems}] AS sig FROM ({sets})"


def minhash_neardup(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.7,
    n_perm: int = N_PERM,
    bands: int = BANDS,
    shingle_k: int = 1,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs verified by exact Jaccard >= threshold.

    Pipeline: signature (narrow) → explode to ``bands`` rows/doc → self-join on
    the band bucket (the only shuffle, sized by true collisions) → distinct
    candidate pairs → exact Jaccard verify on the token sets.

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    r = n_perm // bands
    sig = minhash_signature(docs, text_col, n_perm, shingle_k)
    band_arr = F.array(
        *[
            F.md5(F.concat_ws("", F.slice(F.col("sig"), b * r + 1, r)))
            for b in range(bands)
        ]
    )
    # Candidate pairs carry ONLY (id_a, id_b) through the join + dedup — the
    # shingle sets rejoin afterwards, so the candidate shuffle moves two longs
    # per row instead of two token arrays.
    banded = sig.select("doc_id", F.posexplode(band_arr).alias("band", "bh"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_jaccard(cand, sig.select("doc_id", "sh"), threshold)


def _verify_jaccard(cand: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verify of (id_a, id_b) candidates against token sets."""
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return verified.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_neardup_sql(
    table: str = "documents",
    text_col: str = "text",
    threshold: float = 0.7,
    n_perm: int = N_PERM,
    bands: int = BANDS,
    shingle_k: int = 1,
) -> str:
    r = n_perm // bands
    sig = _signature_sql(table, text_col, n_perm, shingle_k)
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(array_to_string(sig[{b * r + 1} : {b * r + r}], '')) AS bh FROM sig"
        for b in range(bands)
    )
    return f"""
WITH sig AS ({sig}),
banded AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       len(list_intersect(sa.sh, sb.sh))
         / len(list_distinct(sa.sh || sb.sh)) AS jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
WHERE len(list_intersect(sa.sh, sb.sh))
        / len(list_distinct(sa.sh || sb.sh)) >= {threshold}
"""


# ------------------------------------------------------------------- simhash


def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash per doc: bit j set iff the sum of (2*bit_j(h(tok)) - 1)
    over distinct tokens is > 0, h = portable 32-bit md5 prefix.

    Computed as array lambdas over the token set — narrow, no explode/shuffle.
    """
    toks = F.array_distinct(X.tokens(F.col(text_col)))
    # Materialize the per-token hash array ONCE in its own projection — the 32
    # bit-vote aggregates below each reference it, and without the explicit
    # stage boundary Catalyst may expand (and md5 may run) 32x per token.
    hashed = docs.select(
        "doc_id", F.transform(toks, lambda t: X.hash32(t)).alias("hs")
    )

    def bit_vote(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    votes = [F.aggregate(F.col("hs"), F.lit(0), bit_vote(j)) for j in range(32)]
    sim = None
    for j, v in enumerate(votes):
        term = F.when(v > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        sim = term if sim is None else sim + term
    return hashed.select("doc_id", sim.alias("simhash"))


def simhash32_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = f"list_distinct({X.tokens_sql(text_col)})"
    hashes = f"list_transform({toks}, t -> {X.hash32_sql('t')})"
    terms = []
    for j in range(32):
        vote = (
            f"list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << j} ELSE 0 END)::BIGINT")
    total = " + ".join(terms)
    return (
        f"SELECT doc_id, {total} AS simhash FROM "
        f"(SELECT doc_id, {hashes} AS hs FROM {table})"
    )


def simhash_neardup(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: band on the 4 signature bytes (a pair within
    Hamming distance 3 of 32 bits must agree on at least one byte — pigeonhole
    gives recall 1.0 for max_hamming <= 3), verify ``bit_count(a ^ b)``.

    Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    sig = simhash32(docs, text_col)
    bytes_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(0xFF))
            for b in range(4)
        ]
    )
    banded = sig.select("doc_id", "simhash", F.posexplode(bytes_arr).alias("band", "bv"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_neardup_sql(
    table: str = "documents", text_col: str = "text", max_hamming: int = 3
) -> str:
    sig = simhash32_sql(table, text_col)
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {8 * b}) & 255 AS bv "
        f"FROM sig"
        for b in range(4)
    )
    return f"""
WITH sig AS ({sig}),
banded AS ({band_rows}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {max_hamming}
"""


# ------------------------------------------------------------ n-gram jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 2,
    threshold: float = 0.35,
    max_df: int | None = 50,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share at least one
    *indexable* shingle (inverted-index join on the shingle — the scalable
    alternative to a cross join; shuffle is keyed by shingle, skew-handled by
    AQE).

    ``max_df``: shingles occurring in more than this many documents are
    dropped from the INDEX (not from the verify sets) — standard stop-shingle
    pruning. A shingle shared by d documents generates O(d²) candidates, so
    without the cap a common shingle turns the index join into a cross join.
    Recall is lost only for pairs whose every shared shingle is ultra-common.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    sets = _token_sets(docs, text_col, shingle_k)
    inv = sets.select("doc_id", "sh", F.explode("sh").alias("g"))
    inv = inv.select("doc_id", "g")  # index rows: two scalars, no arrays
    if max_df is not None:
        rare = (
            inv.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("g")
        )
        inv = inv.join(rare, "g")
    a, b = inv.alias("a"), inv.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_jaccard(cand, sets, threshold)


def ngram_jaccard_pairs_sql(
    table: str = "documents",
    text_col: str = "text",
    shingle_k: int = 2,
    threshold: float = 0.35,
    max_df: int | None = 50,
) -> str:
    sets = _token_sets_sql(table, text_col, shingle_k)
    df_filter = (
        f"WHERE g IN (SELECT g FROM inv0 GROUP BY g HAVING count(*) <= {max_df})"
        if max_df is not None
        else ""
    )
    return f"""
WITH sets AS ({sets}),
inv0 AS (SELECT doc_id, sh, unnest(sh) AS g FROM sets),
inv AS (SELECT * FROM inv0 {df_filter}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       len(list_intersect(sa.sh, sb.sh))
         / len(list_distinct(sa.sh || sb.sh)) AS jaccard
FROM cand c
JOIN sets sa ON sa.doc_id = c.id_a
JOIN sets sb ON sb.doc_id = c.id_b
WHERE len(list_intersect(sa.sh, sb.sh))
        / len(list_distinct(sa.sh || sb.sh)) >= {threshold}
"""
