"""Text-analysis kernels: tokenize, shingle, fingerprint, language-ID, quality.

All Spark-side logic is built-in ``pyspark.sql.functions`` expressions (array
lambdas, regex, md5) — JVM-side, vectorized, zero Python in the hot path. Each
kernel has a ``*_sql`` twin emitting the equivalent DuckDB expression for the
driver's oracle; both faces are derived from the same constants so they cannot
drift.

Portability contract (why these exact primitives):
- ``md5`` produces identical lowercase hex in Spark and DuckDB → the one
  portable hash. 32-bit int form: first 8 hex chars → int (``conv`` / ``::BIGINT``).
- string ``min``/``max``/``sort`` over ASCII is binary collation in both.
- int/int division yields DOUBLE in both (Spark ``/``, DuckDB ``/``).

Reference parity: fingerprint/slug keying at
/root/reference/investigraph/util.py:25-42 (row-wise Python there; pure
Catalyst here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Word-token pattern (whitespace tokenizer) — shared by both faces.
TOKEN_RE = r"[^\s]+"

#: BPE-ish pre-token pattern: letter runs | digit runs | single symbol.
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: Punctuation-ish characters (for quality scoring).
PUNCT_RE = r"[^a-zA-Z0-9\s]"

#: Per-language stopword inventories for the stopword-ratio language-ID
#: heuristic. Order matters: ties broken by first-listed language. Words are
#: chosen to be distinctive where possible; residual overlap (e.g. "por" in
#: es and pt) is resolved by the tie order. Shared by BOTH faces (Spark +
#: DuckDB SQL) so the oracle cannot drift from the engine.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "los", "las", "por", "con", "del", "se", "su", "es", "como"),
    "it": ("il", "di", "che", "non", "per", "gli", "della", "sono", "anche", "più"),
    "pt": ("não", "uma", "os", "dos", "das", "em", "para", "com", "mais", "ao"),
    "nl": ("het", "een", "van", "niet", "zijn", "aan", "voor", "ook", "maar", "dit"),
    "sv": ("och", "att", "det", "som", "på", "är", "av", "har", "inte", "med"),
    "pl": ("nie", "się", "jest", "na", "do", "że", "jak", "ale", "po", "co"),
    "tr": ("bir", "ve", "bu", "için", "ile", "olarak", "daha", "çok", "gibi", "ama"),
}

_Q = "'"


def _sql_str_array(vals: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"{_Q}{v}{_Q}" for v in vals) + "]"


# --------------------------------------------------------------------- tokens
def tokens(col: Column) -> Column:
    """Lower-cased whitespace tokens as array<string>."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def tokens_sql(col: str) -> str:
    return f"regexp_extract_all(lower({col}), '{TOKEN_RE}')"


def n_tokens(col: Column) -> Column:
    return F.size(tokens(col))


def n_tokens_sql(col: str) -> str:
    return f"len({tokens_sql(col)})"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / single symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), 0))


def bpe_token_count_sql(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{BPE_RE}'))"


# ------------------------------------------------------------------- shingles
def shingles(tok: Column, k: int) -> Column:
    """All k-token shingles (space-joined); whole text if fewer than k tokens.

    Shape: a zip_with chain over k-1 shifted copies of the token array — one
    elementwise pass per shift. (The naive ``transform(sequence, i ->
    concat_ws(slice(tok, i, k)))`` allocates a slice per position inside an
    interpreted higher-order eval and measured ~2× slower; both forms are
    narrow/no-shuffle, this one does strictly less work per element.)
    """
    n = F.size(tok)
    out = tok
    for j in range(1, k):
        shifted = F.slice(tok, j + 1, F.greatest(n - j, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    win = F.slice(out, 1, F.greatest(n - k + 1, F.lit(0)))
    return F.when(n >= k, win).otherwise(F.array(F.concat_ws(" ", tok)))


def shingles_sql(tok: str, k: int) -> str:
    return (
        f"CASE WHEN len({tok}) >= {k} THEN "
        f"list_transform(generate_series(1, len({tok}) - {k} + 1), "
        f"i -> array_to_string(({tok})[i : i + {k} - 1], ' ')) "
        f"ELSE [array_to_string({tok}, ' ')] END"
    )


# --------------------------------------------------------------- fingerprints
def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over sorted distinct tokens.

    Reference analog: ``make_fingerprint_id``
    (/root/reference/investigraph/util.py:25-42) — normalized-token identity so
    token order / duplication doesn't change the key.
    """
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def fingerprint64(col: Column) -> Column:
    """Production fingerprint: xxhash64 directly over the sorted distinct
    token array (hashes the array structurally — no join/concat needed).
    Same token-order/duplication insensitivity as :func:`fingerprint`; use
    the md5 face only where DuckDB must replay the value."""
    return F.xxhash64(F.array_sort(F.array_distinct(tokens(col))))


def fingerprint_sql(col: str) -> str:
    return (
        f"md5(array_to_string(list_sort(list_distinct({tokens_sql(col)})), ' '))"
    )


def hash32(col: Column) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5 as a BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_sql(col: str) -> str:
    return f"('0x' || substr(md5({col}), 1, 8))::BIGINT"


# ------------------------------------------------------------- hash kernels
#: Supported hash kernels for the dedup/fingerprint hot paths.
#:
#: - ``xxhash64`` — PRODUCTION DEFAULT. JVM-native, partition-parallel,
#:   lock-free. (Measured on this class of host: JVM digest functions — md5 /
#:   sha2 — serialize on the JCA provider lock and ANTI-scale with threads in
#:   one JVM: a sha2 job went 22 s @ 8 threads → 104 s @ 32. xxhash64 has no
#:   such lock and is ~10× cheaper per call.)
#: - ``md5`` — ORACLE-PARITY MODE. The one hash that produces identical
#:   results in Spark and DuckDB, so the driver's value-hash gate can replay
#:   every operator in SQL. Results are deterministic in both modes; only the
#:   (arbitrary) hash family differs, so LSH candidate sets — and therefore
#:   verified near-dup outputs — may differ slightly between modes.
KERNELS = ("xxhash64", "md5")


def digest(col: Column, kernel: str = "xxhash64") -> Column:
    """Content digest for exact dedup: 64-bit long (xxhash64) or hex (md5)."""
    if kernel == "xxhash64":
        return F.xxhash64(col)
    return F.md5(col)


def hash32_pair(col: Column, kernel: str = "xxhash64") -> tuple[Column, Column]:
    """Two independent 32-bit hashes (hi, lo) as longs in [0, 2^32).

    xxhash64: the two halves of one xxhash64 call. md5: hex chars 1-8 / 9-16
    of one md5 call (Catalyst CSE folds the duplicate digest call).
    """
    if kernel == "xxhash64":
        h = F.xxhash64(col)
        return (
            F.shiftrightunsigned(h, 32),
            h.bitwiseAND(F.lit(0xFFFFFFFF)),
        )
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long"),
    )


def hash32_pair_sql(col: str) -> tuple[str, str]:
    """DuckDB twin of :func:`hash32_pair` — md5 kernel only (the oracle face)."""
    return (
        f"('0x' || substr(md5({col}), 1, 8))::BIGINT",
        f"('0x' || substr(md5({col}), 9, 8))::BIGINT",
    )


# ---------------------------------------------------------------- language id
def stopword_hits(tok: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tok, lambda t: F.array_contains(sw, t)))


def stopword_hits_sql(tok: str, lang: str) -> str:
    return (
        f"len(list_filter({tok}, t -> list_contains("
        f"{_sql_str_array(STOPWORDS[lang])}, t)))"
    )


def lang_id(col: Column) -> Column:
    """Stopword-ratio language-ID: argmax over per-language stopword hits.

    Ties (incl. zero hits everywhere) → 'und'; equal non-zero hits break by
    declaration order of STOPWORDS.
    """
    tok = tokens(col)
    langs = list(STOPWORDS)
    hits = [stopword_hits(tok, lg) for lg in langs]
    best = F.greatest(*hits)
    out = F.lit("und")
    for lg, h in reversed(list(zip(langs, hits))):
        out = F.when((best > 0) & (h == best), F.lit(lg)).otherwise(out)
    return out


def lang_id_sql(col: str) -> str:
    tok = tokens_sql(col)
    langs = list(STOPWORDS)
    hit = {lg: stopword_hits_sql(tok, lg) for lg in langs}
    best = "greatest(" + ", ".join(hit[lg] for lg in langs) + ")"
    branches = " ".join(
        f"WHEN ({best}) > 0 AND ({hit[lg]}) = ({best}) THEN '{lg}'" for lg in langs
    )
    return f"CASE {branches} ELSE 'und' END"


def lang_confidence(col: Column) -> Column:
    """Confidence for :func:`lang_id`: the winning language's stopword density
    (best hits / tokens, DOUBLE in [0, 1]); 0.0 when the verdict is 'und'."""
    tok = tokens(col)
    best = F.greatest(*[stopword_hits(tok, lg) for lg in STOPWORDS])
    return best / F.greatest(F.size(tok), F.lit(1))


def lang_confidence_sql(col: str) -> str:
    tok = tokens_sql(col)
    best = "greatest(" + ", ".join(
        stopword_hits_sql(tok, lg) for lg in STOPWORDS
    ) + ")"
    return f"({best}) / greatest(len({tok}), 1)"


# ------------------------------------------------------------------- quality
def quality_features(col: Column) -> dict[str, Column]:
    """Quality-scoring features: length, tokens, punct ratio, stopword ratio,
    mean token length. All ratios are DOUBLE (int/int division in both engines).
    """
    tok = tokens(col)
    nt = F.size(tok)
    length = F.length(col)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 0))
    stop = stopword_hits(tok, "en")
    return {
        "n_chars": length,
        "n_tokens": nt,
        "punct_ratio": n_punct / F.greatest(length, F.lit(1)),
        "stopword_ratio": stop / F.greatest(nt, F.lit(1)),
        "mean_token_len": F.aggregate(
            tok, F.lit(0), lambda acc, t: acc + F.length(t)
        ) / F.greatest(nt, F.lit(1)),
    }


def quality_features_sql(col: str) -> dict[str, str]:
    tok = tokens_sql(col)
    return {
        "n_chars": f"length({col})",
        "n_tokens": f"len({tok})",
        "punct_ratio": (
            f"len(regexp_extract_all({col}, '{PUNCT_RE}'))"
            f" / greatest(length({col}), 1)"
        ),
        "stopword_ratio": (
            f"{stopword_hits_sql(tok, 'en')} / greatest(len({tok}), 1)"
        ),
        "mean_token_len": (
            f"list_sum(list_transform({tok}, t -> length(t)))"
            f" / greatest(len({tok}), 1)"
        ),
    }
