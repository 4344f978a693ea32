"""Deterministic in-repo byte-pair-encoding tokenizer.

For training-data preparation the TOKEN budget is the contract — chunk sizes
and packing bins counted in whitespace tokens misestimate real context
windows. This module provides a small, dependency-free BPE with:

- :func:`train_bpe` — classic BPE training (word-frequency table, iterative
  most-frequent-pair merges) with a total deterministic order: ties break on
  the lexicographically smallest pair, so the same corpus yields the same
  merges table on every run and machine.
- :class:`BpeTokenizer` — the trained merges + ranks, with a pure-Python
  reference :meth:`encode` (the parity oracle for the distributed face).
- :func:`pieces_udf` / :func:`token_count_udf` — Arrow-batched pandas UDFs
  applying the tokenizer corpus-wide (the input_hint's sanctioned Python
  surface: vectorized pandas/Arrow, never per-row Python in Catalyst).

The whitespace tokenizer (functions/text.py ``tokens``) remains the DuckDB
oracle twin for the driver's value-hash gate; BPE faces are pytest-verified
against :meth:`BpeTokenizer.encode` (SQL cannot express the merge loop).

Scale shape: training is driver-side on a BOUNDED sample (the merges table is
the model — a few hundred rows); application is embarrassingly parallel, one
Arrow batch at a time, with a per-batch word cache (Zipf makes the cache hit
rate high). The merges table ships to executors inside the UDF closure
(~KBs), the same way a broadcast variable would.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Iterable

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve module-globally)
from pyspark.sql.functions import pandas_udf

#: End-of-word marker appended to every word before merging — makes word
#: boundaries explicit in the pieces, so detokenization is exact under
#: whitespace normalization.
EOW = "▁"  # ▁ (same glyph family SentencePiece uses, reversed role)

#: U+2581 genuinely occurs in real corpora (any SentencePiece-preprocessed
#: text), so input words are ESCAPED before the marker is appended — a
#: literal ▁ becomes ``\x00E`` and a literal ``\x00`` becomes ``\x00Z`` —
#: which leaves the EOW glyph meaning exactly one thing in encoded pieces:
#: a word boundary. decode()/detokenization replace boundaries with spaces
#: FIRST, then unescape, restoring the original text exactly.
ESC = "\x00"


def _escape_word(w: str) -> str:
    return w.replace(ESC, ESC + "Z").replace(EOW, ESC + "E")


def _unescape(s: str) -> str:
    # ▁-escape first: in well-formed escaped text every ESC heads a pair,
    # so this cannot manufacture a false ESC+"Z"
    return s.replace(ESC + "E", EOW).replace(ESC + "Z", ESC)


def unescape_expr(col):
    """Spark-side :func:`_unescape` (chunk detokenization in operators/
    corpus.py) — apply AFTER replacing boundary EOWs with spaces."""
    from pyspark.sql import functions as F

    return F.replace(
        F.replace(col, F.lit(ESC + "E"), F.lit(EOW)),
        F.lit(ESC + "Z"),
        F.lit(ESC),
    )


def train_bpe(texts: Iterable[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from an iterable of texts.

    Deterministic: pair selection orders by (count DESC, pair ASC). Words are
    whitespace-split; characters + EOW are the base alphabet.
    """
    words: Counter = Counter()
    for t in texts:
        for w in (t or "").split():
            words[tuple(_escape_word(w)) + (EOW,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out: Counter = Counter()
        for sym, c in words.items():
            new = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            out[tuple(new)] += c
        words = out
    return merges


def train_bpe_df(
    df, text_col: str = "text", n_merges: int = 200
) -> list[tuple[str, str]]:
    """DataFrame-native BPE training — the 100 TB face of :func:`train_bpe`
    (round-4 verdict #7: a driver-side 2,000-doc sample is the right
    model-is-KBs default, but a production tokenizer trains on the corpus).

    Same structure as ``operators.similarity.train_centroids``: an iterative
    loop whose per-iteration work is fully distributed and whose collect is
    bounded — here to ONE row (the winning pair). The corpus collapses ONCE
    into the distinct-word count table (classic BPE trick: merge statistics
    depend only on word *types* weighted by frequency, so 100 TB of text
    becomes a vocabulary-sized table); each of the ``n_merges`` iterations
    is then one job over that cached table:

    1. re-segment every word with the merges learned SO FAR — Arrow-batched
       ``encode_word`` with the merges broadcast in the UDF closure (KBs).
       Stateless per iteration: no lineage growth, no checkpointing. This
       leans on BPE's defining property (greedy lowest-rank encoding
       reproduces the training segmentation — parity-tested against
       train_bpe's explicit sequential application in test_corpus.py);
    2. ``explode`` adjacent symbol pairs → ``groupBy(a, b).sum(cnt)`` —
       the distributed pair count (partial aggregation map-side);
    3. take the (count DESC, a ASC, b ASC) winner — ``limit(1)`` collect.
       String order parity: Spark compares UTF-8 bytes, Python compares
       code points — identical orders (UTF-8 preserves code-point order).

    Iteration cost: ``n_merges`` jobs of O(|vocab| × avg word length) work
    each; at 10^10 documents the vocab table is millions of rows, so each
    job is seconds on a cluster. For n_merges in the tens of thousands,
    batch the loop (select top-M non-interacting pairs per job) — not
    implemented; documented as the known scale dial.
    """
    from pyspark.sql import functions as F

    # Word extraction MUST match train_bpe's Python str.split() exactly —
    # Java regex \s is ASCII-only while str.split() splits on Unicode
    # whitespace (NBSP etc., common in the SentencePiece-preprocessed text
    # the EOW escape targets) — so the split is the same Python call,
    # Arrow-batched.
    @pandas_udf("array<string>")
    def _words(s: pd.Series) -> pd.Series:
        return s.map(lambda t: (t or "").split())

    words = (
        df.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    try:
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            pairs = pair_counts_udf(BpeTokenizer(tuple(merges)))
            top = (
                words.select(F.explode(pairs(F.col("w"))).alias("p"), "cnt")
                .groupBy(F.col("p")[0].alias("a"), F.col("p")[1].alias("b"))
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            merges.append((top[0]["a"], top[0]["b"]))
    finally:
        words.unpersist()
    return merges


def pair_counts_udf(tok: "BpeTokenizer"):
    """Arrow-batched ``word -> array<array<string>>`` of adjacent symbol
    pairs under ``tok``'s current merges (train_bpe_df's step-1 kernel)."""
    merges = tok.merges

    @pandas_udf("array<array<string>>")
    def f(s: pd.Series) -> pd.Series:
        t = BpeTokenizer(merges)
        cache: dict = {}

        def pairs(word):
            sym = t.encode_word(word, cache)
            return [[sym[i], sym[i + 1]] for i in range(len(sym) - 1)]

        return s.map(pairs)

    return f


@dataclass(frozen=True)
class BpeTokenizer:
    """A trained merges table; hashable/serializable closure payload."""

    merges: tuple[tuple[str, str], ...]
    ranks: dict = field(default_factory=dict, compare=False, hash=False)

    def __post_init__(self) -> None:
        object.__setattr__(
            self, "ranks", {pair: r for r, pair in enumerate(self.merges)}
        )

    @classmethod
    def train(cls, texts: Iterable[str], n_merges: int = 200) -> "BpeTokenizer":
        return cls(merges=tuple(train_bpe(texts, n_merges)))

    @classmethod
    def train_from_df(
        cls, df, text_col: str = "text", n_merges: int = 200, max_docs: int = 2000
    ) -> "BpeTokenizer":
        """Train on a bounded deterministic sample of a DataFrame column
        (driver-side collect of ≤ ``max_docs`` short strings — the one
        justified collect; the model itself is KBs)."""
        rows = df.select(text_col).limit(max_docs).collect()
        return cls.train((r[0] or "" for r in rows), n_merges)

    # ------------------------------------------------------ reference encoder
    def encode_word(self, word: str, _cache: dict | None = None) -> list[str]:
        if _cache is not None and word in _cache:
            return _cache[word]
        sym = list(_escape_word(word)) + [EOW]
        ranks = self.ranks
        while len(sym) > 1:
            best_rank, best_i = None, None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            sym[best_i: best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        if _cache is not None:
            _cache[word] = sym
        return sym

    def encode(self, text: str) -> list[str]:
        """Pure-Python reference encoding (the UDF parity oracle)."""
        cache: dict = {}
        out: list[str] = []
        for w in (text or "").split():
            out.extend(self.encode_word(w, cache))
        return out

    def decode(self, pieces: list[str]) -> str:
        """Exact inverse under whitespace normalization (including input
        that itself contains the ▁ glyph — see ESC)."""
        return _unescape("".join(pieces).replace(EOW, " ")).strip()


def pieces_udf(tok: BpeTokenizer):
    """Arrow-batched ``text -> array<string>`` of BPE pieces."""
    merges = tok.merges

    @pandas_udf("array<string>")
    def f(s: pd.Series) -> pd.Series:
        t = BpeTokenizer(merges)
        cache: dict = {}
        def enc(text):
            out = []
            for w in (text or "").split():
                out.extend(t.encode_word(w, cache))
            return out
        return s.map(enc)

    return f


def token_count_udf(tok: BpeTokenizer):
    """Arrow-batched ``text -> long`` BPE token count."""
    merges = tok.merges

    @pandas_udf("long")
    def f(s: pd.Series) -> pd.Series:
        t = BpeTokenizer(merges)
        cache: dict = {}
        def cnt(text):
            n = 0
            for w in (text or "").split():
                n += len(t.encode_word(w, cache))
            return n
        return s.map(cnt)

    return f
