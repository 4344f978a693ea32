"""Deterministic synthetic CDC change-tail generator (numpy, seeded).

Produces the binlog/WAL-style event stream described in FIXTURES.md §2 with every
adversarial feature the engine must survive:

- **Zipf-skewed conv_ids** — a few hot conversations dominate (exercises the
  salted two-phase merge);
- **ts collisions** — same key, same ts, different seq (pins the seq tie-break);
- **late events** — ts older than an already-newer update (must lose LWW);
- **delete-then-late-update races** — a stale update after a delete must not
  resurrect the turn;
- **duplicate delivery** — the same (seq, payload) event appears twice
  (exactly-once dedup is a semantic no-op under LWW);
- **additive schema evolution** — from a configurable epoch onward, events carry
  extra columns (``tool_version``, ``tokens``).

The reference analog is its golden-fixture strategy
(/root/reference/tests/fixtures/, counts at
/root/reference/tests/test_pipeline.py:28): a deterministic input whose correct
output is independently known — here via :mod:`investigraph_etl_spark.cdc.oracle`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

_EPOCH0 = np.datetime64("2025-01-01T00:00:00", "us")

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array([None, "search", "python", "browser", "calculator"], dtype=object)
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark merge stream turn agent "
    "tool call answer question follow up context window token batch".split()
)


@dataclass(frozen=True)
class GeneratorConfig:
    n_events: int = 10_000
    n_convs: int = 300
    max_turns: int = 40
    seed: int = 42
    zipf_a: float = 1.3          # conv_id popularity skew (lower = hotter heads)
    p_delete: float = 0.05
    p_upsert: float = 0.15
    p_duplicate: float = 0.03    # fraction of events re-delivered verbatim
    p_ts_collision: float = 0.05 # fraction reusing the previous event's ts on same key
    p_late: float = 0.10         # fraction with ts pulled far into the past
    n_epochs: int = 8            # how many micro-batch files the stream is split into
    evolve_from_epoch: int | None = None  # epoch index from which extra columns appear
    text_words: int = 8          # words per turn text (~7 bytes/word; bench uses more)


def _texts(rng: np.random.Generator, n: int, n_words: int = 8) -> np.ndarray:
    """Vectorized text synth: phrases from a pre-built pool + unique salt.

    Pure numpy string kernels (no per-row Python) so 10^7-event tails are
    cheap to generate for the bench/scaling runs.
    """
    pool_size = min(65536, max(1024, n // 16))
    idx = rng.integers(0, len(_WORDS), size=(pool_size, n_words))
    # object dtype: the salt append below moves string REFERENCES, not the
    # fixed-width U-array copies np.char.add would do (11 GB/op at 1.4 KB texts)
    pool = np.array([" ".join(_WORDS[row]) + " #" for row in idx], dtype=object)
    pick = rng.integers(0, pool_size, size=n)
    salt = rng.integers(0, 1_000_000, size=n)
    picked = pool[pick]
    return np.array(
        [t + s for t, s in zip(picked, salt.astype(str))], dtype=object
    )


def generate_events(cfg: GeneratorConfig = GeneratorConfig()) -> pd.DataFrame:
    """Return the full event tail as one pandas frame, ordered by ``seq``.

    Columns: op, conv_id, turn_idx, role, text, tool, ts, seq [, tool_version,
    tokens from the evolution epoch onward], plus ``epoch`` (int) for writers
    that split the tail into per-epoch files.
    """
    rng = np.random.default_rng(cfg.seed)
    n = cfg.n_events

    conv = np.minimum(rng.zipf(cfg.zipf_a, size=n) - 1, cfg.n_convs - 1)
    conv_id = np.array([f"conv-{c:06d}" for c in conv], dtype=object)
    turn_idx = rng.integers(0, cfg.max_turns, size=n).astype(np.int32)

    r = rng.random(n)
    op = np.where(
        r < cfg.p_delete,
        "delete",
        np.where(r < cfg.p_delete + cfg.p_upsert, "upsert", "update"),
    ).astype(object)
    # First event the generator emits for a key is morally an insert; LWW treats
    # insert/update/upsert identically, so tag a slice as inserts for realism.
    op[rng.random(n) < 0.2] = "insert"

    role = _ROLES[rng.integers(0, len(_ROLES), size=n)].astype(object)
    tool = _TOOLS[rng.integers(0, len(_TOOLS), size=n)]
    text = _texts(rng, n, n_words=cfg.text_words)

    # Monotone-ish event time with jitter, then late-event corruption.
    base_us = np.cumsum(rng.integers(1, 2_000_000, size=n))
    ts = _EPOCH0 + base_us.astype("timedelta64[us]")
    late = rng.random(n) < cfg.p_late
    ts[late] -= np.timedelta64(3_600_000_000, "us") * rng.integers(1, 48, size=late.sum())

    seq = np.arange(n, dtype=np.int64)

    df = pd.DataFrame(
        {
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "seq": seq,
        }
    )

    # ts collisions: within each key (in seq order), a fraction of events
    # reuse the key's previous event's ts — same key, same ts, different seq
    # pins the seq tie-break. Computed on a key-sorted view so collisions
    # exist whenever any key has >= 2 events.
    s = df.sort_values(["conv_id", "turn_idx", "seq"], kind="stable")
    same_key = (s["conv_id"].shift() == s["conv_id"]) & (
        s["turn_idx"].shift() == s["turn_idx"]
    )
    coll = same_key.to_numpy() & (rng.random(n) < cfg.p_ts_collision)
    s.loc[coll, "ts"] = s["ts"].shift()[coll]
    df = s.sort_index()

    # Deletes carry no payload.
    is_del = df["op"] == "delete"
    df.loc[is_del, ["role", "text", "tool"]] = None

    # Out-of-order delivery: shuffle so an epoch contains a mix of seqs.
    df = df.sample(frac=1.0, random_state=cfg.seed + 1).reset_index(drop=True)
    # Epoch assignment: contiguous slices in delivery order (binlog segments).
    df["epoch"] = (np.arange(len(df)) * cfg.n_epochs // len(df)).astype(np.int64)

    # Additive schema evolution: events produced from the evolution epoch onward
    # carry new columns (value derived from seq so re-delivery stays verbatim).
    if cfg.evolve_from_epoch is not None:
        evolved = (df["epoch"] >= cfg.evolve_from_epoch) & (df["op"] != "delete")
        df["tool_version"] = pd.array([None] * len(df), dtype=object)
        df.loc[evolved, "tool_version"] = "v" + (df.loc[evolved, "seq"] % 3).astype(str)
        df["tokens"] = pd.array([None] * len(df), dtype="Int32")
        df.loc[evolved, "tokens"] = (df.loc[evolved, "seq"] % 512).astype("Int32")

    # Duplicate delivery: VERBATIM copies (same seq, same payload — a binlog
    # position uniquely determines its event) re-delivered in a later-or-equal
    # epoch, as a real at-least-once source would.
    n_dup = int(n * cfg.p_duplicate)
    if n_dup:
        dup = df.sample(n=n_dup, random_state=cfg.seed).copy()
        rng2 = np.random.default_rng(cfg.seed + 2)
        dup["epoch"] = np.minimum(
            dup["epoch"].to_numpy() + rng2.integers(0, 3, size=len(dup)),
            cfg.n_epochs - 1,
        )
        df = pd.concat([df, dup], ignore_index=True)
        df = (
            df.sort_values("epoch", kind="stable")
            .reset_index(drop=True)
        )

    return df


def write_epoch_files(
    df: pd.DataFrame,
    out_dir: str,
    fmt: str = "parquet",
    files_per_epoch: int = 1,
) -> list[str]:
    """Write each epoch as ``files_per_epoch`` chunk files (the stream's
    discovery unit). Returns paths.

    Files are named so lexicographic order == (epoch, chunk) order, mirroring
    how a binlog tail lands in a landing directory. ``files_per_epoch > 1``
    matters for ingest parallelism: a parquet file is one scan task (single
    row group), so a 1-file epoch serializes the scan+decode of the whole
    micro-batch on one core no matter how many executors exist. A real CDC
    landing zone ships many segment files per trigger; pair this with
    ``IngestPipeline(max_files_per_trigger=files_per_epoch)`` to keep one
    epoch == one micro-batch.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for epoch, part in df.groupby("epoch", sort=True):
        body = part.drop(columns=["epoch"])
        chunks = (
            [body]
            if files_per_epoch <= 1
            else np.array_split(body, files_per_epoch)
        )
        for ci, chunk in enumerate(chunks):
            p = os.path.join(out_dir, f"events-{int(epoch):05d}-{ci:03d}.{fmt}")
            if fmt == "parquet":
                chunk.to_parquet(p, index=False)
            elif fmt == "json":
                chunk.to_json(
                    p, orient="records", lines=True, date_format="iso", date_unit="us"
                )
            else:
                raise ValueError(f"unsupported format: {fmt}")
            paths.append(p)
    return paths
