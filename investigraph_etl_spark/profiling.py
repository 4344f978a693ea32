"""Per-phase wall-time collector for the ingest hot path.

The north-rule scaling criterion punishes per-epoch SERIAL driver work: a
term that costs the same at local[1] and local[4] caps 1→4 efficiency at
``parallel / (parallel/4 + serial)``. This module makes those terms visible
— the engine brackets its phase boundaries with :func:`phase`, and a caller
that wants a breakdown wraps the run in :func:`collecting`. When nothing is
collecting, ``phase`` is a no-op (two attribute reads), so the hooks stay in
production code.

Phases instrumented in the engine (one epoch = one ``merge``):

- ``table_load``    — LakeTable.load per trigger (manifest read)
- ``state``         — commit-log state reconstruction
- ``write_job``     — the Spark write action (the parallel part)
- ``manifest_list`` — post-write LIST building the manifest
- ``stats``         — parquet footer reads for zone maps
- ``pre_commit``    — lineage Observation get + metrics/quarantine sidecars
- ``commit``        — commit-log publish (JSON put)
- ``compact_check`` — MOR post-merge compaction probe
- ``epoch``         — the whole foreachBatch body (umbrella, not disjoint)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_ACTIVE: "PhaseTimer | None" = None


class PhaseTimer:
    """Accumulates total seconds and call counts per phase name."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            name: {"total_s": round(self.totals[name], 3), "n": self.counts[name]}
            for name in sorted(self.totals)
        }


@contextlib.contextmanager
def phase(name: str):
    """Bracket one engine phase; no-op unless a collector is active."""
    t = _ACTIVE
    if t is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        t.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def collecting():
    """Activate a collector for the duration; yields the PhaseTimer."""
    global _ACTIVE
    timer = PhaseTimer()
    prev, _ACTIVE = _ACTIVE, timer
    try:
        yield timer
    finally:
        _ACTIVE = prev
