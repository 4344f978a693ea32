"""Single-process pandas replay oracle — the independent ground truth.

Semantics (pinned; FIXTURES.md §2 and SURVEY.md §2.3):

- events are applied in ``seq`` order;
- an event wins a key iff its ``(ts, seq)`` is strictly greater than the
  currently-applied event's ``(ts, seq)`` — last-writer-wins by ts, seq
  tie-break (the deterministic replacement for the reference's dict-order-
  dependent merge, /root/reference/investigraph/logic/aggregate.py:68-75);
- ``delete`` installs a tombstone carrying its (ts, seq); a later stale update
  (older ts) must NOT resurrect the turn; a strictly newer event does;
- duplicate delivery of the same event is a no-op (strict inequality);
- events with any null key field are ignored (quarantine semantics,
  /root/reference/investigraph/model/context.py:130-132);
- extra payload columns (schema evolution) are carried; rows written before a
  column existed hold null in it.

The oracle is deliberately the dumbest possible implementation — a dict keyed
by (conv_id, turn_idx) — so it cannot share a bug with the Spark engine.
"""

from __future__ import annotations

import pandas as pd

_META = {"op", "conv_id", "turn_idx", "ts", "seq", "epoch"}


def replay_oracle(events: pd.DataFrame) -> pd.DataFrame:
    """Replay the event tail; return the final live table sorted by key.

    Output columns: conv_id, turn_idx, <payload cols in event order>, ts
    (the winning writer's ts). Tombstoned keys are absent.
    """
    payload_cols = [c for c in events.columns if c not in _META]
    ordered = events.sort_values("seq", kind="stable")

    state: dict[tuple, dict] = {}
    for row in ordered.itertuples(index=False):
        d = row._asdict()
        if (
            pd.isna(d.get("conv_id"))
            or pd.isna(d.get("turn_idx"))
            or pd.isna(d.get("ts"))
            or pd.isna(d.get("seq"))
        ):
            continue
        key = (d["conv_id"], int(d["turn_idx"]))
        stamp = (d["ts"], int(d["seq"]))
        cur = state.get(key)
        if cur is not None and stamp <= cur["_stamp"]:
            continue  # stale or duplicate: strictly-greater wins
        rec = {c: d.get(c) for c in payload_cols}
        rec["_stamp"] = stamp
        rec["_deleted"] = d["op"] == "delete"
        state[key] = rec

    rows = []
    for (conv_id, turn_idx), rec in state.items():
        if rec["_deleted"]:
            continue
        out = {"conv_id": conv_id, "turn_idx": turn_idx}
        out.update({c: rec[c] for c in payload_cols})
        out["ts"] = rec["_stamp"][0]
        rows.append(out)

    result = pd.DataFrame(rows, columns=["conv_id", "turn_idx", *payload_cols, "ts"])
    return result.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
