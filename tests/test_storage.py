"""Control-plane storage abstraction: the lake's commit log / manifest /
vacuum / sidecar I/O must work against a non-POSIX store (round-2 verdict:
the object-store-safe layout previously could not actually run on object
stores because listing/reading/writing was hardwired to os.*).

The ``memory://`` impl is the fake remote: a flat object map with ONLY
put / get / list / delete / exists — no rename, no mkdir, no walk. Driving
the CommitLog and the table-maintenance paths over it proves no POSIX
leakage remains in the control plane.
"""

import json

import pytest

from investigraph_etl_spark.lake.log import Commit, CommitLog
from investigraph_etl_spark.storage import (
    LocalStorage,
    MemoryStorage,
    join,
    register_scheme,
    storage_for,
)

ALLOWED_OPS = {"put", "get", "list", "delete", "exists"}


@pytest.fixture()
def mem(monkeypatch):
    """A fresh fake remote registered for memory:// (isolated per test)."""
    fs = MemoryStorage()
    register_scheme("memory", fs)
    return fs


def test_scheme_dispatch(tmp_path, mem):
    assert isinstance(storage_for(str(tmp_path)), LocalStorage)
    assert isinstance(storage_for(f"file://{tmp_path}"), LocalStorage)
    assert storage_for("memory://tbl") is mem
    with pytest.raises(ValueError, match="no storage registered"):
        storage_for("s3://bucket/key")


def test_local_exclusive_put_conflicts(tmp_path):
    fs = LocalStorage()
    p = join(str(tmp_path), "a", "b.json")
    fs.put_text(p, "one", exclusive=True)
    with pytest.raises(FileExistsError):
        fs.put_text(p, "two", exclusive=True)
    assert fs.get_text(p) == "one"
    fs.put_text(p, "three")  # overwrite put is allowed
    assert fs.get_text(p) == "three"


def test_local_list_and_prune(tmp_path):
    fs = LocalStorage()
    root = str(tmp_path / "data")
    fs.put_text(join(root, "commit=aa", "bucket=0", "p1.parquet"), "x")
    fs.put_text(join(root, "commit=aa", "bucket=1", "p2.parquet"), "x")
    assert fs.list_files(root) == [
        "commit=aa/bucket=0/p1.parquet",
        "commit=aa/bucket=1/p2.parquet",
    ]
    assert fs.list_files(join(root, "missing")) == []
    fs.delete(join(root, "commit=aa", "bucket=0", "p1.parquet"))
    fs.prune(root)
    assert fs.list_files(root) == ["commit=aa/bucket=1/p2.parquet"]


def test_memory_semantics(mem):
    mem.put_text("memory://t/x/y.json", "v")
    assert mem.exists("memory://t/x/y.json")
    assert mem.exists("memory://t/x")  # prefix-exists, like an S3 LIST probe
    assert mem.list_names("memory://t/x") == ["y.json"]
    assert mem.list_files("memory://t") == ["x/y.json"]
    with pytest.raises(FileExistsError):
        mem.put_text("memory://t/x/y.json", "w", exclusive=True)
    with pytest.raises(FileNotFoundError):
        mem.get_text("memory://t/nope")
    mem.delete("memory://t/x/y.json")
    assert mem.list_files("memory://t") == []


def test_commit_log_runs_on_fake_remote(mem):
    """Full commit-log lifecycle (commit chain, conflict, checkpoint, replay,
    time travel, epoch idempotency tokens) against the object-store-shaped
    interface — and the store saw ONLY the allowed verbs."""
    log = CommitLog("memory://wh/tbl")
    assert not log.exists()
    log.commit(Commit(version=1, schema={"s": 1}, n_buckets=8,
                      key_cols=["k"], mode="mor"))
    for v in range(2, 25):  # crosses the CHECKPOINT_EVERY=20 boundary
        log.commit(Commit(version=v, added=[f"commit=t{v}/bucket=0/f{v}.parquet"],
                          app_id="app", epoch_id=v))
    with pytest.raises(FileExistsError):  # concurrent-writer conflict
        log.commit(Commit(version=24))

    st = log.read_state()
    assert st.version == 24 and st.mode == "mor" and st.n_buckets == 8
    assert len(st.live_files) == 23
    assert ("app", 24) in st.committed_epochs
    old = log.read_state(at_version=3)
    assert old.version == 3 and len(old.live_files) == 2

    # a checkpoint object exists and state replays from it identically
    names = mem.list_names("memory://wh/tbl/_log")
    assert "00000000000000000020.checkpoint.json" in names
    assert set(op for op, _ in mem.ops) <= ALLOWED_OPS

    # a second reader (fresh CommitLog) sees the same state — no local state
    assert CommitLog("memory://wh/tbl").read_state().version == 24


def test_table_maintenance_on_fake_remote(mem):
    """Manifest listing + vacuum + index.json via the interface only: fake a
    written commit directory as bare objects, then vacuum an orphan."""
    from investigraph_etl_spark.lake.table import LakeTable

    root = "memory://wh/t2"
    log = CommitLog(root)
    live = "commit=tok1/bucket=0/part-0.parquet"
    orphan_file = "commit=tok1/bucket=0/part-crash.parquet.tmp"
    orphan_commit = "commit=tok9/bucket=3/part-9.parquet"
    for rel in (live, orphan_file, orphan_commit):
        mem.put_bytes(f"{root}/data/{rel}", b"pq")
    log.commit(Commit(version=1, schema={"type": "struct", "fields": []},
                      n_buckets=4, key_cols=["k"], mode="mor"))
    log.commit(Commit(version=2, added=[live],
                      metrics={"events_applied": 7}))

    table = LakeTable.__new__(LakeTable)  # no SparkSession needed for these
    table.spark = None
    table.root = root
    table.fs = storage_for(root)
    table.data_dir = join(root, "data")
    table.log = log

    assert table.vacuum(orphan_grace_s=0.0) == 1  # the orphan commit dir's parquet, not .tmp
    assert mem.list_files(f"{root}/data") == [live.replace("commit=", "commit=", 1)]

    meta = table.export_metadata()
    assert meta["stats"] == {"events_applied": 7}
    assert json.loads(mem.get_text(f"{root}/index.json"))["version"] == 2
    assert set(op for op, _ in mem.ops) <= ALLOWED_OPS


def test_metrics_sidecar_parquet_roundtrip(mem):
    import io

    import pandas as pd

    pdf = pd.DataFrame({"epoch_id": [0], "bucket": [1], "events_applied": [5]})
    mem.put_parquet("memory://wh/t3/_metrics/epoch-0.parquet", pdf)
    back = pd.read_parquet(io.BytesIO(mem.get_bytes("memory://wh/t3/_metrics/epoch-0.parquet")))
    pd.testing.assert_frame_equal(back, pdf)
