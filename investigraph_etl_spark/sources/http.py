"""HTTP(S) source with etag/last-modified conditional re-read.

Reference parity: the reference's flagship ingestion path caches GETs keyed on
the URL plus the server's change token — etag if present, else Last-Modified
(/root/reference/investigraph/logic/fetch.py:30-43 ``get_cache_key`` /
/root/reference/investigraph/model/source.py:36-41 ``SourceHead.ckey``) — so a
re-run against an unchanged resource never re-downloads, while a changed etag
produces a new cache key and a fresh ingest.

Spark-first shape: the fetch lands the payload as a LOCAL FILE in a
content-keyed cache directory and hands the path to ``spark.read`` — the
driver moves only the bytes once; Spark parallelizes the parse. Config-listed
source URLs are few (a seed list), so the driver-side HEAD+GET loop
(``fetch_many``) is not a scale concern; a crawl-scale URL table goes through
``fetch_partitioned`` instead: a DataFrame of URLs fanned out via
``mapInPandas`` with one HTTP session per partition, payload bytes staying IN
the DataFrame (binary column) so downstream parsing is distributed and no
shared filesystem is assumed — each executor keeps its own node-local
conditional cache.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from dataclasses import dataclass

import requests

#: Default on-disk cache root (override per call).
DEFAULT_CACHE_DIR = os.path.join(tempfile.gettempdir(), "investigraph-http-cache")


def head_key(url: str, timeout: float = 30.0) -> str | None:
    """The resource's change token via HEAD: etag, else Last-Modified, else
    None (servers without either can't support conditional re-read)."""
    res = requests.head(url, timeout=timeout, allow_redirects=True)
    res.raise_for_status()
    return res.headers.get("ETag") or res.headers.get("Last-Modified")


@dataclass
class FetchResult:
    path: str        # local file holding the payload
    fetched: bool    # False = cache hit, no GET was issued
    cache_key: str   # sha256 over (url, change-token)
    ckey: str | None  # the server's change token (etag / last-modified)


def _cache_key(url: str, ckey: str | None) -> str:
    return hashlib.sha256(f"{url}\n{ckey or ''}".encode()).hexdigest()


def fetch(
    url: str,
    cache_dir: str = DEFAULT_CACHE_DIR,
    use_cache: bool = True,
    timeout: float = 30.0,
) -> FetchResult:
    """GET ``url`` with conditional re-read.

    HEAD first; if a payload for (url, change-token) is already cached, the
    GET is skipped entirely (``fetched=False``). A changed etag/Last-Modified
    yields a new key → re-download. No token ⇒ every call re-fetches (the
    reference behaves the same: no ckey → key over the URL alone, but we
    must not serve stale payloads for token-less servers).
    """
    ckey = head_key(url, timeout=timeout) if use_cache else None
    key = _cache_key(url, ckey)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, key)
    if use_cache and ckey is not None and os.path.exists(path):
        return FetchResult(path=path, fetched=False, cache_key=key, ckey=ckey)

    res = requests.get(url, timeout=timeout)
    res.raise_for_status()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(res.content)
    os.replace(tmp, path)  # atomic publish; readers never see partial files
    return FetchResult(path=path, fetched=True, cache_key=key, ckey=ckey)


def fetch_many(
    urls: list[str], cache_dir: str = DEFAULT_CACHE_DIR, **kw
) -> list[FetchResult]:
    """Fetch a seed list of URLs on the driver (reference: seed globs may
    expand to many resources, /root/reference/investigraph/logic/seed.py:14-23).
    For crawl-scale URL tables use :func:`fetch_partitioned`."""
    return [fetch(u, cache_dir=cache_dir, **kw) for u in urls]


def fetch_partitioned(
    spark,
    urls,
    cache_dir: str = DEFAULT_CACHE_DIR,
    n_partitions: int | None = None,
    use_cache: bool = True,
    timeout: float = 30.0,
):
    """Crawl-scale fan-out: fetch a URL table partition-parallel on executors.

    ``urls`` is a DataFrame with a ``url`` column (or a plain list, for
    convenience). Each partition opens ONE ``requests.Session`` (connection
    reuse across its URLs) and applies the same HEAD-then-conditional-GET
    protocol as :func:`fetch`, against a node-local cache dir. The payload
    comes back as a ``binary`` column rather than a path — at cluster scale a
    path written by an executor means nothing to the driver or to other
    executors, and keeping bytes in the DataFrame lets the parse/decode stage
    run where the fetch ran (no second hop).

    Returned columns: ``url, content, fetched, ckey, part_id`` (``part_id`` =
    the executing partition, for fan-out observability/tests).
    """
    import pandas as pd  # noqa: F401  (mapInPandas payload frames)
    from pyspark import TaskContext

    if isinstance(urls, (list, tuple)):
        urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
    else:
        urls_df = urls
    if n_partitions:
        urls_df = urls_df.repartition(n_partitions)

    def _fetch_partition(batches):
        import pandas as pd

        ses = requests.Session()
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            rows = []
            for u in pdf["url"]:
                ckey = None
                if use_cache:
                    head = ses.head(u, timeout=timeout, allow_redirects=True)
                    head.raise_for_status()
                    ckey = head.headers.get("ETag") or head.headers.get("Last-Modified")
                key = _cache_key(u, ckey)
                path = os.path.join(cache_dir, key)
                if use_cache and ckey is not None and os.path.exists(path):
                    with open(path, "rb") as f:
                        content = f.read()
                    fetched = False
                else:
                    res = ses.get(u, timeout=timeout)
                    res.raise_for_status()
                    content = res.content
                    os.makedirs(cache_dir, exist_ok=True)
                    tmp = f"{path}.tmp.{os.getpid()}.{pid}"
                    with open(tmp, "wb") as f:
                        f.write(content)
                    os.replace(tmp, path)  # atomic, concurrent-partition safe
                    fetched = True
                rows.append((u, content, fetched, ckey, pid))
            yield pd.DataFrame(
                rows, columns=["url", "content", "fetched", "ckey", "part_id"]
            )

    return urls_df.mapInPandas(
        _fetch_partition,
        schema="url string, content binary, fetched boolean, ckey string, part_id int",
    )
