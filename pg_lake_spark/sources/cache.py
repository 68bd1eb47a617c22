"""Local file cache for remote lake objects.

The reference keeps an NVMe mirror of hot remote files behind a caching
filesystem (duckdb_pglake/src/fs/caching_file_system.cpp +
file_cache_manager.cpp) managed by a periodic background worker
(pg_lake_engine/src/pgduck/cache_worker.c: enable/max_cache_size_mb/
cache_manager_interval settings). This is the engine-side analogue:

- reads RECORD a candidate; a manage pass downloads queued candidates
  into the cache dir and evicts least-recently-used entries until the
  cache fits ``max_bytes`` (files >= the cache size are skipped as
  too-large, exactly the reference's SKIPPED_TOO_LARGE action)
- cache entries are keyed by the url's sha256 and validated against the
  remote (size + etag/last-modified when the fetcher provides them); a
  stale entry is refetched
- :meth:`resolve` is the read-through entry point: cached local path on
  a hit (touching atime for LRU), the remote url on a miss (callers
  keep streaming remotely — caching must never block a scan, which is
  the reference's model: the worker fills the cache out-of-band)
- :meth:`start_worker` runs the manage pass on a cadence in a daemon
  thread; errors are logged and the loop continues (same resilience
  contract as lakehouse.maintenance.Autovacuum)

In Spark terms this layer serves the DRIVER-side planning reads (log
and manifest files in lakehouse/, format sniffing) and local-mode data
reads; executor-side parquet IO goes through Hadoop FS as usual — for
cluster data caching the right levers are Spark/Hadoop native
(spark.hadoop.fs.s3a.* caches, df.cache()), which SURVEY documents as
the accepted deviation.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class FetchResult:
    data: bytes
    etag: str | None = None


def _default_fetcher(url: str) -> FetchResult:
    if url.startswith(("http://", "https://")):
        with urllib.request.urlopen(url) as resp:  # noqa: S310
            return FetchResult(resp.read(), resp.headers.get("ETag"))
    if url.startswith("file://"):
        with open(url[len("file://"):], "rb") as fh:
            return FetchResult(fh.read())
    raise ValueError(f"no fetcher for url scheme: {url}")


@dataclass
class CacheStats:
    added: int = 0
    added_bytes: int = 0
    evicted: int = 0
    evicted_bytes: int = 0
    skipped_too_large: int = 0
    add_failed: int = 0
    hits: int = 0
    misses: int = 0

    def as_dict(self) -> dict:
        return dict(self.__dict__)


def _head_remote(url: str) -> tuple[int | None, str | None]:
    """(content-length, etag) from a HEAD request; (None, None) when
    the scheme has no cheap metadata probe."""
    if url.startswith(("http://", "https://")):
        req = urllib.request.Request(url, method="HEAD")  # noqa: S310
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            cl = resp.headers.get("Content-Length")
            return (int(cl) if cl is not None else None, resp.headers.get("ETag"))
    if url.startswith("file://"):
        return os.path.getsize(url[len("file://"):]), None
    return None, None


@dataclass
class FileCacheManager:
    cache_dir: str
    max_bytes: int = 256 * 1024 * 1024
    fetcher: Callable[[str], FetchResult] = field(default=_default_fetcher)
    #: hits older than this re-check the remote's (size, etag) via a
    #: HEAD probe before being served — an hf:// dataset updated in
    #: place is re-fetched within this window, never served stale
    #: forever. <= 0 disables revalidation.
    revalidate_after_s: float = 300.0
    prober: Callable[[str], tuple[int | None, str | None]] = field(
        default=_head_remote
    )

    def __post_init__(self) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        self._queue: dict[str, None] = {}  # ordered candidate set
        self._lock = threading.Lock()
        self.stats = CacheStats()
        self._worker: threading.Thread | None = None
        self._stop = threading.Event()
        self.last_error: BaseException | None = None
        #: urls a manage pass skipped as too large for the cache —
        #: resolve() stops re-queueing them (each re-queue used to
        #: re-download the whole object just to discard it) and
        #: fetch_remote falls back to an uncached one-shot download
        self._too_large: set[str] = set()

    # -- keys -------------------------------------------------------------

    def _paths(self, url: str) -> tuple[str, str]:
        key = hashlib.sha256(url.encode()).hexdigest()
        return (
            os.path.join(self.cache_dir, key + ".bin"),
            os.path.join(self.cache_dir, key + ".meta.json"),
        )

    # -- read-through surface --------------------------------------------

    def resolve(self, url: str) -> str:
        """Cached local path on a hit (recording the access for LRU);
        the url itself on a miss, after queueing it as a candidate —
        resolution never blocks on a download. Hits whose last remote
        check is older than ``revalidate_after_s`` re-probe the remote
        (size/etag) and fall through to the miss path if stale."""
        data_path, _ = self._paths(url)
        if os.path.exists(data_path):
            if not self._revalidate_if_due(url):
                with self._lock:
                    self.stats.misses += 1
                    self._queue[url] = None
                return url
            try:
                os.utime(data_path)  # LRU touch
            except FileNotFoundError:
                # a background manage pass evicted this entry between
                # the exists check and the touch — serve it as a miss
                # (caching must never crash a scan)
                with self._lock:
                    self.stats.misses += 1
                    self._queue[url] = None
                return url
            with self._lock:
                self.stats.hits += 1
            return data_path
        with self._lock:
            self.stats.misses += 1
            if url not in self._too_large:
                self._queue[url] = None
        return url

    def is_too_large(self, url: str) -> bool:
        """True when a manage pass skipped ``url`` because it does not
        fit the cache — the caller should stream it uncached."""
        return url in self._too_large

    def _revalidate_if_due(self, url: str) -> bool:
        """True if the cached entry may be served; False if it was
        found stale and invalidated. A probe failure (offline, HEAD
        unsupported) keeps the entry — availability over freshness,
        matching the reference's cache-worker resilience contract."""
        if self.revalidate_after_s <= 0:
            return True
        data_path, meta_path = self._paths(url)
        try:
            with open(meta_path) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            return True  # legacy entry without metadata: serve as-is
        if time.time() - meta.get("checked_at", 0) < self.revalidate_after_s:
            return True
        try:
            size, etag = self.prober(url)
        except Exception as exc:  # noqa: BLE001
            self.last_error = exc
            return True
        if not self.validate(url, size=size, etag=etag):
            return False
        # Re-read before stamping: a manage() refetch between our load
        # above and this write may have recorded NEW size/etag — writing
        # the stale copy back would make the next probe falsely
        # invalidate a fresh entry (spurious refetch every window).
        try:
            with open(meta_path) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            pass  # keep the loaded copy; entry may be mid-rewrite
        meta["checked_at"] = time.time()
        try:
            mtmp = meta_path + ".tmp"
            with open(mtmp, "w") as fh:
                json.dump(meta, fh)
            os.replace(mtmp, meta_path)
        except OSError:
            pass
        return os.path.exists(data_path)

    def record_candidate(self, url: str) -> None:
        with self._lock:
            self._queue[url] = None

    # -- manage pass (the reference's pg_lake_manage_cache) ---------------

    def manage(self) -> dict:
        """Download queued candidates, validate existing entries, evict
        LRU entries until the cache fits max_bytes. Returns the action
        counts (the reference logs the same breakdown)."""
        with self._lock:
            candidates = list(self._queue)
            self._queue.clear()
        for url in candidates:
            data_path, meta_path = self._paths(url)
            if os.path.exists(data_path):
                continue
            # cheap metadata probe first: a file that cannot fit must
            # be SKIPPED_TOO_LARGE without downloading it (pre-r14 the
            # whole object was pulled into driver memory every pass
            # just to be discarded)
            try:
                probed_size, _ = self.prober(url)
            except Exception:  # noqa: BLE001 — probe is best-effort
                probed_size = None
            if probed_size is not None and probed_size >= self.max_bytes:
                self._too_large.add(url)
                with self._lock:
                    self.stats.skipped_too_large += 1
                continue
            try:
                res = self.fetcher(url)
            except Exception as exc:  # noqa: BLE001 — per-file isolation
                self.last_error = exc
                with self._lock:
                    self.stats.add_failed += 1
                continue
            if len(res.data) >= self.max_bytes:
                self._too_large.add(url)
                with self._lock:
                    self.stats.skipped_too_large += 1
                continue
            tmp = data_path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(res.data)
            # meta atomically too: a crash or concurrent reader
            # mid-write must never leave truncated JSON behind
            mtmp = meta_path + ".tmp"
            with open(mtmp, "w") as fh:
                json.dump(
                    {
                        "url": url,
                        "size": len(res.data),
                        "etag": res.etag,
                        "checked_at": time.time(),
                    },
                    fh,
                )
            os.replace(mtmp, meta_path)
            os.replace(tmp, data_path)
            with self._lock:
                self.stats.added += 1
                self.stats.added_bytes += len(res.data)
        self._evict_to_fit()
        return self.stats.as_dict()

    def invalidate(self, url: str) -> bool:
        data_path, meta_path = self._paths(url)
        existed = os.path.exists(data_path)
        self._too_large.discard(url)
        for p in (data_path, meta_path):
            try:
                os.remove(p)
            except FileNotFoundError:
                pass  # concurrent evict/invalidate already removed it
        return existed

    def validate(self, url: str, *, size: int | None = None, etag: str | None = None) -> bool:
        """Drop the entry if the remote's (size, etag) no longer match
        the cached metadata; True if the entry remains valid."""
        data_path, meta_path = self._paths(url)
        if not os.path.exists(data_path):
            return False
        try:
            with open(meta_path) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            meta = {}  # missing OR corrupt meta: treat as metadata-less
        if (size is not None and meta.get("size") != size) or (
            etag is not None and meta.get("etag") not in (None, etag)
        ):
            self.invalidate(url)
            return False
        return True

    def _entries(self) -> list[tuple[float, int, str]]:
        out = []
        for name in os.listdir(self.cache_dir):
            if not name.endswith(".bin"):
                continue
            p = os.path.join(self.cache_dir, name)
            try:
                st = os.stat(p)
            except FileNotFoundError:
                continue
            out.append((st.st_atime, st.st_size, p))
        return out

    def _evict_to_fit(self) -> None:
        entries = self._entries()
        total = sum(sz for _, sz, _ in entries)
        if total <= self.max_bytes:
            return
        for _, sz, p in sorted(entries):  # oldest atime first
            try:
                os.remove(p)
            except FileNotFoundError:
                continue  # lost the race to invalidate(); nothing evicted
            meta = p[: -len(".bin")] + ".meta.json"
            try:
                os.remove(meta)
            except FileNotFoundError:
                pass
            with self._lock:
                self.stats.evicted += 1
                self.stats.evicted_bytes += sz
            total -= sz
            if total <= self.max_bytes:
                return

    def cache_bytes(self) -> int:
        return sum(sz for _, sz, _ in self._entries())

    # -- background worker (cache_worker.c analogue) ----------------------

    def start_worker(self, interval_s: float = 60.0) -> None:
        if self._worker is not None:
            return
        self._stop.clear()

        def loop() -> None:
            while not self._stop.wait(interval_s):
                try:
                    self.manage()
                except Exception as exc:  # noqa: BLE001 — keep cadence
                    self.last_error = exc

        self._worker = threading.Thread(target=loop, daemon=True, name="lake-cache")
        self._worker.start()

    def stop_worker(self) -> None:
        if self._worker is None:
            return
        self._stop.set()
        self._worker.join(timeout=5)
        self._worker = None
