"""Local file cache for remote lake objects (reference parity:
duckdb_pglake/src/fs/file_cache_manager.cpp + cache_worker.c —
candidate queue, manage pass, LRU eviction, too-large skip, periodic
worker)."""

from __future__ import annotations

import os
import time

import pytest

from pg_lake_spark.sources.cache import FetchResult, FileCacheManager


class CountingFetcher:
    def __init__(self, blobs: dict[str, bytes]):
        self.blobs = blobs
        self.calls: list[str] = []

    def __call__(self, url: str) -> FetchResult:
        self.calls.append(url)
        if url not in self.blobs:
            raise FileNotFoundError(url)
        return FetchResult(self.blobs[url], etag=f"et-{len(self.blobs[url])}")


def test_read_through_and_hit(tmp_path):
    f = CountingFetcher({"remote://a": b"x" * 100})
    c = FileCacheManager(str(tmp_path / "c"), max_bytes=1000, fetcher=f)
    # miss: resolve returns the url (non-blocking) and queues it
    assert c.resolve("remote://a") == "remote://a"
    assert c.stats.misses == 1
    stats = c.manage()
    assert stats["added"] == 1 and stats["added_bytes"] == 100
    # hit: resolve returns a local path with the exact bytes
    local = c.resolve("remote://a")
    assert os.path.isfile(local)
    assert open(local, "rb").read() == b"x" * 100
    assert c.stats.hits == 1
    # the fetcher ran exactly once
    assert f.calls == ["remote://a"]


def test_lru_eviction_under_pressure(tmp_path):
    blobs = {f"remote://{i}": bytes([i]) * 100 for i in range(5)}
    f = CountingFetcher(blobs)
    c = FileCacheManager(str(tmp_path / "c"), max_bytes=250, fetcher=f)
    for i in range(5):
        c.record_candidate(f"remote://{i}")
    c.manage()
    # only ~2 files fit; eviction was LRU so the cache is within budget
    assert c.cache_bytes() <= 250
    assert c.stats.evicted >= 3
    # touch a survivor then add pressure: the touched one survives again
    # (probe by path existence — resolve() would re-queue the misses)
    survivors = [u for u in blobs if os.path.exists(c._paths(u)[0])]
    assert survivors
    keep = survivors[0]
    time.sleep(0.05)
    os.utime(c._paths(keep)[0])
    c.record_candidate("remote://new")
    f.blobs["remote://new"] = b"n" * 100
    c.manage()
    assert os.path.exists(c._paths(keep)[0])  # still cached


def test_too_large_skipped(tmp_path):
    f = CountingFetcher({"remote://big": b"b" * 5000})
    c = FileCacheManager(str(tmp_path / "c"), max_bytes=1000, fetcher=f)
    c.record_candidate("remote://big")
    stats = c.manage()
    assert stats["skipped_too_large"] == 1 and stats["added"] == 0
    assert c.resolve("remote://big") == "remote://big"
    # r14 review: the skip is remembered — further resolve/manage cycles
    # must NOT re-download the whole object just to discard it again
    assert c.is_too_large("remote://big")
    downloads = len(f.calls)
    c.manage()
    assert len(f.calls) == downloads, "too-large url re-downloaded"


def test_too_large_probe_avoids_download(tmp_path):
    """With a working size probe, a too-large candidate is skipped from
    the HEAD alone — the fetcher never runs (pre-r14 it pulled the whole
    object into driver memory every manage pass)."""
    f = CountingFetcher({"remote://big": b"b" * 5000})
    c = FileCacheManager(
        str(tmp_path / "c"), max_bytes=1000, fetcher=f,
        prober=lambda url: (len(f.blobs[url]), None),
    )
    c.record_candidate("remote://big")
    stats = c.manage()
    assert stats["skipped_too_large"] == 1
    assert f.calls == [], "too-large object was downloaded despite the probe"


def test_fetch_remote_falls_back_for_too_large(tmp_path, monkeypatch):
    """fetch_remote must degrade to an uncached one-shot download when
    the cache skips the file as too large — not raise IOError forever."""
    import pg_lake_spark.sources.readers as readers

    blob = b"p" * 5000
    c = FileCacheManager(
        str(tmp_path / "c"), max_bytes=1000,
        fetcher=lambda url: FetchResult(blob),
        prober=lambda url: (len(blob), None),
    )
    def fake_urlopen(req, *a, **kw):
        import io

        class R(io.BytesIO):
            headers = {}

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

        return R(blob)

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    url = f"https://example.invalid/{tmp_path.name}.bin"  # unique dl key
    local = readers.fetch_remote(url, cache=c)
    assert local != url
    assert open(local, "rb").read() == blob


def test_fetch_failure_isolated(tmp_path):
    f = CountingFetcher({"remote://ok": b"o" * 10})
    c = FileCacheManager(str(tmp_path / "c"), max_bytes=1000, fetcher=f)
    c.record_candidate("remote://gone")
    c.record_candidate("remote://ok")
    stats = c.manage()
    assert stats["add_failed"] == 1 and stats["added"] == 1
    assert isinstance(c.last_error, FileNotFoundError)


def test_validate_and_invalidate(tmp_path):
    f = CountingFetcher({"remote://a": b"x" * 100})
    c = FileCacheManager(str(tmp_path / "c"), max_bytes=1000, fetcher=f)
    c.record_candidate("remote://a")
    c.manage()
    assert c.validate("remote://a", size=100, etag="et-100") is True
    # size drift drops the entry
    assert c.validate("remote://a", size=101) is False
    assert c.resolve("remote://a") == "remote://a"  # miss again


def test_worker_runs_and_survives_errors(tmp_path):
    calls = []

    class FlakyFetcher:
        def __call__(self, url):
            calls.append(url)
            if len(calls) == 1:
                raise RuntimeError("transient")
            return FetchResult(b"d" * 10)

    c = FileCacheManager(str(tmp_path / "c"), max_bytes=1000, fetcher=FlakyFetcher())
    c.record_candidate("remote://x")
    c.start_worker(interval_s=0.05)
    try:
        deadline = time.time() + 5
        while time.time() < deadline and c.stats.add_failed == 0:
            time.sleep(0.02)
        assert c.stats.add_failed == 1
        # re-queue: the worker keeps running after the failure
        c.record_candidate("remote://x")
        while time.time() < deadline and c.stats.added == 0:
            time.sleep(0.02)
        assert c.stats.added == 1
    finally:
        c.stop_worker()


def test_file_url_default_fetcher(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"hello lake")
    c = FileCacheManager(str(tmp_path / "c"), max_bytes=1000)
    url = "file://" + str(src)
    c.record_candidate(url)
    c.manage()
    local = c.resolve(url)
    assert local != url and open(local, "rb").read() == b"hello lake"


def test_session_facade(tmp_path, spark):
    from pg_lake_spark.session import LakeSession

    sess = LakeSession(spark)
    f = CountingFetcher({"remote://a": b"z" * 8})
    cache = sess.enable_file_cache(str(tmp_path / "c"), max_bytes=100, fetcher=f)
    assert sess.file_cache is cache
    cache.record_candidate("remote://a")
    cache.manage()
    assert cache.resolve("remote://a") != "remote://a"


# --- remote read-through (hf:// + http) ------------------------------------


def test_hf_url_translation():
    from pg_lake_spark.sources.readers import hf_to_https

    assert hf_to_https(
        "hf://datasets/org/proj/data/train-00000-of-00001.parquet"
    ) == "https://huggingface.co/datasets/org/proj/resolve/main/data/train-00000-of-00001.parquet"
    assert hf_to_https("hf://datasets/org/proj@v2/f.parquet") == (
        "https://huggingface.co/datasets/org/proj/resolve/v2/f.parquet"
    )
    assert "refs%2Fconvert%2Fparquet" in hf_to_https(
        "hf://datasets/org/proj@~parquet/f.parquet"
    )
    assert hf_to_https("/local/path.parquet") == "/local/path.parquet"
    with pytest.raises(ValueError, match="hf://"):
        hf_to_https("hf://bogus")


def test_read_lake_remote_through_cache(spark, tmp_path):
    """An hf:// table read lands through the injected cache fetcher —
    the full foreign-table-over-HF plumbing with no network."""
    from pg_lake_spark.sources.readers import read_lake

    src = tmp_path / "src.parquet"
    spark.range(5).toPandas().to_parquet(src)
    blob = src.read_bytes()
    url = "https://huggingface.co/datasets/org/proj/resolve/main/train.parquet"
    f = CountingFetcher({url: blob})
    c = FileCacheManager(str(tmp_path / "cache"), max_bytes=10_000_000, fetcher=f)
    df = read_lake(spark, "hf://datasets/org/proj/train.parquet", cache=c)
    assert df.count() == 5
    # second read is a cache hit: the fetcher is not called again
    df2 = read_lake(spark, "hf://datasets/org/proj/train.parquet", cache=c)
    assert df2.count() == 5 and f.calls == [url]


def test_read_lake_remote_fetch_failure(spark, tmp_path):
    from pg_lake_spark.sources.readers import read_lake

    f = CountingFetcher({})
    c = FileCacheManager(str(tmp_path / "cache"), max_bytes=1000, fetcher=f)
    with pytest.raises(IOError, match="failed to fetch"):
        read_lake(spark, "hf://datasets/org/proj/missing.parquet", cache=c)


def test_create_table_from_load_and_definition(spark, tmp_path):
    """CREATE TABLE () WITH (load_from/definition_from) parity — schema
    inferred from the source file; load_from also loads the rows."""
    from pg_lake_spark.session import LakeSession

    src = tmp_path / "src.csv"
    src.write_text("k,v,w\n1,a,0.5\n2,b,1.5\n3,c,2.5\n")
    sess = LakeSession(spark)
    t = sess.create_table_from("t_loaded", str(tmp_path / "loc1"), load_from=str(src))
    got = sorted(tuple(r) for r in spark.table("t_loaded").collect())
    assert got == [(1, "a", 0.5), (2, "b", 1.5), (3, "c", 2.5)]

    t2 = sess.create_table_from(
        "t_empty", str(tmp_path / "loc2"), definition_from=str(src)
    )
    df = spark.table("t_empty")
    assert df.count() == 0 and df.columns == ["k", "v", "w"]

    with pytest.raises(ValueError, match="exactly one"):
        sess.create_table_from("x", str(tmp_path / "loc3"))


def test_stale_entry_revalidated_and_refetched(tmp_path):
    """A hit older than revalidate_after_s HEAD-probes the remote; a
    size change invalidates and re-queues (never served stale forever)."""
    f = CountingFetcher({"remote://a": b"x" * 100})
    probes: list[str] = []

    def prober(url):
        probes.append(url)
        return len(f.blobs[url]), None

    c = FileCacheManager(
        str(tmp_path / "c"), max_bytes=1000, fetcher=f,
        revalidate_after_s=0.01, prober=prober,
    )
    c.record_candidate("remote://a")
    c.manage()  # r14: the fill itself probes once (too-large pre-check)
    assert probes == ["remote://a"]
    time.sleep(0.05)
    # unchanged remote: revalidation probe happens, entry still served
    local = c.resolve("remote://a")
    assert local != "remote://a" and probes == ["remote://a"] * 2
    # remote changed in place → next due probe invalidates → miss
    f.blobs["remote://a"] = b"y" * 250
    time.sleep(0.05)
    assert c.resolve("remote://a") == "remote://a"
    c.manage()
    local = c.resolve("remote://a")
    assert local != "remote://a"
    assert open(local, "rb").read() == b"y" * 250


def test_probe_failure_keeps_entry(tmp_path):
    f = CountingFetcher({"remote://a": b"x" * 100})

    def prober(url):
        raise OSError("offline")

    c = FileCacheManager(
        str(tmp_path / "c"), max_bytes=1000, fetcher=f,
        revalidate_after_s=0.01, prober=prober,
    )
    c.record_candidate("remote://a")
    c.manage()
    time.sleep(0.05)
    assert c.resolve("remote://a") != "remote://a"  # availability wins


def test_revalidation_stamp_keeps_concurrent_refetch_meta(tmp_path):
    """The checked_at stamp re-reads meta before writing: if a manage()
    refetch recorded NEW size/etag between the hit's meta load and the
    stamp, writing the stale copy back would make the next probe falsely
    invalidate a fresh entry (r16 cache review)."""
    f = CountingFetcher({"remote://a": b"x" * 100})
    n_probes = {"n": 0}

    def prober(url):
        # Probe 1 is manage()'s too-large pre-check during the fill.
        # Probe 2 is the revalidation probe — simulate a manage()
        # refetch landing DURING that probe window: the remote (and
        # the cache, via manage) moved to the new blob.
        n_probes["n"] += 1
        if n_probes["n"] == 2:
            f.blobs[url] = b"y" * 250
            c.invalidate(url)
            c.record_candidate(url)
            c.manage()
        return len(f.blobs[url]), None

    c = FileCacheManager(
        str(tmp_path / "c"), max_bytes=1000, fetcher=f,
        revalidate_after_s=0.01, prober=prober,
    )
    c.record_candidate("remote://a")
    c.manage()
    time.sleep(0.05)
    # This hit's revalidation probes; the probe itself refetches the
    # entry (new size 250) and the probe result matches it — the stamp
    # must not regress meta["size"] back to 100.
    local = c.resolve("remote://a")
    assert local != "remote://a"
    _, meta_path = c._paths("remote://a")
    import json as _json

    assert _json.load(open(meta_path))["size"] == 250
    # Next due revalidation sees matching metadata: entry is served,
    # not refetched.
    time.sleep(0.05)
    n_fetches = len(f.calls)
    assert c.resolve("remote://a") != "remote://a"
    c.manage()
    assert len(f.calls) == n_fetches
