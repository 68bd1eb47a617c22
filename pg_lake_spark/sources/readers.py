"""Lake readers: Parquet / CSV (dialect-sniffed) / JSON / text-log.

Reference parity (SURVEY §2.1):
- ``read_lake(fmt='parquet'|'csv'|'json')`` ≈ the lake analytics table
  over files/globs (pg_lake_table option.c: path/format/compression/
  header/delimiter/quote/escape/null/filename options).
- CSV dialect sniffing ≈ SniffCSV (pg_lake_engine/src/pgduck/
  sniff_csv.c:35): sample the head of the first file, probe candidate
  delimiters/quotes, pick the most consistent.
- ``filename 'true'`` option ≈ withColumn(input_file_name()).
- S3 access-log scan ≈ read_data.c:1876 GetLogFormatRegex — text source
  + regexp_extract projection.
- ``list_files`` ≈ lake_file.list() (remote_storage.c:67).

Compression (gzip/zstd/…) needs no option: Spark's text-based sources
infer it from the file extension, like the reference's DuckDB readers.
"""

from __future__ import annotations

import csv as _csv
import glob as _glob
import io
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SNIFF_BYTES = 64 * 1024
_CANDIDATE_DELIMS = [",", "\t", ";", "|"]


def _strip_file_scheme(path: str) -> str:
    """``file:///x`` / ``file:/x`` → ``/x`` for driver-side open():
    Spark/Hadoop emit file:-URIs that the os module cannot open."""
    import re as _re

    return _re.sub(r"^file:(//)?", "", path)


def _first_regular_file(path: str, member_ok=None, max_depth: int = 8) -> str:
    """Resolve a glob/dir path to the first REGULAR file for a
    driver-side sniff. Shared by the CSV dialect sniffer, the GDAL
    format sniffer, and the GeoJSON layout sniffer — each hand-rolled
    this before, and two of the three copies open()'d a subdirectory
    of a partitioned layout (IsADirectoryError, r15 review). Descends
    partition directories (date=2024/...), skips dot/underscore names,
    and applies ``member_ok`` to file names only."""
    path = _strip_file_scheme(path)
    paths = sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not paths:
        raise FileNotFoundError(path)
    first = paths[0]
    for _ in range(max_depth):
        if not os.path.isdir(first):
            return first
        members = sorted(
            p for p in os.listdir(first) if not p.startswith((".", "_"))
        )
        files = [
            p
            for p in members
            if os.path.isfile(os.path.join(first, p))
            and (member_ok is None or member_ok(p))
        ]
        if files:
            return os.path.join(first, files[0])
        dirs = [p for p in members if os.path.isdir(os.path.join(first, p))]
        if not dirs:
            raise FileNotFoundError(f"no data files under {first}")
        first = os.path.join(first, dirs[0])
    raise FileNotFoundError(f"no data file within {max_depth} levels of {path}")


def _sniff_dialect_from_sample(sample: str) -> dict[str, str | bool]:
    try:
        dialect = _csv.Sniffer().sniff(sample, delimiters="".join(_CANDIDATE_DELIMS))
        delim, quote = dialect.delimiter, dialect.quotechar
    except _csv.Error:
        # fall back: most frequent candidate in the first line
        line1 = sample.splitlines()[0] if sample else ""
        delim = max(_CANDIDATE_DELIMS, key=line1.count)
        quote = '"'
    try:
        header = _csv.Sniffer().has_header(sample)
    except _csv.Error:
        header = True
    return {"sep": delim, "quote": quote, "header": header}


def sniff_csv_dialect(path: str, sample_bytes: int = _SNIFF_BYTES) -> dict[str, str | bool]:
    """Infer delimiter/quote/header from a sample of the first file.

    Mirrors SniffCSV's approach (sample → dialect probe → header
    detection by type-consistency of the first row). Driver-side, reads
    only ``sample_bytes`` of one file — O(1) regardless of table size.
    """
    first = _first_regular_file(
        path, member_ok=lambda p: ".csv" in p or ".txt" in p or "." not in p
    )
    opener = open
    if first.endswith(".gz"):
        import gzip

        opener = gzip.open
    with opener(first, "rb") as f:
        sample = f.read(sample_bytes).decode("utf-8", errors="replace")
    return _sniff_dialect_from_sample(sample)


def sniff_csv_dialect_remote(
    spark: SparkSession, path: str, sample_bytes: int = _SNIFF_BYTES
) -> dict[str, str | bool]:
    """Dialect sniff for scheme'd paths (s3a://, hdfs://, …) through
    Hadoop's FileSystem: glob to the first file, read one bounded
    sample, reuse the local sniffer. Before this, remote CSVs were
    force-defaulted to header=True, silently consuming the first data
    row of every headerless file (r15 review)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    statuses = fs.globStatus(hpath)
    if statuses is None or len(statuses) == 0:
        raise FileNotFoundError(path)
    # Bounded descent mirroring _first_regular_file: a hive-partitioned
    # layout (events/date=2024/part-0.csv) has no regular files at the
    # top level, so a one-level listing would FileNotFoundError a table
    # Spark reads fine (r15 self-review).
    status = statuses[0]
    depth = 0
    while status.isDirectory() and depth < 8:
        children = [
            st
            for st in fs.listStatus(status.getPath())
            if not st.getPath().getName().startswith((".", "_"))
        ]
        files = sorted(
            (st for st in children if not st.isDirectory()),
            key=lambda st: st.getPath().getName(),
        )
        if files:
            status = files[0]
            break
        dirs = sorted(
            (st for st in children if st.isDirectory()),
            key=lambda st: st.getPath().getName(),
        )
        if not dirs:
            raise FileNotFoundError(
                f"no data files under {status.getPath().toString()}"
            )
        status = dirs[0]
        depth += 1
    if status.isDirectory():
        raise FileNotFoundError(f"no data file within 8 levels of {path}")
    first = status.getPath()
    stream = fs.open(first)
    try:
        bounded = jvm.org.apache.commons.io.input.BoundedInputStream(
            stream, sample_bytes
        )
        raw = jvm.org.apache.commons.io.IOUtils.toByteArray(bounded)
    finally:
        stream.close()
    sample = bytes(raw).decode("utf-8", errors="replace")
    return _sniff_dialect_from_sample(sample)


def _extract_zip_members(zip_file: str, zip_path: str | None) -> str:
    """Extract (matching) members of a .zip into a content-addressed
    scratch dir and return the read path — the reference's ``zip_path``
    option (docs/file-formats-reference.md:118-126: 'Relative path
    within a .zip file'). Extraction is driver-side and cached on the
    archive's (path, mtime, size): zips aren't splittable, so the
    reference's GDAL/DuckDB readers pay the same one-node unzip; at
    scale, unzip-to-object-store once and scan the extracted files.
    ``zip_path`` may be an exact member name or an fnmatch glob; None
    extracts every member."""
    import fnmatch
    import hashlib
    import tempfile
    import zipfile

    st = os.stat(zip_file)
    key = hashlib.md5(
        f"{os.path.abspath(zip_file)}|{st.st_mtime_ns}|{st.st_size}|{zip_path}".encode()
    ).hexdigest()
    out = os.path.join(tempfile.gettempdir(), f"pg_lake_zip_{key}")
    done = os.path.join(out, ".extracted")
    if not os.path.exists(done):
        # Extract into a PRIVATE temp dir and publish it with one
        # rename: extracting in place + a plain open(done,'w') marker
        # let a crash mid-write (or a concurrent extractor truncating
        # member files with 'wb') poison the cache permanently — an
        # empty marker even made commonpath([]) raise forever (r15
        # review). The rename either installs a complete dir or loses
        # the race to another complete dir.
        import shutil

        tmpdir = tempfile.mkdtemp(
            dir=tempfile.gettempdir(), prefix=f"pg_lake_zip_{key}."
        )
        try:
            with zipfile.ZipFile(zip_file) as zf:
                members = [
                    m
                    for m in zf.namelist()
                    if not m.endswith("/")
                    and (
                        zip_path is None
                        or m == zip_path
                        or fnmatch.fnmatch(m, zip_path)
                    )
                ]
                if not members:
                    raise FileNotFoundError(
                        f"no member matching {zip_path!r} in {zip_file}"
                    )
                for m in members:
                    zf.extract(m, tmpdir)
            with open(os.path.join(tmpdir, ".extracted"), "w") as fh:
                fh.write("\n".join(members))
            if os.path.isdir(out) and not os.path.exists(done):
                shutil.rmtree(out, ignore_errors=True)  # poisoned partial
            try:
                os.rename(tmpdir, out)
            except OSError:
                # lost the publish race — the winner's dir is complete
                shutil.rmtree(tmpdir, ignore_errors=True)
                if not os.path.exists(done):
                    raise
        except BaseException:
            shutil.rmtree(tmpdir, ignore_errors=True)
            raise
    with open(done) as fh:
        members = fh.read().splitlines()
    if len(members) == 1:
        return os.path.join(out, members[0])
    common = os.path.commonpath([os.path.join(out, m) for m in members])
    return common if os.path.isdir(common) else out


def hf_to_https(path: str) -> str:
    """Translate an ``hf://`` url to the huggingface.co resolve url
    (reference: docs/file-formats-reference.md "Hugging Face" — the
    hf:// prefix replaces s3 and the /blob/main/ segment is dropped).

    ``hf://datasets/{org}/{name}/{file}`` →
    ``https://huggingface.co/datasets/{org}/{name}/resolve/main/{file}``;
    an ``@revision`` suffix on the repo (incl. the ``@~parquet``
    auto-conversion branch) selects that revision."""
    if not path.startswith("hf://"):
        return path
    rest = path[len("hf://"):]
    parts = rest.split("/", 3)
    if len(parts) < 4 or parts[0] not in ("datasets", "spaces", "models"):
        raise ValueError(f"unsupported hf:// path: {path}")
    kind, org, name, file = parts
    revision = "main"
    if "@" in name:
        name, revision = name.split("@", 1)
        if revision == "~parquet":
            revision = "refs%2Fconvert%2Fparquet"
    # model repos resolve at huggingface.co/{org}/{repo}/resolve/... —
    # only datasets/ and spaces/ carry their kind prefix (a 'models/'
    # segment 404s every model-file read, r15 review)
    prefix = "" if kind == "models" else f"{kind}/"
    return f"https://huggingface.co/{prefix}{org}/{name}/resolve/{revision}/{file}"


def fetch_remote(path: str, cache=None) -> str:
    """Materialize a remote (hf:// or http(s)://) file locally and
    return the local path; local paths pass through unchanged.

    With a :class:`~pg_lake_spark.sources.cache.FileCacheManager` the
    file lands in (and revalidates from) the cache — the reference
    routes remote reads through its caching filesystem the same way,
    except hf:// which it documents as uncached; here the cache is
    orthogonal to the scheme. Without one, a one-shot download goes to
    a content-addressed temp file."""
    path = hf_to_https(path)
    if not path.startswith(("http://", "https://")):
        return path
    if cache is not None:
        local = cache.resolve(path)
        if local == path:  # miss: fill synchronously, then re-resolve
            cache.manage()
            local = cache.resolve(path)
        if local != path:
            return local
        if not cache.is_too_large(path):
            raise IOError(f"failed to fetch {path}: {cache.last_error}")
        # too large for the cache: fall through to the one-shot
        # uncached download below — a cache sized below the file must
        # degrade to a direct read, not make the file unreadable
    import hashlib
    import tempfile
    import urllib.request

    key = hashlib.sha256(path.encode()).hexdigest()[:24]
    suffix = os.path.splitext(path.split("?")[0])[1] or ".bin"
    local = os.path.join(tempfile.gettempdir(), f"lake_dl_{key}{suffix}")
    fetch = not os.path.exists(local)
    if not fetch and time.time() - os.path.getmtime(local) > 300:
        # Revalidate a stale-ish copy against the remote's size — an
        # in-place update (e.g. an hf:// dataset) must not be served
        # forever. Probe failures keep the local copy (availability
        # over freshness, same contract as FileCacheManager).
        from pg_lake_spark.sources.cache import _head_remote

        try:
            size, _etag = _head_remote(path)
            if size is not None and size != os.path.getsize(local):
                fetch = True
            else:
                os.utime(local)  # checked: restart the TTL window
        except Exception:  # noqa: BLE001
            pass
    if fetch:
        # unique temp per writer: a shared fixed '.part' name lets two
        # concurrent first-readers interleave writes and cache garbage
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(local), prefix=os.path.basename(local) + "."
        )
        try:
            with urllib.request.urlopen(path) as resp, os.fdopen(fd, "wb") as out:  # noqa: S310
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
        except BaseException:
            # urlopen raises BEFORE os.fdopen wraps fd — without this a
            # retried failing URL leaked one fd + temp file per attempt
            # until EMFILE (r15 review); double-close after a body
            # failure is a harmless EBADF.
            try:
                os.close(fd)
            except OSError:
                pass
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        os.replace(tmp, local)
    return local


#: extension → concrete reader format for the GDAL-umbrella dispatch
_GDAL_EXTS = {
    "shp": "shp", "gpkg": "gpkg", "kml": "kml", "kmz": "kmz",
    # .mit is the docs' MapInfo interchange alias for .mif
    # (file-formats-reference.md: `.mif .mit .tab | MapInfo datasets`)
    "gml": "gml", "dxf": "dxf", "mif": "mif", "mit": "mif",
    "map": "map", "tab": "tab",
    "xodr": "xodr", "fgb": "fgb", "geojson": "geojson",
    # GeoJSONSeq (one feature per line) — read_geojson handles both
    # layouts (file-formats-reference.md: `.geojsons .geojsonl`)
    "geojsons": "geojson", "geojsonl": "geojson",
    "json": "geojson", "xlsx": "xlsx", "xls": "xls",
}


def _gunzipped(path: str) -> str:
    """Transparently decompress a ``.gz``-wrapped single file for the
    driver-side binary parsers (docs list ``.gpkg.gz`` with inference;
    SQLite can't stream gzip). Spark-read text formats don't need this
    — Hadoop codecs handle .gz natively. Cached on (path, mtime, size)
    like :func:`_extract_zip_members`, so repeated reads of the same
    archive reuse one decompressed copy instead of leaking temp files."""
    if not path.endswith(".gz"):
        return path
    import gzip as _gzip
    import hashlib as _hashlib
    import shutil as _shutil
    import tempfile as _tempfile

    st = os.stat(path)
    key = _hashlib.md5(
        f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()
    # pathkey identifies the SOURCE PATH alone: the prune below must
    # only evict superseded copies of THIS path — matching on the bare
    # basename also unlinked the live cache of a different directory's
    # same-named .gz (cache thrash + FileNotFoundError races, r15
    # review).
    pathkey = _hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:8]
    out = os.path.join(
        _tempfile.gettempdir(),
        f"pg_lake_gz_{pathkey}_{key}_{os.path.basename(path)[: -len('.gz')]}",
    )
    if not os.path.exists(out):
        # unique temp per writer (concurrent first-readers must not
        # interleave into one shared '.part'); os.replace is atomic
        fd, tmp = _tempfile.mkstemp(
            dir=os.path.dirname(out), prefix=os.path.basename(out) + "."
        )
        with _gzip.open(path, "rb") as src, os.fdopen(fd, "wb") as dst:
            _shutil.copyfileobj(src, dst)
        os.replace(tmp, out)
        # the key embeds (mtime, size): every rewrite of the source
        # mints a new key, so prune superseded copies of THIS SOURCE
        # PATH (same pathkey) or frequently-rewritten .gz inputs grow
        # the temp dir without bound. POSIX unlink leaves open fds
        # valid, and any old-path holder predates the source update.
        stem = os.path.basename(path)[: -len(".gz")]
        for stale in _glob.glob(
            os.path.join(
                _tempfile.gettempdir(),
                f"pg_lake_gz_{pathkey}_"
                + "[0-9a-f]" * 32
                + f"_{_glob.escape(stem)}",
            )
        ):
            if stale != out:
                try:
                    os.unlink(stale)
                except OSError:
                    pass
    return out


def _sniff_gdal_format(path: str) -> str:
    """Concrete vector format for ``format 'gdal'`` (docs/spatial.md:
    "the GDAL format will be inferred") — extension first, then file
    magic; a directory (e.g. an extracted zip) infers from the first
    recognizable member."""
    if any(c in path for c in "*?["):
        matches = sorted(_glob.glob(path))
        if not matches:
            raise FileNotFoundError(f"format 'gdal': no files match {path}")
        first = matches[0]
    else:
        first = path
    if os.path.isdir(first):
        for name in sorted(os.listdir(first)):
            ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
            if ext in _GDAL_EXTS:
                return _GDAL_EXTS[ext]
        raise ValueError(f"format 'gdal': no recognizable vector file under {first}")
    base = first[: -len(".gz")] if first.endswith(".gz") else first
    ext = base.rsplit(".", 1)[-1].lower() if "." in base else ""
    if ext in _GDAL_EXTS and ext != "json":
        return _GDAL_EXTS[ext]
    # magic probe must see DECOMPRESSED bytes: sniffing the raw gzip
    # header failed inference for valid fc.json.gz inputs (r15 review)
    if first.endswith(".gz"):
        import gzip as _gz

        _open = _gz.open
    else:
        _open = open
    with _open(first, "rb") as fh:
        head = fh.read(64)
    if head[:8] == b"fgb\x03fgb\x01":
        return "fgb"
    if head[:16] == b"SQLite format 3\x00":
        return "gpkg"
    if head[:4] == b"\x00\x00\x27\x0a":  # shapefile file code 9994 BE
        return "shp"
    if head[:4] == b"PK\x03\x04":
        return "xlsx" if ext == "xlsx" else "kmz"
    if head[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        return "xls"  # CFB compound file (legacy BIFF8 Excel)
    text = head.decode("utf-8", errors="replace").lstrip("﻿ \t\r\n").lower()
    if text.startswith("<?xml") or text.startswith("<"):
        with _open(first, "rb") as fh:
            body = fh.read(4096).decode("utf-8", errors="replace").lower()
        if "<kml" in body:
            return "kml"
        if "opendrive" in body:
            return "xodr"
        return "gml"
    if text.startswith("{") or text.startswith("["):
        return "geojson"
    raise ValueError(f"format 'gdal': cannot infer vector format of {first}")


def read_lake(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    filename: bool = False,
    schema: str | None = None,
    zip_path: str | None = None,
    cache=None,
    **options,
) -> DataFrame:
    """Register-and-read a lake table from a file/glob/directory.

    ``fmt``: parquet | csv | json | text | log. CSV dialect options not
    supplied are sniffed from the data. ``filename=True`` appends the
    source-file column (reference option ``filename 'true'``,
    docs/query-data-lake-files.md:86-93). A ``.zip`` path (optionally
    with ``zip_path`` selecting members) is extracted first.
    """
    fmt = fmt.lower()
    if path.startswith(("hf://", "http://", "https://")):
        path = fetch_remote(path, cache=cache)
    # docs/spatial.md: OPTIONS (compression 'zip') marks a zip archive
    # whose name doesn't end in .zip (download endpoints)
    if str(options.get("compression", "")).lower() == "zip":
        options.pop("compression")  # consumed here; gzip/zstd pass through
        if not path.endswith(".zip") and os.path.isfile(path):
            path = _extract_zip_members(path, zip_path)
    if path.endswith(".zip") and os.path.isfile(path):
        path = _extract_zip_members(path, zip_path)
    if fmt == "gdal":
        # docs/spatial.md "the GDAL format will be inferred": pick the
        # concrete vector reader from the file itself
        fmt = _sniff_gdal_format(path)
    # docs/file-formats-reference.md GDAL option `layer`: a named layer
    # within the file — the GeoPackage feature table or xlsx worksheet
    if "layer" in options:
        layer = options.pop("layer")
        if fmt in ("gpkg", "geopackage"):
            options["table"] = layer
        elif fmt in ("xlsx", "xls"):
            options["sheet"] = layer
        else:
            raise ValueError(
                f"option 'layer' is not applicable to format {fmt!r} "
                "(supported: gpkg, xlsx, xls)"
            )

    # Single-file geo/office formats accept globs by fan-out: one
    # driver-side parse per match unioned by name (real-world vector
    # datasets ship as many files). ``filename=True`` stamps the source
    # path per file (input_file_name() is empty for parsed frames).
    _SINGLE_FILE_FMTS = {
        "shp", "shapefile", "gpkg", "geopackage", "kml", "kmz", "gml",
        "dxf", "mif", "mit", "map", "tab", "wasp", "xodr", "fgb", "flatgeobuf",
        "geojson", "geojsons", "geojsonl", "xlsx", "xls",
    }
    if fmt in _SINGLE_FILE_FMTS and any(c in path for c in "*?["):
        matches = sorted(_glob.glob(path))
        if not matches:
            raise FileNotFoundError(path)
        parts = []
        for p in matches:
            part = read_lake(
                spark, p, fmt=fmt, schema=schema, zip_path=zip_path,
                cache=cache, **dict(options)
            )
            if filename:
                part = part.withColumn("filename", F.lit(p))
            parts.append(part)
        out = parts[0]
        for part in parts[1:]:
            out = out.unionByName(part, allowMissingColumns=True)
        return out
    reader = spark.read
    if schema:
        reader = reader.schema(schema)

    if fmt == "parquet":
        df = reader.options(**options).parquet(path)
    elif fmt == "csv":
        # local paths (incl. file:-URIs) sniff via open(); scheme'd
        # urls (s3a/gs/abfs/hdfs/...) sniff one bounded sample through
        # Hadoop's FileSystem — the old forced header=True silently ate
        # the first row of remote headerless files (r15 review). A
        # failed remote sniff keeps that legacy default rather than
        # failing the read.
        local = "://" not in path or path.startswith("file:")
        if local:
            sniffed: dict = sniff_csv_dialect(path)
        else:
            try:
                sniffed = sniff_csv_dialect_remote(spark, path)
            except FileNotFoundError:
                raise
            except Exception:  # noqa: BLE001 — sniffing is best-effort
                sniffed = {"header": True}
        merged = {**sniffed, **options}
        merged.setdefault("inferSchema", schema is None)
        df = reader.options(**{k: str(v) for k, v in merged.items()}).csv(path)
    elif fmt == "json":
        df = reader.options(**options).json(path)
    elif fmt == "text":
        df = reader.options(**options).text(path)
    elif fmt == "log":
        df = read_log(spark, path, log_format=options.pop("log_format", "s3"))
    elif fmt in ("shp", "shapefile"):
        from pg_lake_spark.sources.shapefile import read_shapefile

        path = _gunzipped(path)
        if os.path.isdir(path):  # zip extraction may yield a directory
            shp = next(
                (
                    os.path.join(path, n)
                    for n in sorted(os.listdir(path))
                    if n.lower().endswith(".shp")
                ),
                None,
            )
            if shp is None:
                # a bare StopIteration here was opaque (r15 review)
                raise FileNotFoundError(f"no .shp member under {path}")
            path = shp
        df = read_shapefile(spark, path)
    elif fmt in ("gpkg", "geopackage"):
        from pg_lake_spark.sources.geopackage import read_geopackage

        df = read_geopackage(spark, _gunzipped(path), table=options.pop("table", None))
    elif fmt in ("kml", "kmz"):
        from pg_lake_spark.sources.kml import read_kml

        df = read_kml(spark, _gunzipped(path))
    elif fmt == "gml":
        from pg_lake_spark.sources.gml import read_gml

        df = read_gml(spark, _gunzipped(path))
    elif fmt == "dxf":
        from pg_lake_spark.sources.dxf import read_dxf

        df = read_dxf(spark, _gunzipped(path))
    elif fmt in ("mif", "mit"):
        from pg_lake_spark.sources.mif import read_mif

        df = read_mif(spark, _gunzipped(path))
    elif fmt == "tab":
        from pg_lake_spark.sources.mitab import read_tab

        df = read_tab(spark, _gunzipped(path))
    elif fmt in ("map", "wasp"):
        from pg_lake_spark.sources.wasp import read_wasp_map

        df = read_wasp_map(spark, _gunzipped(path))
    elif fmt == "xodr":
        from pg_lake_spark.sources.xodr import read_xodr

        df = read_xodr(spark, _gunzipped(path))
    elif fmt in ("fgb", "flatgeobuf"):
        from pg_lake_spark.sources.flatgeobuf import read_flatgeobuf

        df = read_flatgeobuf(spark, _gunzipped(path))
    elif fmt in ("geojson", "geojsons", "geojsonl"):
        df = read_geojson(spark, path)
    elif fmt == "xlsx":
        from pg_lake_spark.sources.xlsx import read_xlsx

        df = read_xlsx(
            spark,
            _gunzipped(path),
            sheet=options.pop("sheet", 1),
            header=str(options.pop("header", "true")).lower() != "false",
        )
    elif fmt == "xls":
        from pg_lake_spark.sources.xls import read_xls

        df = read_xls(
            spark,
            _gunzipped(path),
            sheet=options.pop("sheet", 1),
            header=str(options.pop("header", "true")).lower() != "false",
        )
    elif fmt == "iceberg":
        from pg_lake_spark.lakehouse.iceberg_meta import scan_iceberg

        df = scan_iceberg(
            spark,
            path,
            snapshot_id=options.pop("snapshot_id", None),
            as_of_ms=options.pop("as_of_ms", None),
        )
    elif fmt == "delta":
        from pg_lake_spark.lakehouse.delta_meta import scan_delta

        v = options.pop("version", None)
        df = scan_delta(spark, path, version=int(v) if v is not None else None)
    else:
        raise ValueError(f"unsupported lake format: {fmt}")

    if filename:
        # frames built via createDataFrame (the driver-parsed vector/
        # office formats) have no scan below them — input_file_name()
        # is '' for every row, so stamp the resolved path instead
        parsed_frame = fmt in {
            "shp", "shapefile", "gpkg", "geopackage", "kml", "kmz", "gml",
            "dxf", "mif", "mit", "tab", "map", "wasp", "xodr", "fgb",
            "flatgeobuf", "xlsx", "xls",
        }
        df = df.withColumn(
            "filename", F.lit(path) if parsed_frame else F.input_file_name()
        )
    return df


# S3 server-access-log layout (reference read_data.c:1876 GetLogFormatRegex).
_S3_LOG_FIELDS = [
    ("bucket_owner", r"(\S+)"),
    ("bucket", r"(\S+)"),
    ("event_time", r"\[([^\]]+)\]"),
    ("remote_ip", r"(\S+)"),
    ("requester", r"(\S+)"),
    ("request_id", r"(\S+)"),
    ("operation", r"(\S+)"),
    ("key", r"(\S+)"),
    ("request_uri", r'"([^"]*)"'),
    ("http_status", r"(\d+|-)"),
    ("error_code", r"(\S+)"),
    ("bytes_sent", r"(\d+|-)"),
    ("object_size", r"(\d+|-)"),
    ("total_time", r"(\d+|-)"),
    ("turn_around_time", r"(\d+|-)"),
]


def read_log(spark: SparkSession, path: str, log_format: str = "s3") -> DataFrame:
    """Structured scan of text logs via one regexp projection.

    The regex runs JVM-side per line (codegen) — a single map stage at
    any scale, mirroring the reference's `log_format` tables.
    """
    if log_format != "s3":
        raise ValueError(f"unsupported log_format: {log_format}")
    pattern = r"^" + r"\s+".join(p for _, p in _S3_LOG_FIELDS)
    raw = spark.read.text(path)
    cols = [
        F.regexp_extract(F.col("value"), pattern, i + 1).alias(name)
        for i, (name, _) in enumerate(_S3_LOG_FIELDS)
    ]
    df = raw.select(*cols)
    # numeric fields: '-' → NULL, else int (PG-style log typing)
    for c in ("http_status", "bytes_sent", "object_size", "total_time", "turn_around_time"):
        df = df.withColumn(c, F.when(F.col(c).rlike(r"^\d+$"), F.col(c).cast("long")))
    return df


def list_files(spark: SparkSession, pattern: str) -> DataFrame:
    """``lake_file.list()`` equivalent: file names + sizes + mtimes for a
    glob, as a DataFrame. Uses the Hadoop FileSystem API so the same code
    path works for s3a:///hdfs:// URIs on a real cluster."""
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = hpath.getFileSystem(conf)
    statuses = fs.globStatus(hpath)
    rows = []
    if statuses is not None:
        for st in statuses:
            rows.append(
                (
                    st.getPath().toString(),
                    int(st.getLen()),
                    int(st.getModificationTime()) // 1000,
                    bool(st.isDirectory()),
                )
            )
    return spark.createDataFrame(
        rows, "path string, size_bytes bigint, mtime_epoch bigint, is_dir boolean"
    )


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """GeoJSON reader — the GDAL-reader slice feasible without GDAL
    (reference: pg_lake_engine/src/pgduck/gdal.c; docs/file-formats-
    reference.md GDAL section lists GeoJSON first).

    Accepts both newline-delimited GeoJSON (one Feature per line — the
    scale path: per-line parallelism like any NDJSON scan) and classic
    ``FeatureCollection`` documents (parsed per FILE in a distributed
    wholetext read — fine for the many-medium-files layout GDAL data
    ships in). Output schema:

    - ``geometry`` binary — WKB (functions/spatial.py's type; feed any
      st_* accessor or the grid-bucketed bbox join)
    - ``gtype`` string — ST_Point / ST_LineString / ST_Polygon
    - ``properties`` string — the feature's properties as a JSON
      document (schema-free; project with ``get_json_object`` /
      ``from_json``)
    """
    import json as _json

    from pyspark.sql.types import StringType as _Str
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    from pg_lake_spark.functions import spatial as S

    first = _first_regular_file(path)
    # layout sniff must see TEXT: a .gz member decompresses for the
    # peek (Spark's text reads below handle the codec themselves)
    import gzip as _gzip

    _opener = _gzip.open if first.endswith(".gz") else open
    with _opener(first, "rb") as fh:
        # accumulate RAW bytes and decode once: per-chunk decoding
        # turns a multibyte UTF-8 char split across the chunk boundary
        # into U+FFFD, which can fail the first-line JSON parse and
        # misroute a valid NDJSON file. Scanning bytes for b"\n" is
        # safe — 0x0A never occurs inside a UTF-8 multibyte sequence.
        # large single features (big polygon rings) can exceed the
        # sniff window: keep reading until the FIRST LINE is complete —
        # but BOUNDED: a minified multi-GB FeatureCollection has no
        # newline at all, and an unbounded loop buffered the whole file
        # on the driver (r15 review). Past the cap the first "line" is
        # necessarily incomplete JSON, so the decision below correctly
        # routes to the wholetext path.
        cap = 4 * (1 << 20)
        buf = bytearray(fh.read(_SNIFF_BYTES))
        while b"\n" not in buf and len(buf) < cap:
            more = fh.read(_SNIFF_BYTES)
            if not more:
                break
            buf += more
        head = bytes(buf).decode("utf-8", errors="replace")
    # NDJSON iff the first line is a COMPLETE JSON Feature; a pretty-
    # printed FeatureCollection (type on a later line) must take the
    # wholetext path or per-line parsing would silently yield nulls.
    # Decide on the PARSED document's type, not a substring — a feature
    # whose property value mentions "FeatureCollection" is still NDJSON.
    first_line = head.split("\n", 1)[0].strip()
    try:
        import json as _json

        parsed_first = _json.loads(first_line)
        is_collection = (
            isinstance(parsed_first, dict)
            and parsed_first.get("type") == "FeatureCollection"
        ) or isinstance(parsed_first, list)
    except ValueError:
        is_collection = True

    feat_schema = _ST(
        [_SF("__geom_json", _Str()), _SF("properties", _Str())]
    )

    if is_collection:
        raw = spark.read.text(path, wholetext=True)

        def explode_features(batches):
            import pandas as _pd

            for pdf in batches:
                geoms, props = [], []
                for doc in pdf["value"]:
                    parsed = _json.loads(doc)
                    if isinstance(parsed, list):
                        feats = parsed  # bare top-level array of features
                    elif parsed.get("type") == "FeatureCollection":
                        feats = parsed["features"]
                    else:
                        feats = [parsed]
                    for f in feats:
                        geoms.append(_json.dumps(f["geometry"]))
                        props.append(_json.dumps(f.get("properties") or {}))
                yield _pd.DataFrame({"__geom_json": geoms, "properties": props})

        feats = raw.mapInPandas(explode_features, feat_schema)
    else:
        lines = spark.read.text(path).filter(F.trim("value") != "")
        feats = lines.select(
            F.get_json_object("value", "$.geometry").alias("__geom_json"),
            F.coalesce(
                F.get_json_object("value", "$.properties"), F.lit("{}")
            ).alias("properties"),
        )

    g = S.st_geomfromgeojson(F.col("__geom_json"))
    return feats.select(
        g.alias("geometry"),
        S.st_geometrytype(g).alias("gtype"),
        "properties",
    )


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def file_exists(spark: SparkSession, path: str) -> bool:
    """``lake_file.exists`` parity (pg_lake_file_exists) over Hadoop FS
    so s3a:///hdfs:// work identically on a cluster."""
    fs, hpath, _ = _hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def file_size(spark: SparkSession, path: str) -> int:
    """``lake_file.size`` parity (pg_lake_file_size)."""
    fs, hpath, _ = _hadoop_fs(spark, path)
    return int(fs.getFileStatus(hpath).getLen())


def file_preview(spark: SparkSession, path: str, length: int = 8192) -> bytes:
    """First ``length`` bytes of a file (pg_lake_file_preview) — the
    peek-before-you-scan utility the docs use to eyeball lake files."""
    fs, hpath, jvm = _hadoop_fs(spark, path)
    n = min(length, file_size(spark, path))
    stream = fs.open(hpath)
    try:
        # py4j passes byte[] ARGUMENTS by value (a readFully(buf) call
        # can't mutate back), so have the JVM build and RETURN the
        # array — commons-io ships with Spark
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream, n)
    finally:
        stream.close()
    return bytes(data)


def copy_file(spark: SparkSession, src: str, dst: str) -> None:
    """``lake_file.copy`` parity (pg_lake_copy_file)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    s = jvm.org.apache.hadoop.fs.Path(src)
    d = jvm.org.apache.hadoop.fs.Path(dst)
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        s.getFileSystem(conf), s, d.getFileSystem(conf), d, False, conf
    )


def delete_file(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    """``lake_file.delete`` parity (pg_lake_delete_file)."""
    fs, hpath, _ = _hadoop_fs(spark, path)
    return bool(fs.delete(hpath, recursive))
