"""Filesystem IO for the Python DataSources — the piece that lets the
XML and Avro readers run against the reference's own object-store
layout (the reference is an S3 pipeline: one ``get_object`` per file,
src/s3_processor.py:87) instead of refusing every scheme'd path.

Why pyarrow.fs and not the JVM Hadoop FS API the repo already wraps
(``operators/upsert.py::_hadoop_fs``): a Python DataSource's
``read(partition)`` executes in an EXECUTOR-SIDE Python worker, which
has no py4j gateway — the JVM route only exists on the driver. pyarrow
ships C++-native filesystems (local, s3, gcs, hdfs-via-libhdfs) that
work identically in driver and executor processes, so one code path
serves both ``partitions()`` (driver listing) and ``read()`` (executor
byte fetch). The Hadoop-route alternative (driver pre-reads bytes into
the InputPartition) would ship file payloads through the task
serializer — wrong at any scale.

Routing rule:
- plain OS path (no ``scheme://``) → ``glob``/``open`` — the zero-
  dependency fast path, unchanged semantics for every existing caller;
- any ``scheme://`` URI → ``pyarrow.fs.FileSystem.from_uri``.
  ``file://`` resolves to pyarrow's LocalFileSystem (giving tests a
  real end-to-end scheme'd route with no network), ``s3a://`` is
  normalized to pyarrow's ``s3://`` (same store, Hadoop's spelling),
  and unsupported schemes fail LOUDLY naming the JVM-side package that
  does speak them.

Listing semantics mirror the local fast path: a directory lists its
``*.<ext>`` children (non-recursive), an exact file is itself, and a
basename glob (``s3a://bucket/drop/part-*.avro``) fnmatches within the
parent directory — the S3 "prefix listing" shape. Returned entries are
fully-qualified URIs in the CALLER'S scheme spelling so an executor can
re-resolve them without extra context.
"""

from __future__ import annotations

import fnmatch as _fnmatch
import glob as _glob
import os
import posixpath
from urllib.parse import urlparse


def is_remote(path: str) -> bool:
    """True for any ``scheme://`` URI (including file://) — these route
    through pyarrow.fs; everything else is a plain OS path."""
    return "://" in path


# Schemes routed to pyarrow.fs. This is an explicit ALLOWLIST, not a
# try-and-see: pyarrow's from_uri can hard-abort the whole process on
# a misconfigured store of an unlisted scheme (observed with azure),
# and a C++ abort is not a quarantine-able failure.
_ARROW_SCHEMES = frozenset(
    {"file", "s3", "s3a", "gs", "gcs", "hdfs", "viewfs", "mock"}
)


def _arrow_resolve(uri: str):
    """(filesystem, path-within-fs, scheme, netloc) via pyarrow, with
    the s3a→s3 normalization and a loud error for unsupported schemes.
    ``netloc`` is the URI authority (HDFS namenode host:port; empty for
    file://; folded into the inner path for bucket stores) — it must
    survive re-qualification so an executor can re-resolve listed
    entries without driver context."""
    from pyarrow import fs as pafs

    scheme = uri.split("://", 1)[0]
    if scheme not in _ARROW_SCHEMES:
        raise ValueError(
            f"fsio: cannot resolve a filesystem for {uri!r} — scheme "
            f"{scheme!r} is not routed here (supported: plain paths, "
            f"{', '.join(sorted(_ARROW_SCHEMES))}). For other stores use "
            "the JVM-side Spark source for this format."
        )
    resolve_uri = "s3://" + uri.split("://", 1)[1] if scheme == "s3a" else uri
    try:
        filesystem, inner = pafs.FileSystem.from_uri(resolve_uri)
    except Exception as exc:
        raise ValueError(
            f"fsio: cannot resolve a filesystem for {uri!r} ({exc}); "
            "supported here: plain paths, file://, s3://, s3a://, gs://, "
            "hdfs:// (needs libhdfs). For other stores use the JVM-side "
            "Spark source for this format."
        ) from exc
    return filesystem, inner, scheme, urlparse(uri).netloc


def _requalify(scheme: str, netloc: str, inner_path: str) -> str:
    """Rebuild a caller-scheme URI from a pyarrow-internal path."""
    if scheme in ("s3", "s3a", "gs", "gcs"):
        # bucket stores: pyarrow folds the bucket into the path
        return f"{scheme}://{inner_path.lstrip('/')}"
    sep = inner_path if inner_path.startswith("/") else "/" + inner_path
    return f"{scheme}://{netloc}{sep}"


def list_files(path: str, ext: str) -> list[str]:
    """Sorted file list for ``path``: a directory (its ``*.{ext}``
    children), an exact file, or a basename glob. Plain paths use the
    OS; scheme'd URIs use pyarrow.fs. Raises (naming the path) when
    nothing matches — an empty source is a layout bug, not an empty
    DataFrame."""
    if not is_remote(path):
        pattern = (
            os.path.join(path, f"*.{ext}") if os.path.isdir(path) else path
        )
        files = sorted(_glob.glob(pattern))
        if not files:
            raise ValueError(f"fsio: no files match {pattern}")
        return files

    from pyarrow import fs as pafs

    # Basename globs are detected BEFORE resolution: glob characters
    # (notably '[') are not legal URI characters and break from_uri, so
    # the parent directory is resolved and the basename fnmatched.
    base = posixpath.basename(path.split("://", 1)[1])
    if any(c in base for c in "*?["):
        filesystem, parent, scheme, netloc = _arrow_resolve(path.rsplit("/", 1)[0])
        selector = pafs.FileSelector(parent, recursive=False)
        names = [
            f.path
            for f in filesystem.get_file_info(selector)
            if f.type == pafs.FileType.File
            and _fnmatch.fnmatch(posixpath.basename(f.path), base)
        ]
    else:
        filesystem, inner, scheme, netloc = _arrow_resolve(path)
        info = filesystem.get_file_info(inner)
        if info.type == pafs.FileType.Directory:
            selector = pafs.FileSelector(inner, recursive=False)
            names = [
                f.path
                for f in filesystem.get_file_info(selector)
                if f.type == pafs.FileType.File and f.path.endswith(f".{ext}")
            ]
        elif info.type == pafs.FileType.File:
            names = [inner]
        else:
            names = []
    if not names:
        raise ValueError(f"fsio: no files match {path}")
    return sorted(_requalify(scheme, netloc, n) for n in names)


def read_bytes(path: str) -> bytes:
    """Whole-file bytes — ``open`` for plain paths, pyarrow.fs for
    scheme'd URIs. Both XML documents and Avro OCF files are parsed
    from one in-memory buffer per file (the sources' documented
    many-small-files layout), so whole-file is the right granularity."""
    if not is_remote(path):
        with open(path, "rb") as fh:
            return fh.read()
    filesystem, inner, _scheme, _netloc = _arrow_resolve(path)
    with filesystem.open_input_file(inner) as fh:
        return fh.read()
