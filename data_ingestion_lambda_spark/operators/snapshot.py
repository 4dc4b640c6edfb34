"""Table snapshots: versioned, immutable views of the upsert target.

Training-data reproducibility ("exactly which rows trained model X") needs
the table AS OF a version, but the staged-swap MERGE
(operators/upsert.py::replace_partitions) rewrites whole date partitions
in place. A snapshot freezes the current table state under
``<target>/.snapshots/v<N>/`` — dot-prefixed, so live readers never see
it — with a JSON manifest of every data file and its size.

Mechanism: hardlinks (os.link) when source and snapshot share a local
filesystem — freezing a multi-TB table costs directory entries, not
bytes, because the swap DELETES old partition dirs rather than truncating
files, so a hardlinked snapshot keeps the old blocks alive. Falls back to
copy when linking fails (cross-device). On an object store the same
design is manifest-only: objects are immutable, so recording their keys
IS the snapshot (this module's manifest format is exactly that list);
the hardlink step is the local-filesystem materialization of it.

Reference parity: the reference keeps no history at all (its MERGE
overwrites, src/db_operations.py:56-106); this is a §2.11 north-star
extension.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SNAP_ROOT = ".snapshots"
_MANIFEST = "manifest.json"


def _snap_root(target_dir: str) -> str:
    return os.path.join(target_dir, _SNAP_ROOT)


def _data_files(target_dir: str) -> list[str]:
    """Relative paths of every visible data file (hidden dirs skipped)."""
    out = []
    for root, dirs, files in os.walk(target_dir):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.startswith((".", "_")):
                continue
            out.append(os.path.relpath(os.path.join(root, f), target_dir))
    return sorted(out)


def list_snapshots(target_dir: str) -> list[dict]:
    root = _snap_root(target_dir)
    if not os.path.isdir(root):
        return []
    snaps = []
    for name in sorted(os.listdir(root)):
        mf = os.path.join(root, name, _MANIFEST)
        if name.startswith("v") and os.path.isfile(mf):
            with open(mf) as fh:
                snaps.append(json.load(fh))
    return sorted(snaps, key=lambda s: s["version"])


def snapshot_table(target_dir: str, note: str = "") -> int:
    """Freeze the current table state as the next version; returns it.

    Write order is crash-safe: data files land first, the manifest last —
    a half-written snapshot has no manifest and is invisible to
    list/read/expire."""
    existing = list_snapshots(target_dir)
    version = (existing[-1]["version"] + 1) if existing else 1
    files = _data_files(target_dir)
    snap_dir = os.path.join(_snap_root(target_dir), f"v{version}")
    sizes = {}
    for rel in files:
        src = os.path.join(target_dir, rel)
        dst = os.path.join(snap_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)  # cross-device fallback
        sizes[rel] = os.path.getsize(src)
    manifest = {
        "version": version,
        "created_at": time.time(),
        "note": note,
        "n_files": len(files),
        "total_bytes": sum(sizes.values()),
        "files": sizes,
    }
    os.makedirs(snap_dir, exist_ok=True)
    tmp = os.path.join(snap_dir, f".{_MANIFEST}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(snap_dir, _MANIFEST))
    return version


def read_snapshot(spark: SparkSession, target_dir: str, version: int) -> DataFrame:
    """The table AS OF ``version`` — partition discovery works unchanged
    because the snapshot preserves the date=... layout."""
    snap_dir = os.path.join(_snap_root(target_dir), f"v{version}")
    if not os.path.isfile(os.path.join(snap_dir, _MANIFEST)):
        raise FileNotFoundError(f"no snapshot v{version} under {target_dir}")
    return spark.read.parquet(snap_dir)


def expire_snapshots(target_dir: str, keep_last: int) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots; returns dropped
    versions. Hardlinked blocks are freed only when the last reference
    (live table or newer snapshot) also drops them."""
    snaps = list_snapshots(target_dir)
    dropped = []
    for s in snaps[: max(0, len(snaps) - keep_last)]:
        shutil.rmtree(os.path.join(_snap_root(target_dir), f"v{s['version']}"))
        dropped.append(s["version"])
    return dropped


def diff_snapshots(
    spark: SparkSession,
    target_dir: str,
    version_a: int,
    version_b: int,
    keys: list[str],
) -> DataFrame:
    """Keyed diff between two table versions: one row per key present in
    either snapshot, labeled ``added`` (only in b), ``removed`` (only in
    a), ``changed`` (both, any non-key column differs) or ``unchanged``.
    The audit answer to "what did the last N ingests do to the table" —
    the consumer of the snapshot lane's time travel, and the check a
    pipeline owner runs before expiring old versions.

    Non-key comparison hashes the full remaining row on EACH side before
    the join, so the join carries keys + one digest per side — never the
    payload; change detection is digest inequality. Each column is
    md5-hashed INDEPENDENTLY (NULL → a fixed-width non-hex sentinel that
    no md5 can produce) and the fixed-width digests concatenated, so a
    NULL is never confused with any literal value and no separator
    character in the data can shift field boundaries. Plan: two snapshot
    scans, one full-outer equi-join on the keys."""
    a = read_snapshot(spark, target_dir, version_a)
    b = read_snapshot(spark, target_dir, version_b)
    _NULL_DIGEST = "-" * 32  # fixed-width, not hex: unreachable by md5

    def digested(df: DataFrame, side: str) -> DataFrame:
        cols = [c for c in df.columns if c not in keys]
        per_col = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit(_NULL_DIGEST))
            for c in sorted(cols)
        ]
        digest = F.md5(F.concat(*per_col)) if per_col else F.lit(_NULL_DIGEST)
        return df.select(*keys, digest.alias(f"_digest_{side}"))

    j = digested(a, "a").join(digested(b, "b"), keys, "full_outer")
    status = (
        F.when(F.col("_digest_a").isNull(), "added")
        .when(F.col("_digest_b").isNull(), "removed")
        .when(F.col("_digest_a") != F.col("_digest_b"), "changed")
        .otherwise("unchanged")
    )
    return j.select(*keys, status.alias("status"))
