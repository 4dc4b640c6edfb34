"""Layout clustering (operators/compact.py::cluster_partitions).

The operator's whole purpose is parquet statistics quality: after
clustering on a column, each output file's (min, max) range for that
column must be tight and near-disjoint so range predicates skip files.
These tests verify that directly from the parquet footers via pyarrow —
the same statistics a 100 TB scan's row-group pruning reads.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq

from data_ingestion_lambda_spark import cli
from data_ingestion_lambda_spark.operators.compact import cluster_partitions

DATE = "2025-05-01"


def _make_messy_partition(spark, target: str, n_rows: int = 20_000, n_files: int = 8):
    """Shuffled client_id values striped across many files: every file's
    (min, max) range spans nearly the whole domain — worst case for
    pruning."""
    df = (
        spark.range(n_rows)
        .selectExpr(
            "CAST(date'2025-05-01' AS date) AS date",
            # decorrelate value order from row order so every file gets
            # the full spread
            "pmod(id * 7919, 20000) AS client_num",
            "CAST(pmod(id * 7919, 20000) AS string) AS payload",
        )
        .repartition(n_files)
    )
    df.write.partitionBy("date").mode("overwrite").parquet(target)


def _file_ranges(target: str, col: str) -> list[tuple[int, int]]:
    ranges = []
    for f in sorted(glob.glob(os.path.join(target, f"date={DATE}", "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        assert mins, f"no statistics for {col} in {f}"
        ranges.append((min(mins), max(maxs)))
    return ranges


def _overlap_fraction(ranges: list[tuple[int, int]]) -> float:
    """Mean fraction of the global domain each file's range covers —
    ~1.0 when every file spans everything, ~1/n_files when disjoint."""
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    return sum((b - a) / (hi - lo) for a, b in ranges) / len(ranges)


def test_clustering_tightens_file_ranges_and_preserves_rows(spark, tmp_path):
    target = str(tmp_path / "tbl")
    _make_messy_partition(spark, target)
    before = spark.read.parquet(target)
    before_rows = sorted(
        (r.client_num, r.payload) for r in before.select("client_num", "payload").collect()
    )
    messy = _file_ranges(target, "client_num")
    assert len(messy) > 1 and _overlap_fraction(messy) > 0.9, (
        "precondition: the unclustered layout must be unprunable"
    )

    # tiny target size forces a multi-file clustered layout
    result = cluster_partitions(
        spark, target, sort_cols=["client_num"], target_file_bytes=32 << 10
    )
    assert result[DATE] >= 4

    clustered = _file_ranges(target, "client_num")
    frac = _overlap_fraction(clustered)
    assert frac < 0.35, f"clustered files still cover {frac:.0%} of the domain each"
    # ranges are near-disjoint: sorted by min, each file starts at or after
    # the previous file's max (range partitioning puts a key in one file)
    ordered = sorted(clustered)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ordered, ordered[1:]):
        assert b_lo >= a_hi, "range-partitioned files must not interleave"
    # rows are preserved exactly (reorder, never rewrite)
    after = spark.read.parquet(target)
    after_rows = sorted(
        (r.client_num, r.payload) for r in after.select("client_num", "payload").collect()
    )
    assert after_rows == before_rows


def test_cli_compact_sort_by_routes_to_clustering(spark, tmp_path, capsys):
    target = str(tmp_path / "tbl")
    _make_messy_partition(spark, target, n_rows=2_000, n_files=4)
    rc = cli.main(
        ["compact", "--target", target, "--sort-by", "client_num", "--target-file-mb", "1"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["statusCode"] == 200 and DATE in out["clustered"]


def _make_messy_2d_partition(spark, target: str, n_rows: int = 20_000, n_files: int = 8):
    """Two DECORRELATED dimensions (different prime strides), shuffled
    across files: no layout exists yet, and sorting on either column
    alone cannot tighten the other."""
    df = (
        spark.range(n_rows)
        .selectExpr(
            "CAST(date'2025-05-01' AS date) AS date",
            "pmod(id * 7919, 20000) AS xdim",
            "pmod(id * 104729, 20000) AS ydim",
            "CAST(id AS string) AS payload",
        )
        .repartition(n_files)
    )
    df.write.partitionBy("date").mode("overwrite").parquet(target)


def test_zorder_bounds_every_clustered_column(spark, tmp_path):
    """Z-ordering must bound per-file ranges on BOTH columns, where
    lexicographic clustering on (xdim, ydim) bounds only xdim — the
    exact property the Morton interleave exists to buy. Rows preserved
    exactly (reorder, never rewrite)."""
    lex_target = str(tmp_path / "lex")
    z_target = str(tmp_path / "zorder")
    _make_messy_2d_partition(spark, lex_target)
    _make_messy_2d_partition(spark, z_target)
    before = sorted(
        (r.xdim, r.ydim, r.payload)
        for r in spark.read.parquet(z_target).select("xdim", "ydim", "payload").collect()
    )

    cluster_partitions(
        spark, lex_target, sort_cols=["xdim", "ydim"], target_file_bytes=32 << 10
    )
    result = cluster_partitions(
        spark,
        z_target,
        sort_cols=["xdim", "ydim"],
        target_file_bytes=32 << 10,
        zorder=True,
    )
    assert result[DATE] >= 4

    # lexicographic: leading column tight, second column unbounded
    lex_x = _overlap_fraction(_file_ranges(lex_target, "xdim"))
    lex_y = _overlap_fraction(_file_ranges(lex_target, "ydim"))
    assert lex_x < 0.35
    assert lex_y > 0.8, "precondition: lex sort must NOT bound the second column"

    # z-order: BOTH columns bounded well below the full domain
    z_x = _overlap_fraction(_file_ranges(z_target, "xdim"))
    z_y = _overlap_fraction(_file_ranges(z_target, "ydim"))
    assert z_x < 0.7 and z_y < 0.7, (
        f"z-ordered files must bound both dims: x={z_x:.0%} y={z_y:.0%}"
    )
    # and the layout must actually beat lex on the neglected dimension
    assert z_y < lex_y / 2

    after = sorted(
        (r.xdim, r.ydim, r.payload)
        for r in spark.read.parquet(z_target).select("xdim", "ydim", "payload").collect()
    )
    assert after == before


def test_cli_compact_zorder_routes_to_morton_clustering(spark, tmp_path, capsys):
    target = str(tmp_path / "tbl")
    _make_messy_2d_partition(spark, target, n_rows=2_000, n_files=4)
    rc = cli.main(
        [
            "compact",
            "--target",
            target,
            "--sort-by",
            "xdim,ydim",
            "--zorder",
            "--target-file-mb",
            "1",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["statusCode"] == 200 and DATE in out["clustered"]
