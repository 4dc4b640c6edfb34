"""Auto-compaction policy (VERDICT r11 #2): every maintained store HAS
a fold (compact_* / --compact-keep-from); ``auto_keep_from`` +
``--auto-compact-max-dirs`` decide WHEN — a dir-count threshold with
fold-to-half hysteresis, so a long-running ingest loop holds a bounded
partition count with no human picking keep_from.

Pinned here:
- N applies below the threshold trigger NO fold; crossing it triggers
  exactly ONE fold (hysteresis: the next applies stay below threshold);
- read-equality across the fold, horizon/replay refusals unchanged;
- the committed-front cap: a streamed store's auto-fold never chooses
  a keep_from past the checkpoint's commits log;
- the CLI flag drives the same policy end-to-end on a store.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.base_fold import (
    auto_keep_from,
    check_not_below_horizon,
    streaming_committed_front_key,
)
from data_ingestion_lambda_spark.operators.vocab import (
    compact_vocab,
    read_vocab,
    update_vocab,
)


def _docs(spark, day: int):
    return spark.createDataFrame(
        [(day * 10 + i, f"alpha beta tok{day}") for i in range(2)],
        "doc_id bigint, text string",
    )


def _dirs(vdir: str) -> list[str]:
    return sorted(
        n for n in os.listdir(vdir) if n.startswith("date=") and "." not in n[:1]
    )


def _model(spark, vdir):
    return sorted(tuple(r) for r in read_vocab(spark, vdir).collect())


def test_threshold_fires_exactly_one_fold_with_read_equality(spark, tmp_path):
    vdir = str(tmp_path / "vocab")
    folds = []
    for day in range(1, 8):  # 7 applies, threshold 5
        update_vocab(spark, vdir, _docs(spark, day), f"2025-07-0{day}")
        kf = auto_keep_from(spark, vdir, max_dirs=5)
        if kf is not None:
            before = _model(spark, vdir)
            folds.append((day, kf, compact_vocab(spark, vdir, kf)))
            assert _model(spark, vdir) == before  # read-equality across fold
    # 5 dirs after day 5 -> no fold; day 6 crosses (6 > 5) -> fold down to
    # newest max_dirs//2 = 2; day 7 lands beside them (3 live) -> no fold
    assert [f[0] for f in folds] == [6]
    assert folds[0][1] == "2025-07-05"  # keep the newest 2 of 6
    assert _dirs(vdir) == [
        "date=0000-00-00",
        "date=2025-07-05",
        "date=2025-07-06",
        "date=2025-07-07",
    ]
    # replay/horizon refusals unchanged: a folded key is spent
    with pytest.raises(ValueError, match="below the compaction horizon"):
        check_not_below_horizon(spark, vdir, "2025-07-03", "test")
    with pytest.raises(ValueError, match="below the compaction horizon"):
        update_vocab(spark, vdir, _docs(spark, 3), "2025-07-03")


def test_no_fold_below_threshold_and_single_dir_never_folds(spark, tmp_path):
    vdir = str(tmp_path / "vocab")
    update_vocab(spark, vdir, _docs(spark, 1), "2025-07-01")
    assert auto_keep_from(spark, vdir, max_dirs=5) is None
    assert auto_keep_from(spark, vdir, max_dirs=1) is None  # keep_from==oldest: no-op fold skipped
    assert auto_keep_from(spark, str(tmp_path / "absent"), max_dirs=1) is None


def test_committed_front_caps_the_fold_key(spark, tmp_path):
    """b-keyed ledger with 6 landed batches but only 2 committed: the
    cap pulls keep_from back to b2 (fold ids 0-1 only), so a replayable
    batch is never folded and the land-refusal can never wedge the
    stream (ADVICE r11)."""
    vdir = str(tmp_path / "vocab")
    ckpt = tmp_path / "ckpt" / "commits"
    ckpt.mkdir(parents=True)
    for b in range(2):
        (ckpt / str(b)).write_text("{}")
    for b in range(6):
        update_vocab(spark, vdir, _docs(spark, b), f"b{b:09d}")

    cap = streaming_committed_front_key(spark, str(tmp_path / "ckpt"))
    assert cap == "b000000002"
    kf = auto_keep_from(spark, vdir, max_dirs=3, cap=cap)
    assert kf == "b000000002"  # uncapped policy would pick b000000005
    before = _model(spark, vdir)
    compact_vocab(spark, vdir, kf)
    assert _model(spark, vdir) == before
    assert _dirs(vdir) == [
        "date=0000-00-00",
        "date=b000000002",
        "date=b000000003",
        "date=b000000004",
        "date=b000000005",
    ]
    # no commits at all -> no safe front
    assert streaming_committed_front_key(spark, str(tmp_path / "no_ckpt")) is None


def test_streaming_front_holds_bounded_dir_count(spark, tmp_path):
    """The policy as the streaming front's epilogue: a vocab stream
    drained trigger-by-trigger with auto_compact_max_dirs holds a
    bounded live dir count across runs, the fold key stays at or below
    the checkpoint's committed front, the streamed model equals the
    one-shot model, and a replay-from-checkpoint run is a no-op."""
    from data_ingestion_lambda_spark.operators.vocab import read_vocab
    from data_ingestion_lambda_spark.streaming.index_streams import (
        run_vocab_update_available_now,
    )

    src, ckpt, vdir = (str(tmp_path / d) for d in ("src", "ckpt", "vocab"))
    # one part-file per drop: maxFilesPerTrigger=1 counts FILES, so a
    # multi-part drop would shift the batch ids with worker parallelism
    for b in range(6):
        _docs(spark, b).coalesce(1).write.parquet(f"{src}/drop{b}.parquet")

    reports = run_vocab_update_available_now(
        spark, src, vdir, ckpt, max_files_per_trigger=1, auto_compact_max_dirs=3
    )
    policy = reports[-1]["auto_compact"]
    assert policy["due"] is True
    # committed front after the drain is b5; keep_from folds to the
    # newest max_dirs//2 = 1 dir and never exceeds the front
    assert policy["keep_from"] == "b000000005"
    assert _dirs(vdir) == ["date=0000-00-00", "date=b000000005"]

    # model equality: streamed+folded == one-shot over all six batches
    want = {}
    for b in range(6):
        for r in _docs(spark, b).collect():
            for tok in r.text.split():
                want[tok] = want.get(tok, 0) + 1
    got = dict(_model(spark, vdir))
    assert got == want

    # replay run: nothing new -> no lands, policy below threshold
    again = run_vocab_update_available_now(
        spark, src, vdir, ckpt, auto_compact_max_dirs=3
    )
    assert [r for r in again if "auto_compact" not in r] == []
    assert again[-1]["auto_compact"]["due"] is False
    assert _dirs(vdir) == ["date=0000-00-00", "date=b000000005"]

    # a later drop lands beside the base under its own key
    _docs(spark, 9).coalesce(1).write.parquet(f"{src}/drop9.parquet")
    more = run_vocab_update_available_now(
        spark, src, vdir, ckpt, auto_compact_max_dirs=3
    )
    assert any("auto_compact" not in r for r in more)
    assert len(_dirs(vdir)) == 3


def test_attribution_front_auto_compact_nondefault_layout(spark, tmp_path):
    """The policy on the most complex store layout: two sub-tables
    (stream_purchases/stream_clicks), ingest_batch part key and the
    non-default '0000-base' reserved key — both sub-tables fold at the
    crossing and the attribution read is unchanged."""
    import datetime as dt

    from data_ingestion_lambda_spark.operators.attribution_store import (
        read_attribution_stream,
    )
    from data_ingestion_lambda_spark.streaming.index_streams import (
        run_attribution_update_available_now,
    )

    src, ckpt, idx = (str(tmp_path / d) for d in ("src", "ckpt", "idx"))
    for d in range(6):
        day = dt.datetime(2025, 6, 1 + d)
        spark.createDataFrame(
            [
                (d * 10 + 1, 1, day.replace(hour=9), "click", 0.0),
                (d * 10 + 2, 1, day.replace(hour=10), "purchase", 5.0),
            ],
            "event_id bigint, user_id bigint, ts timestamp, "
            "event_type string, value double",
        ).coalesce(1).write.parquet(f"{src}/d{d}.parquet")

    reports = run_attribution_update_available_now(
        spark, src, idx, ckpt, max_files_per_trigger=1, auto_compact_max_dirs=3
    )
    policy = reports[-1]
    assert policy["auto_compact"]["due"] is True
    assert policy["auto_compact"]["keep_from"] == "b000000005"
    assert policy["auto_compact"]["compaction"]["folded"] == {
        "stream_purchases": 5,
        "stream_clicks": 5,
    }
    assert sorted(os.listdir(f"{idx}/stream_purchases")) == [
        "ingest_batch=0000-base",
        "ingest_batch=b000000005",
    ]
    attr = read_attribution_stream(spark, idx)
    assert attr.count() == 6
    assert attr.filter("attributed").count() == 6


def test_cli_auto_compact_end_to_end(spark, tmp_path, capsys):
    """--auto-compact-max-dirs on the vocab CLI: applies below the
    threshold report due=False; the crossing apply folds once; model
    reads are unchanged."""
    from data_ingestion_lambda_spark.cli import main

    vdir = str(tmp_path / "vocab")
    reports = []
    for day in range(1, 5):  # threshold 2: days 1-2 no fold, 3 folds, 4 no fold
        bp = str(tmp_path / f"b{day}.parquet")
        _docs(spark, day).write.parquet(bp)
        assert (
            main(
                [
                    "vocab",
                    "--vocab",
                    vdir,
                    "--batch",
                    bp,
                    "--date",
                    f"2025-07-0{day}",
                    "--auto-compact-max-dirs",
                    "2",
                ]
            )
            == 0
        )
        reports.append(json.loads(capsys.readouterr().out.strip().splitlines()[-1]))
    assert [r["auto_compact"]["due"] for r in reports] == [
        False,
        False,
        True,
        False,
    ]
    assert reports[2]["auto_compact"]["keep_from"] == "2025-07-03"
    # the auto fold's result nests INSIDE the policy dict, leaving the
    # top-level "compaction" key to the manual --compact-keep-from fold
    # (ADVICE r12: the two must never clobber each other)
    assert reports[2]["auto_compact"]["compaction"]["folded"][""] == 2
    assert "compaction" not in reports[2]
    assert _dirs(vdir) == [
        "date=0000-00-00",
        "date=2025-07-03",
        "date=2025-07-04",
    ]
    got = dict(_model(spark, vdir))
    assert got["alpha"] == 8  # 4 days x 2 docs, nothing lost or doubled


def test_cli_manual_and_auto_compact_reports_both(spark, tmp_path, capsys):
    """--compact-keep-from and --auto-compact-max-dirs in ONE invocation
    (ADVICE r12): the manual fold's result stays at report["compaction"]
    and the auto step's (if due) nests under report["auto_compact"] —
    neither clobbers the other."""
    from data_ingestion_lambda_spark.cli import main

    vdir = str(tmp_path / "vocab")
    for day in range(1, 6):
        bp = str(tmp_path / f"b{day}.parquet")
        _docs(spark, day).write.parquet(bp)
        assert main(
            ["vocab", "--vocab", vdir, "--batch", bp, "--date", f"2025-07-0{day}"]
        ) == 0
        capsys.readouterr()
    # manual fold to 07-02 leaves base + 4 live dirs (> max_dirs=3), so
    # the auto step in the SAME invocation is due and folds further
    assert main(
        [
            "vocab", "--vocab", vdir,
            "--compact-keep-from", "2025-07-02",
            "--auto-compact-max-dirs", "3",
        ]
    ) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["compaction"]["horizon"] == "2025-07-02"  # the MANUAL fold
    auto = report["auto_compact"]
    assert auto["due"] is True
    assert auto["compaction"]["horizon"] == auto["keep_from"] == "2025-07-05"
    assert _dirs(vdir) == ["date=0000-00-00", "date=2025-07-05"]
    got = dict(_model(spark, vdir))
    assert got["alpha"] == 10  # 5 days x 2 docs survive both folds
