"""Resume correctness: kill mid-run, resume, final table identical to a
single uninterrupted run (north_rule: resumable from checkpoint with
per-partition lineage + metrics)."""

import pytest

from kr_spark.pipeline.materialize import run_pipeline
from kr_spark.pipeline.transcripts import generate_transcripts

N_CONVS = 40


def test_kill_and_resume_identical(spark, tmp_path):
    transcripts = generate_transcripts(spark, N_CONVS)

    # uninterrupted run
    out_a = str(tmp_path / "a")
    full = run_pipeline(spark, transcripts, out_a, n_buckets=4)

    # killed after 2 of 4 buckets, then resumed
    out_b = str(tmp_path / "b")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, transcripts, out_b, n_buckets=4, fail_after=2)
    resumed = run_pipeline(spark, transcripts, out_b, n_buckets=4)

    cols = ["s", "p", "o", "conv_id", "turn_idx"]
    a = full.select(*cols)
    b = resumed.select(*cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty()
    assert b.exceptAll(a).isEmpty()


def test_resume_with_stale_n_buckets_arg(spark, tmp_path):
    # A snapshot written with 4 buckets, resumed with n_buckets=2: the
    # snapshot's recorded bucketing must win, or rows in buckets 2-3 would
    # silently never be extracted (ADVICE r1 medium).
    transcripts = generate_transcripts(spark, N_CONVS)
    out_a = str(tmp_path / "full")
    full = run_pipeline(spark, transcripts, out_a, n_buckets=4)

    out_b = str(tmp_path / "killed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, transcripts, out_b, n_buckets=4, fail_after=2)
    resumed = run_pipeline(spark, transcripts, out_b, n_buckets=2)  # stale arg

    cols = ["s", "p", "o", "conv_id", "turn_idx"]
    a, b = full.select(*cols), resumed.select(*cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_snapshot_n_buckets_sidecar(spark, tmp_path):
    from kr_spark.pipeline.materialize import ingest_transcripts, snapshot_n_buckets

    out = str(tmp_path / "snap")
    assert snapshot_n_buckets(out) is None
    ingest_transcripts(spark, generate_transcripts(spark, 8), out, n_buckets=4)
    assert snapshot_n_buckets(out) == 4


def test_no_snapshot_pipeline_and_resume(spark, tmp_path):
    # snapshot_input=False: the input (already a durable table) is bucketed
    # virtually; output matches the snapshotting path bit-for-bit, resume
    # skips completed buckets, and the pinned n_buckets sidecar wins over a
    # different resume value
    from kr_spark.pipeline.materialize import (
        completed_buckets,
        run_pipeline,
    )
    from kr_spark.pipeline.transcripts import generate_transcripts

    inp = str(tmp_path / "transcripts")
    generate_transcripts(spark, 400).write.parquet(inp)
    durable = spark.read.parquet(inp)

    out_a = str(tmp_path / "with_snap")
    out_b = str(tmp_path / "no_snap")
    ta = run_pipeline(spark, durable, out_a, n_buckets=4)
    tb = run_pipeline(spark, durable, out_b, n_buckets=4, snapshot_input=False)
    rows_a = sorted(map(tuple, ta.select("s", "p", "o").collect()))
    rows_b = sorted(map(tuple, tb.select("s", "p", "o").collect()))
    assert rows_a == rows_b and len(rows_b) > 0

    # resume: all 4 buckets committed, a re-run skips them and reproduces
    done = completed_buckets(out_b)
    assert done == {0, 1, 2, 3}
    tb2 = run_pipeline(
        spark, durable, out_b, n_buckets=99, snapshot_input=False
    )  # wrong resume count: the sidecar (4) must win
    rows_b2 = sorted(map(tuple, tb2.select("s", "p", "o").collect()))
    assert rows_b2 == rows_b
    assert completed_buckets(out_b) == {0, 1, 2, 3}


def test_resume_mode_mismatch_raises(spark, tmp_path):
    # ADVICE r3 (medium): an out_dir started in one input mode (snapshot vs
    # --no-snapshot) must refuse to resume in the other — each mode pins
    # n_buckets in a different place, and crossing them could silently
    # re-bucket against already-committed extract manifests.
    transcripts = generate_transcripts(spark, 16)

    out_a = str(tmp_path / "snap_first")
    run_pipeline(spark, transcripts, out_a, n_buckets=4)
    with pytest.raises(ValueError, match="snapshot-input mode"):
        run_pipeline(spark, transcripts, out_a, n_buckets=4, snapshot_input=False)

    out_b = str(tmp_path / "virtual_first")
    run_pipeline(spark, transcripts, out_b, n_buckets=4, snapshot_input=False)
    with pytest.raises(ValueError, match="virtual-input mode"):
        run_pipeline(spark, transcripts, out_b, n_buckets=4)
