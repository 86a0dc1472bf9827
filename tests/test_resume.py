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
