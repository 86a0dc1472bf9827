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
