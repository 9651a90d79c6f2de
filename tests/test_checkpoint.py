"""Resume-after-kill: identical output + idempotent metrics (FIXTURES.md B3)."""

import pytest

from pii_filter_spark.pipeline import run_pipeline
from pii_filter_spark.sources import table_io
from pii_filter_spark.sources.synth import write_input_table

N = 200
SEED = 13


def _table_fingerprint(spark, path):
    df = table_io.read_table(spark, path)
    rows = df.select(
        "image_id", "scrubbed_caption", "keep", "scrub_count", "part_id"
    ).collect()
    return sorted((r[0], r[1], r[2], r[3], r[4]) for r in rows)


def test_kill_and_resume_identical(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    inp = str(root / "input")
    write_input_table(spark, inp, N, seed=SEED, num_partitions=4)

    # uninterrupted baseline
    ref_out = str(root / "ref")
    run_pipeline(spark, inp, ref_out, num_parts=12, batch_parts=3)
    ref_fp = _table_fingerprint(spark, ref_out)
    ref_manifest = {e["part_id"]: e for e in table_io.read_manifest(ref_out)}

    # killed run: dies after 2 of 4 batches
    out = str(root / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, inp, out, num_parts=12, batch_parts=3, fail_after_batch=2)
    done_before = set(table_io.completed_part_ids(out))
    assert 0 < len(done_before) < 12

    # resume: must only process the missing partitions
    processed = run_pipeline(spark, inp, out, num_parts=12, batch_parts=3)
    assert set(processed) == set(range(12)) - done_before

    assert _table_fingerprint(spark, out) == ref_fp
    manifest = {e["part_id"]: e for e in table_io.read_manifest(out)}
    assert set(manifest) == set(range(12))
    for p, e in manifest.items():
        for key in ("rows_in", "rows_kept", "rows_dropped", "scrub_count",
                    "drop_reason_counts"):
            assert e[key] == ref_manifest[p][key], (p, key)


def test_rerun_on_complete_output_is_noop(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("noop")
    inp = str(root / "input")
    write_input_table(spark, inp, 60, seed=SEED, num_partitions=2)
    out = str(root / "out")
    run_pipeline(spark, inp, out, num_parts=4, batch_parts=2)
    fp1 = _table_fingerprint(spark, out)
    assert run_pipeline(spark, inp, out, num_parts=4, batch_parts=2) == []
    assert _table_fingerprint(spark, out) == fp1
