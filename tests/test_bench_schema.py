"""bench.py output schema: the driver parses ONE JSON line per round; the
record must carry both the device rate and the reference-semantics
loader-inclusive wall rate (VERDICT r4 #8 — pin so a refactor can't drop
the reference metric).  Importing bench must not touch jax/TPU."""

import json

import pytest


def test_train_bench_record_schema():
    import bench

    rec = bench.train_bench_record(
        "512px_train_step_throughput_bs8", 16.0071, 2.76,
        {"dtype": "bfloat16", "wall_img_per_s_loader_inclusive": 16.52,
         "wall_steps": 59},
    )
    assert rec["metric"] == "512px_train_step_throughput_bs8"
    assert rec["value"] == 16.007  # rounded for the one-line print
    assert rec["unit"] == "images/sec/chip"
    assert rec["vs_baseline"] == 2.76
    assert rec["config"]["wall_img_per_s_loader_inclusive"] == 16.52
    json.dumps(rec)  # must be JSON-serializable as-is


def test_train_bench_record_requires_wall_metric():
    import bench

    with pytest.raises(AssertionError, match="wall_img_per_s"):
        bench.train_bench_record("m", 1.0, None, {"dtype": "bfloat16"})
