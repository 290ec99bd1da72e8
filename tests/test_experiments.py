"""Experiment harness smoke tests: CSV schema + CLI drivers."""

import os

import numpy as np

from rollout_bo_tpu.utils import logging as log
from rollout_bo_tpu.utils import metrics


def test_csv_schema_roundtrip(tmp_path):
    p = str(tmp_path / "ei_gaps")
    log.create_csv(p, 5)
    log.write_to_csv(p, np.arange(5, dtype=float))
    log.write_to_csv(p, np.arange(5, dtype=float) * 2)
    with open(p + ".csv") as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0] == "trial,1,2,3,4,5"
    assert lines[1].startswith("-1")
    rows = log.read_rows(p)
    assert rows.shape == (2, 5)
    np.testing.assert_allclose(rows[1], [0, 2, 4, 6, 8])


def test_metadata(tmp_path):
    d = str(tmp_path / "exp")
    log.write_metadata(d, budget=15, number_of_trials=30, horizon=3)
    text = open(os.path.join(d, "metadata.txt")).read()
    assert "Budget: 15" in text
    assert "Horizon: 3" in text


def test_update_gaps():
    obs = [3.0, 2.0, 2.5, 1.0]
    g = metrics.update_gaps(obs, actual_best=0.0, start_index=1)
    np.testing.assert_allclose(g, [0.0, 1 / 3, 1 / 3, 2 / 3])


def test_myopic_cli_tiny(tmp_path):
    from rollout_bo_tpu.experiments import myopic
    out = str(tmp_path / "myo")
    myopic.main([
        "--function-name", "sixhump", "--budget", "3", "--trials", "2",
        "--starts", "4", "--output-dir", out, "--acquisitions", "ei", "random",
    ])
    rows = log.read_rows(os.path.join(out, "sixhump", "ei_gaps"))
    assert rows.shape == (2, 3)
    assert np.all(np.isfinite(rows))
    assert os.path.exists(os.path.join(out, "sixhump", "metadata.txt"))
    rows_r = log.read_rows(os.path.join(out, "sixhump", "random_minimum_observations"))
    assert rows_r.shape == (2, 3)


def test_nonmyopic_cli_tiny(tmp_path):
    from rollout_bo_tpu.experiments import nonmyopic
    out = str(tmp_path / "nm")
    nonmyopic.main([
        "--function-name", "gramacylee", "--budget", "2", "--trials", "1",
        "--starts", "4", "--mc-samples", "4", "--horizon", "1",
        "--batch-size", "2", "--sgd-iterations", "2",
        "--variance-reduction", "--output-dir", out,
    ])
    rows = log.read_rows(os.path.join(out, "gramacylee", "rollout_h1_gaps"))
    assert rows.shape == (1, 2)
    times = log.read_rows(os.path.join(out, "gramacylee", "rollout_h1_times"))
    assert np.all(times > 0)
