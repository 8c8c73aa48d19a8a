"""CLI example apps smoke tests (the reference's de-facto API surface,
SURVEY.md §2.21): estimate, predict, plan — run in-process with tiny sizes."""
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, os.path.abspath(EXAMPLES))


def test_estimate_cli_roundtrip(tmp_path):
    import estimate_satellite3d as est
    meas = str(tmp_path / "meas.bin")
    out = str(tmp_path / "est.csv")
    assert est.main([f"--generate-meas={meas}", "--steps=30"]) == 0
    assert os.path.exists(meas)
    assert est.main([f"--input={meas}", "--filter=iekf",
                     f"--output={out}"]) == 0
    with open(out) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 31  # header + 30 estimates


def test_estimate_cli_mc(capsys):
    import estimate_satellite3d as est
    assert est.main(["--steps=15", "--mc-runs=4"]) == 0
    out = capsys.readouterr().out
    assert "MC runs: 4" in out and "final pos err" in out


@pytest.mark.slow
def test_predict_cli(capsys):
    import predict_satellite3d as pred
    assert pred.main(["--steps=20", "--horizon=10", "--n-scenarios=4"]) == 0
    out = capsys.readouterr().out
    assert "predicted 10 steps" in out and "scenarios: (4, 11, 13)" in out


@pytest.mark.parametrize("planner", ["rrt", "fadprm"])
def test_crs_planner_cli(planner, capsys, tmp_path):
    import run_crs_planner as crs
    out = str(tmp_path / "path.csv")
    rc = crs.main([f"--planner={planner}", "--max-iters=150",
                   f"--output={out}", "--seed=3"])
    assert rc == 0
    assert "success=True" in capsys.readouterr().out
    assert os.path.exists(out)


@pytest.mark.slow
def test_crs_dynexec_pipeline(tmp_path, capsys):
    """The full online composite: estimate (TCP loopback stream) → predict →
    IK-mapped intercept plan → recorded output (ref: CRS_planner_dynexec.cpp:75
    + predict_satellite3D.cpp streaming composition)."""
    import crs_dynexec as dyn
    out = str(tmp_path / "plan.csv")
    rc = dyn.main(["--steps=15", "--horizon=15", "--max-iters=60",
                   "--port=48917", f"--output={out}"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "rows streamed" in text and "intercept planned" in text
    # the target body rides its predicted trajectory as a moving obstacle
    # (TemporalChainWorkspace); every waypoint must clear it at its own time
    assert "all clear of the moving target body: True" in text
    with open(out) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) >= 3  # header + at least two waypoints


@pytest.mark.slow
def test_x8_planner_cli(capsys):
    """X8 quadrotor + MEAQR topology + RRT* composition
    (ref: examples/misc/X8_run_planner.cpp; VERDICT r2 item 10)."""
    import json
    from examples import x8_planner

    rc = x8_planner.main(["--planner=rrt_star", "--max-iters=10", "--seed=1",
                          "--n-grid=24", "--capacity=768"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["success"]
    assert out["cost"] < 10.0
