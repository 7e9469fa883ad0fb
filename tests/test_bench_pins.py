"""bench.py's pinned compaction schedules must stay consistent with the DP
and the solver constants they were tuned against (ADVICE r4 #4).

The R100/R1000 schedules in bench.py are measurements from a specific pilot
iteration distribution, which is itself a function of the inner-solver
budget constants (a retune of LAMBDA_NITER_F32_CAVI etc. changes the
distribution and silently invalidates the pins). `tools/retune_schedules.py
--record` stores the pilot distribution, the DP boundary cost, and the
constants in BASELINE.json; this test re-derives the schedules from that
record and compares them to the pins, and fails loudly if any recorded
constant no longer matches the live one.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def provenance():
    path = os.path.join(REPO, "BASELINE.json")
    if not os.path.isfile(path):
        pytest.skip("BASELINE.json missing (stripped checkout)")
    with open(path) as f:
        data = json.load(f)
    prov = data.get("bench_schedule_provenance")
    if prov is None:
        pytest.skip(
            "no recorded schedule provenance yet — run "
            "tools/retune_schedules.py --record on the bench device"
        )
    return prov


def test_solver_constants_match_recording(provenance):
    """A retuned solver constant invalidates the pinned schedules: the pins
    were measured at the recorded constants. Re-run retune_schedules.py
    --record (on the bench device) after any retune."""
    from multimodalmusig_tpu.ops import solvers as sv

    for name, recorded in provenance["solver_constants"].items():
        live = getattr(sv, name)
        assert live == recorded, (
            f"{name} changed ({recorded} -> {live}) since the bench "
            "schedules were pinned — re-run tools/retune_schedules.py "
            "--record and update bench.py's R100_SCHEDULE/R1000_SCHEDULE"
        )


def test_dp_candidates_rederive_from_recorded_pilot(provenance):
    """suggest_compact_schedule is deterministic: fed the recorded pilot
    distribution and boundary cost it must reproduce the recorded DP
    candidates (regression coverage for the DP itself)."""
    from multimodalmusig_tpu.parallel.restarts import suggest_compact_schedule

    iters = provenance["pilot_iters"]
    B = provenance["boundary_cost_lane_iters"]
    assert tuple(provenance["dp_r100_schedule"]) == suggest_compact_schedule(
        iters, maxiter=1000, boundary_cost_lane_iters=B
    )
    assert tuple(provenance["dp_r1000_schedule"]) == suggest_compact_schedule(
        iters, maxiter=1000, boundary_cost_lane_iters=B,
        production_restarts=1000,
    )


def test_pinned_schedules_match_recorded_choice(provenance):
    """bench.py's pins must be exactly what the retune run chose — the
    measured-faster of {incumbent, DP candidate} per scale (the DP's
    linear cost model has no small-bucket floor, so its deep-tail cuts can
    measure slower; the pin follows measurement, and this test catches a
    pin edited without re-recording)."""
    import bench

    assert tuple(bench.R100_SCHEDULE) == tuple(provenance["r100_schedule"]), (
        "bench.py R100_SCHEDULE differs from the recorded choice — re-run "
        "tools/retune_schedules.py --record on the bench device"
    )
    assert tuple(bench.R1000_SCHEDULE) == tuple(provenance["r1000_schedule"]), (
        "bench.py R1000_SCHEDULE differs from the recorded choice — re-run "
        "tools/retune_schedules.py --record on the bench device"
    )
