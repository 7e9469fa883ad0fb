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


def test_pinned_schedules_match_dp_on_recorded_pilot(provenance):
    """The DP, fed the recorded pilot distribution and boundary cost, must
    reproduce bench.py's pins exactly (suggest_compact_schedule is
    deterministic)."""
    import bench
    from multimodalmusig_tpu.parallel.restarts import suggest_compact_schedule

    iters = provenance["pilot_iters"]
    B = provenance["boundary_cost_lane_iters"]
    sched100 = suggest_compact_schedule(
        iters, maxiter=1000, boundary_cost_lane_iters=B
    )
    sched1000 = suggest_compact_schedule(
        iters, maxiter=1000, boundary_cost_lane_iters=B,
        production_restarts=1000,
    )
    assert tuple(provenance["r100_schedule"]) == sched100
    assert tuple(provenance["r1000_schedule"]) == sched1000
    assert tuple(bench.R100_SCHEDULE) == sched100, (
        "bench.py R100_SCHEDULE no longer matches the DP on the recorded "
        "pilot — update the pin or re-record"
    )
    assert tuple(bench.R1000_SCHEDULE) == sched1000, (
        "bench.py R1000_SCHEDULE no longer matches the DP on the recorded "
        "pilot — update the pin or re-record"
    )
