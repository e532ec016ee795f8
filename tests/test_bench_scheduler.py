"""The scaling-evidence scheduler is load-bearing methodology (the
north rule's N→4N criterion is graded from its output), so its logic is
pinned here with a stubbed run_config/run_fleet — no JVMs, pure math.

Covers: fleet vCPU-slice disjointness/coverage, block qualification,
median robustness to one deviant fleet member (inner-spread gate),
in-block retry on a uniformly contaminated fleet (hi-envelope gate),
per-ladder replicates, and the no-qualifier fallback tag.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_scaling as bs  # noqa: E402


def test_fleet_cpu_sets_cover_solo_hi_leg():
    # 4 slices of N cores each == exactly the vCPUs _cpu_set(4N) uses
    for cores, copies in ((2, 4), (4, 4)):
        slices = bs.fleet_cpu_sets(cores, copies)
        assert len(slices) == copies
        got = [int(v) for s in slices for v in s.split(",")]
        assert sorted(got) == sorted(
            int(v) for v in bs._cpu_set(cores * copies).split(","))
        # disjoint
        assert len(set(got)) == len(got)
        # each slice has exactly `cores` vCPUs
        assert all(len(s.split(",")) == cores for s in slices)


def _fake_host(cpu_of):
    """Patch bench_scaling with a deterministic host model.

    ``cpu_of(cores, call_index, cpu_list)`` returns the µs/event the
    job measures; wall follows at 97% utilization.
    """
    calls = []

    def run_config(dump, n_events, cores, replicate,
                   cpu_list=None, driver_mem=None):
        ev = n_events * replicate
        cpu = cpu_of(cores, len(calls), cpu_list)
        calls.append((cores, replicate, cpu_list))
        wall = ev * cpu / 1e6 / cores / 0.97
        return {"cores": cores, "wall_sec": round(wall, 2), "events": ev,
                "events_per_sec": round(ev / wall, 1), "final_rows": 1,
                "cpu_core_sec": round(ev * cpu / 1e6, 1),
                "cpu_us_per_event": round(cpu, 2), "ext_load": 0.1}

    def run_fleet(dump, n_events, cores, replicate, copies=4):
        return [run_config(dump, n_events, cores, replicate,
                           cpu_list=f"FLEET{i}") for i in range(copies)]

    bs.run_config = run_config
    bs.run_fleet = run_fleet
    bs.wait_quiet = lambda **k: 0.1
    bs.ext_busy_cores = lambda interval=2.0: 0.1
    return calls


def _pair(**kw):
    import bench
    # tiny fixture: the stubbed host never reads it, but _scaling_pair
    # generates it if missing (0.5 s) and reads its manifest
    kw.setdefault("n_changes", 5000)
    return bench._scaling_pair(**kw)


def test_quiet_host_both_ladders_qualify():
    _fake_host(lambda c, i, cl: 21.0 * (1.05 if c >= 8 else 1.0)
               + 0.2 * (i % 3))
    out = _pair()
    assert out["block_qualifies_4_to_16"]
    assert out["block_qualifies_2_to_8"]
    assert out["scaling_selector"].startswith("mean_of_qualifying")
    assert out["scaling_pair"] == "4_to_16+2_to_8"
    assert 0.9 <= out["scaling_efficiency"] <= 1.0
    # per-ladder replicates: primary full, secondary half
    assert out["scale_events_4_to_16"] == 2 * out["scale_events_2_to_8"]


def test_one_fast_fleet_member_does_not_void_block():
    # one member's cores run 16% hot: median and inner spread unharmed
    _fake_host(lambda c, i, cl: (21.0 * (1.05 if c >= 8 else 1.0))
               * (0.84 if cl == "FLEET0" else 1.0))
    out = _pair()
    assert out["block_qualifies_4_to_16"]
    assert out["fleet_spread_4_to_16"] <= 0.08
    assert out["fleet_spread_full_4_to_16"] > 0.08  # recorded, not gating


def test_uniform_fleet_contamination_retries_in_block():
    # first c4 fleet runs 1.4× hot on ALL members (spread stays tiny);
    # the hi-envelope gate must retry the fleet inside the block and
    # the block must then qualify on the clean retry
    poisoned = {"left": 4}

    def cpu_of(c, i, cl):
        base = 21.0 * (1.05 if c >= 8 else 1.0)
        if cl and cl.startswith("FLEET") and c == 4 and poisoned["left"]:
            poisoned["left"] -= 1
            return base * 1.4
        return base

    _fake_host(cpu_of)
    out = _pair()
    assert out["block_qualifies_4_to_16"]
    assert out["scale_runs"][4] == 8  # two fleets: poisoned + clean
    assert out["blocks_4_to_16"][-1]["qualifies"]


def test_substrate_limited_fleet_qualifies_with_discounted_eff():
    # the fleet burns 10% more CPU/event than the solo hi leg on every
    # block (shared-substrate contention): blocks qualify at the
    # substrate tier and contribute eff ÷ cpu_eff, never the raw wall
    _fake_host(lambda c, i, cl: 21.0 * (1.10 if cl else 1.0))
    out = _pair()
    assert not out["block_qualifies_4_to_16"]  # not pristine
    assert out["block_tier_4_to_16"] == "substrate_adjusted"
    assert "substrate_adjusted" in out["scaling_selector"]
    eff = out["scaling_efficiency_4_to_16"]
    flat = out["cpu_scaling_efficiency_4_to_16"]
    assert abs(out["scaling_efficiency_effective_4_to_16"]
               - eff / flat) < 0.01
    assert out["scaling_efficiency"] < eff  # discounted, not inflated


def test_no_qualifier_falls_back_with_explicit_tag():
    # hi legs drift 20% between brackets on every block: nothing
    # qualifies, the selector must say so, never a silent max
    state = {"flip": False}

    def cpu_of(c, i, cl):
        base = 21.0 * (1.05 if c >= 8 else 1.0)
        if cl is None:  # solo hi legs alternate fast/slow
            state["flip"] = not state["flip"]
            return base * (1.25 if state["flip"] else 1.0)
        return base

    _fake_host(cpu_of)
    out = _pair()
    assert not out["block_qualifies_4_to_16"]
    assert not out["block_qualifies_2_to_8"]
    assert out["scaling_selector"] == "fallback_flattest_no_block_qualified"
