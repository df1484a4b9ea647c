"""Native (C++) simulator: build, and full equivalence vs the Python engine."""

import math
import shutil

import numpy as np
import pytest

from visitron_tpu.sim import make_simulator

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


@pytest.fixture(scope="module")
def sims(world):
    py = make_simulator(world.graphs, batch_size=3, prefer_native=False)
    from visitron_tpu.sim.native import NativeGraphSimulator

    nat = NativeGraphSimulator(world.graphs)
    nat.set_batch_size(3)
    nat.set_camera_resolution(640, 480)
    nat.set_camera_vfov(math.radians(60))
    nat.initialize()
    return py, nat


def _assert_states_equal(a, b):
    assert a.scanId == b.scanId
    assert a.location.viewpointId == b.location.viewpointId
    assert a.viewIndex == b.viewIndex
    assert a.step == b.step
    assert abs(a.heading - b.heading) < 1e-9
    assert abs(a.elevation - b.elevation) < 1e-9
    la = [(l.viewpointId, round(l.rel_heading, 9), round(l.rel_elevation, 9))
          for l in a.navigableLocations]
    lb = [(l.viewpointId, round(l.rel_heading, 9), round(l.rel_elevation, 9))
          for l in b.navigableLocations]
    assert [x[0] for x in la] == [x[0] for x in lb]
    for (ia, ha, ea), (ib, hb, eb) in zip(la, lb):
        assert abs(ha - hb) < 1e-6 and abs(ea - eb) < 1e-6


def test_native_matches_python_random_walk(world, sims):
    py, nat = sims
    rng = np.random.default_rng(0)
    scans = [world.scans[i % len(world.scans)] for i in range(3)]
    vps = [world.graphs[s].viewpoints[int(rng.integers(5))] for s in scans]
    headings = rng.uniform(0, 2 * np.pi, 3).tolist()
    py.new_episode(scans, vps, headings, [0.0] * 3)
    nat.new_episode(scans, vps, headings, [0.0] * 3)
    for step in range(120):
        sa = py.get_states()
        sb = nat.get_states()
        for a, b in zip(sa, sb):
            _assert_states_equal(a, b)
        ix, dh, de = [], [], []
        for a in sa:
            n = len(a.navigableLocations)
            move = rng.random() < 0.4 and n > 1
            ix.append(int(rng.integers(1, n)) if move else 0)
            dh.append(float(rng.integers(-1, 2)))
            de.append(float(rng.integers(-1, 2)))
        py.make_action(ix, dh, de)
        nat.make_action(ix, dh, de)
    for a, b in zip(py.get_states(), nat.get_states()):
        _assert_states_equal(a, b)


def test_native_make_action_at(world, sims):
    py, nat = sims
    scans = [world.scans[0]] * 3
    vps = [world.graphs[scans[0]].viewpoints[0]] * 3
    py.new_episode(scans, vps, [0.0] * 3, [0.0] * 3)
    nat.new_episode(scans, vps, [0.0] * 3, [0.0] * 3)
    py.make_action_at(1, 0, 1.0, 0.0)
    nat.make_action_at(1, 0, 1.0, 0.0)
    for a, b in zip(py.get_states(), nat.get_states()):
        _assert_states_equal(a, b)
    assert nat.get_states()[1].step == 1
    assert nat.get_states()[0].step == 0


def test_make_simulator_prefers_native(world):
    sim = make_simulator(world.graphs, batch_size=2, prefer_native=True)
    from visitron_tpu.sim.native import NativeGraphSimulator

    assert isinstance(sim, NativeGraphSimulator)
    sim.new_episode([world.scans[0]] * 2,
                    [world.graphs[world.scans[0]].viewpoints[0]] * 2,
                    [0.0, 1.0], [0.0, 0.0])
    states = sim.get_states()
    assert states[0].viewIndex == 12  # heading 0, elevation row 1
