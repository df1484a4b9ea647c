import math

import numpy as np
import pytest

from visitron_tpu import geometry as geo
from visitron_tpu.sim import GraphSimulator, make_simulator


@pytest.fixture()
def sim(world):
    return make_simulator(world.graphs, batch_size=3, prefer_native=False)


def _start(world, sim, heading=0.0, elevation=0.0):
    scans = [world.scans[i % len(world.scans)] for i in range(3)]
    vps = [world.graphs[s].viewpoints[0] for s in scans]
    sim.new_episode(scans, vps, [heading] * 3, [elevation] * 3)
    return scans, vps


def test_view_sweep_36(world, sim):
    """The reference candidate sweep (data_loader.py:524-535): starting at
    heading 0 / elevation -30, makeAction(0,1,1) at ix%12==0 else (0,1,0)
    must visit viewIndex == ix for ix in 0..35."""
    scans, vps = _start(world, sim)
    sim.new_episode(scans, vps, [0.0] * 3, [math.radians(-30)] * 3)
    for ix in range(36):
        if ix == 0:
            pass
        elif ix % 12 == 0:
            sim.make_action([0] * 3, [1.0] * 3, [1.0] * 3)
        else:
            sim.make_action([0] * 3, [1.0] * 3, [0.0] * 3)
        for st in sim.get_states():
            assert st.viewIndex == ix
            np.testing.assert_allclose(st.heading, geo.heading_of_view(ix), atol=1e-9)
            np.testing.assert_allclose(st.elevation, geo.elevation_of_view(ix), atol=1e-9)


def test_heading_wraps_and_elevation_clamps(world, sim):
    _start(world, sim)
    for _ in range(12):
        sim.make_action([0] * 3, [-1.0] * 3, [1.0] * 3)
    st = sim.get_states()[0]
    assert st.viewIndex % 12 == 0  # wrapped fully around
    assert st.viewIndex // 12 == 2  # clamped at top row
    assert st.step == 12


def test_new_episode_snaps_heading(world, sim):
    scans, vps = _start(world, sim, heading=math.radians(44.0))
    st = sim.get_states()[0]
    assert st.viewIndex % 12 == 1  # 44 deg snaps to 30 deg bin? no: nearest is 30 or 60
    # 44 deg is closer to 30 than 60? |44-30|=14 < |44-60|=16 -> bin 1.


def test_navigable_locations_structure(world, sim):
    scans, vps = _start(world, sim)
    for i, st in enumerate(sim.get_states()):
        locs = st.navigableLocations
        assert locs[0].viewpointId == vps[i]
        assert locs[0].rel_heading == 0.0 and locs[0].rel_distance == 0.0
        g = world.graphs[scans[i]]
        hfov = sim.hfov
        prev_ang = -1.0
        for loc in locs[1:]:
            assert g.adjacency[g.index[vps[i]], g.index[loc.viewpointId]]
            assert abs(loc.rel_heading) <= hfov / 2 + 1e-6
            ang = math.sqrt(loc.rel_heading**2 + loc.rel_elevation**2)
            assert ang >= prev_ang - 1e-9  # sorted by angular distance
            prev_ang = ang


def test_sweep_covers_all_neighbors(world, sim):
    """Sweeping all 36 views must surface every graph neighbor at least once."""
    scans, vps = _start(world, sim)
    sim.new_episode(scans, vps, [0.0] * 3, [math.radians(-30)] * 3)
    seen = [set() for _ in range(3)]
    for ix in range(36):
        if ix > 0:
            de = 1.0 if ix % 12 == 0 else 0.0
            sim.make_action([0] * 3, [1.0] * 3, [de] * 3)
        for i, st in enumerate(sim.get_states()):
            for loc in st.navigableLocations[1:]:
                seen[i].add(loc.viewpointId)
    for i in range(3):
        g = world.graphs[scans[i]]
        expected = {g.viewpoints[int(n)] for n in g.neighbors(vps[i])}
        assert seen[i] == expected


def test_move_changes_location_keeps_pose(world, sim):
    scans, vps = _start(world, sim)
    st = sim.get_states()[0]
    # Find a view with a navigable neighbor.
    for _ in range(12):
        if len(st.navigableLocations) > 1:
            break
        sim.make_action([0] * 3, [1.0] * 3, [0.0] * 3)
        st = sim.get_states()[0]
    assert len(st.navigableLocations) > 1
    target = st.navigableLocations[1].viewpointId
    view_before = st.viewIndex
    sim.make_action_at(0, 1, 0.0, 0.0)
    st2 = sim.get_states()[0]
    assert st2.location.viewpointId == target
    assert st2.viewIndex == view_before  # camera pose persists across moves
    # Other batch elements did not move or step.
    assert sim.get_states()[1].location.viewpointId == vps[1]


def test_make_action_at_only_steps_one(world, sim):
    _start(world, sim)
    sim.make_action_at(1, 0, 1.0, 0.0)
    states = sim.get_states()
    assert states[1].step == 1
    assert states[0].step == 0 and states[2].step == 0


def test_deterministic_navigable_order(world):
    a = make_simulator(world.graphs, batch_size=1, prefer_native=False)
    b = make_simulator(world.graphs, batch_size=1, prefer_native=False)
    g = world.graphs[world.scans[0]]
    for vp in g.viewpoints[:5]:
        a.new_episode([world.scans[0]], [vp], [1.0], [0.0])
        b.new_episode([world.scans[0]], [vp], [1.0], [0.0])
        la = [l.viewpointId for l in a.get_states()[0].navigableLocations]
        lb = [l.viewpointId for l in b.get_states()[0].navigableLocations]
        assert la == lb
