import math

import numpy as np

from visitron_tpu import geometry as geo
from visitron_tpu.data.candidates import (
    build_candidate_table,
    candidate_angle_features,
    relative_point_id,
)
from visitron_tpu.sim import make_simulator


def sweep_candidates(sim, scan, vp):
    """Reference make_candidate (data_loader.py:516-583) driven through the
    simulator: sweep 36 views, collect navigableLocations[1:], dedupe by
    angular distance keeping dict insertion order."""
    adj = {}
    for ix in range(36):
        if ix == 0:
            sim.new_episode([scan], [vp], [0.0], [math.radians(-30)])
        elif ix % 12 == 0:
            sim.make_action([0], [1.0], [1.0])
        else:
            sim.make_action([0], [1.0], [0.0])
        state = sim.get_states()[0]
        assert state.viewIndex == ix
        for j, loc in enumerate(state.navigableLocations[1:]):
            dist = math.sqrt(loc.rel_heading**2 + loc.rel_elevation**2)
            if loc.viewpointId not in adj or dist < adj[loc.viewpointId]["distance"]:
                adj[loc.viewpointId] = {
                    "viewpointId": loc.viewpointId,
                    "pointId": ix,
                    "distance": dist,
                    "idx": j + 1,
                    "normalized_heading": state.heading + loc.rel_heading,
                    "elevation": state.elevation + loc.rel_elevation,
                }
    return list(adj.values())


def test_candidate_table_matches_simulator_sweep(world):
    sim = make_simulator(world.graphs, batch_size=1, prefer_native=False)
    for scan in world.scans:
        g = world.graphs[scan]
        table = build_candidate_table(g, sim.hfov)
        for u, vp in enumerate(g.viewpoints):
            swept = sweep_candidates(sim, scan, vp)
            assert table.count[u] == len(swept)
            for slot, c in enumerate(swept):
                assert g.viewpoints[table.nbr[u, slot]] == c["viewpointId"], (u, slot)
                assert table.point[u, slot] == c["pointId"]
                assert table.nav_idx[u, slot] == c["idx"]
                # normalized_heading may differ by 2*pi wraps.
                dh = table.heading[u, slot] - c["normalized_heading"]
                assert abs(math.remainder(dh, 2 * math.pi)) < 1e-6
                assert abs(table.elevation[u, slot] - c["elevation"]) < 1e-6


def test_nav_idx_drives_simulator_to_neighbor(world):
    """make_equiv_action parity (agent.py:278-321): rotate to the candidate's
    pointId, then take its nav_idx -> must land on the candidate viewpoint."""
    scan = world.scans[0]
    g = world.graphs[scan]
    sim = make_simulator(world.graphs, batch_size=1, prefer_native=False)
    table = build_candidate_table(g, sim.hfov)
    rng = np.random.default_rng(0)
    for u in rng.choice(g.num_viewpoints, size=8, replace=False):
        for slot in range(table.count[u]):
            sim.new_episode([scan], [g.viewpoints[u]], [0.0], [0.0])
            trg = int(table.point[u, slot])
            src = sim.get_states()[0].viewIndex
            src_level, trg_level = src // 12, trg // 12
            while src_level < trg_level:
                sim.make_action([0], [0.0], [1.0]); src_level += 1
            while src_level > trg_level:
                sim.make_action([0], [0.0], [-1.0]); src_level -= 1
            while sim.get_states()[0].viewIndex != trg:
                sim.make_action([0], [1.0], [0.0])
            state = sim.get_states()[0]
            nav = state.navigableLocations
            idx = int(table.nav_idx[u, slot])
            assert idx < len(nav)
            assert nav[idx].viewpointId == g.viewpoints[table.nbr[u, slot]]
            sim.make_action([idx], [0.0], [0.0])
            assert sim.get_states()[0].location.viewpointId == g.viewpoints[table.nbr[u, slot]]


def test_candidate_angle_features_shapes(world):
    scan = world.scans[0]
    g = world.graphs[scan]
    table = build_candidate_table(g, geo.camera_hfov(640, 480, math.radians(60)))
    vp = np.array([0, 1, 2])
    base = np.array([0, 13, 25])
    feats = candidate_angle_features(table, vp, base)
    assert feats.shape == (3, table.max_candidates, 4)
    # Base view rotation changes heading features only.
    f2 = candidate_angle_features(table, vp, np.array([0, 0, 0]))
    np.testing.assert_allclose(feats[0], f2[0])
    assert not np.allclose(feats[1], f2[1])


def test_relative_point_id_frame():
    # current_heading = pi -> base_step = snap(0) = 0 -> identity.
    pts = np.arange(36)
    np.testing.assert_array_equal(relative_point_id(pts, np.pi), pts)
    # current_heading = pi + 30deg -> rotate heading steps by -1 (mod 12).
    rel = relative_point_id(pts, np.pi + geo.ANGLE_INC)
    assert rel[1] == 0 and rel[0] == 11
    np.testing.assert_array_equal(rel // 12, pts // 12)  # rows preserved
