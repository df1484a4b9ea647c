"""NavRuntime: the packed, device-resident world model for rollouts.

The reference touches three host-side structures every rollout step — the C++
simulator, a python candidate cache, and numpy feature dicts — and ships
(B, 36, 2052) float features host->device per step (agent.py:186-228,
data_loader.py:516-659).  NavRuntime packs everything into global arrays
indexed by *viewpoint row* (scan-contiguous, shared with SceneFeatureTable):

  feats    (R, 36, D)   scene features per view            [device]
  count    (R,)         number of candidates               [device]
  nbr      (R, K)       candidate target row (global), -1  [device]
  point    (R, K)       candidate best-view index          [device]
  heading  (R, K)       candidate absolute heading         [device]
  elev     (R, K)       candidate absolute elevation       [device]
  pano_af  (36, 36, 4)  per-base-view panorama angle table [device]
  view_af  (36, 4)      camera angle feature by view       [device]

With these, a navigation step is pure gathers + elementwise math, so:
  * teacher-forced training rolls the whole episode in one ``lax.scan``
    (zero host involvement);
  * student-forced rollouts keep features on device and move only (B,) int32
    action/viewpoint indices across the host boundary per step.

Host-side helpers mirror the reference supervision exactly: the teacher
action is the candidate whose viewpoint is the next hop on the shortest path
to the goal, or the stop slot at the goal (data_loader.py:508-514,
agent.py:230-251).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from visitron_tpu import geometry as geo
from visitron_tpu.data.candidates import ScanCandidateTable, build_candidate_tables
from visitron_tpu.data.features import SceneFeatureTable
from visitron_tpu.graph import NavGraph


@dataclass(eq=False)  # custom __eq__/__hash__ below (pytree aux semantics)
class NavRuntime:
    graphs: dict[str, NavGraph]
    feat_table: SceneFeatureTable
    tables: dict[str, ScanCandidateTable]
    max_candidates: int
    # host copies
    count_h: np.ndarray
    nbr_h: np.ndarray
    point_h: np.ndarray
    nav_idx_h: np.ndarray
    heading_h: np.ndarray
    elev_h: np.ndarray
    # device arrays
    feats: jnp.ndarray
    count: jnp.ndarray
    nbr: jnp.ndarray
    point: jnp.ndarray
    heading: jnp.ndarray
    elev: jnp.ndarray
    pano_af: jnp.ndarray
    view_af: jnp.ndarray

    @classmethod
    def build(cls, graphs: dict[str, NavGraph], feat_table: SceneFeatureTable,
              hfov: float | None = None, max_candidates: int = 15,
              tables: dict[str, ScanCandidateTable] | None = None,
              device_dtype=jnp.float32) -> "NavRuntime":
        if hfov is None:
            hfov = geo.camera_hfov(feat_table.image_w, feat_table.image_h,
                                   np.radians(feat_table.vfov))
        if tables is None:
            tables = build_candidate_tables(graphs, hfov, max_candidates)
        total = feat_table.table.shape[0]
        k = max_candidates
        count = np.zeros(total, np.int32)
        nbr = np.full((total, k), -1, np.int32)
        point = np.zeros((total, k), np.int32)
        nav_idx = np.zeros((total, k), np.int32)
        heading = np.zeros((total, k), np.float32)
        elev = np.zeros((total, k), np.float32)
        for scan in sorted(graphs):
            g = graphs[scan]
            t = tables[scan]
            off = feat_table.scan_offsets[scan]
            rows = slice(off, off + g.num_viewpoints)
            count[rows] = t.count
            valid = t.nbr >= 0
            nbr[rows] = np.where(valid, t.nbr + off, -1)
            point[rows] = t.point
            nav_idx[rows] = t.nav_idx
            heading[rows] = t.heading
            elev[rows] = t.elevation
        return cls(
            graphs=graphs,
            feat_table=feat_table,
            tables=tables,
            max_candidates=k,
            count_h=count,
            nbr_h=nbr,
            point_h=point,
            nav_idx_h=nav_idx,
            heading_h=heading,
            elev_h=elev,
            feats=jnp.asarray(feat_table.table, device_dtype),
            count=jnp.asarray(count),
            nbr=jnp.asarray(nbr),
            point=jnp.asarray(point),
            heading=jnp.asarray(heading),
            elev=jnp.asarray(elev),
            pano_af=jnp.asarray(geo.all_point_angle_feature(), device_dtype),
            view_af=jnp.asarray(geo.point_angle_feature(0), device_dtype),
        )

    # As pytree aux data (registration at module end), treedef equality uses
    # these.  Identity equality breaks AOT: Compiled.call rejects any treedef
    # mismatch, and mesh placement (``tree.map`` in ``step_runtime``) creates
    # NEW NavRuntime instances carrying the SAME host state.  All
    # trace-relevant data lives in the 8 array leaves, so aux equality only
    # needs to keep genuinely different worlds distinct: compare the shared
    # host-state objects by identity.
    def __eq__(self, other):
        return (type(other) is NavRuntime
                and self.graphs is other.graphs
                and self.feat_table is other.feat_table
                and self.max_candidates == other.max_candidates)

    def __hash__(self):
        return hash((id(self.graphs), id(self.feat_table),
                     self.max_candidates))

    # ------------------------------------------------------------------ host
    def row(self, scan: str, viewpoint: str) -> int:
        return self.feat_table.row(scan, viewpoint)

    def row_to_id(self, row: int) -> tuple[str, str]:
        """Global row -> (scan, viewpointId); O(1) via a flat lookup table."""
        table = getattr(self, "_row_ids", None)
        if table is None:
            table = [None] * self.feat_table.table.shape[0]
            for scan in self.graphs:
                off = self.feat_table.scan_offsets[scan]
                g = self.graphs[scan]
                for i, vp in enumerate(g.viewpoints):
                    table[off + i] = (scan, vp)
            self._row_ids = table
        got = table[row]
        if got is None:
            raise IndexError(row)
        return got

    def start_state(self, scan: str, viewpoint: str, heading: float,
                    elevation: float = 0.0) -> tuple[int, int]:
        """(row, view_index) after new_episode snapping."""
        return (
            self.row(scan, viewpoint),
            geo.view_of(geo.snap_heading(heading), geo.snap_elevation(elevation)),
        )

    def teacher_slot(self, scan: str, row: int, goal_row: int) -> int:
        """Index of the teacher candidate: slot of the next-hop neighbor, or
        ``count`` (the stop slot) at the goal (agent.py:237-251)."""
        g = self.graphs[scan]
        off = self.feat_table.scan_offsets[scan]
        u, goal = row - off, goal_row - off
        if u == goal:
            return int(self.count_h[row])
        nxt = int(g.next_hop[u, goal]) + off
        slots = np.flatnonzero(self.nbr_h[row] == nxt)
        assert len(slots) == 1, (scan, row, goal_row)
        return int(slots[0])

    def step_to(self, row: int, slot: int) -> tuple[int, int]:
        """Apply candidate ``slot`` from ``row``: (new_row, new_view).

        make_equiv_action parity (agent.py:278-321): the agent rotates onto
        the candidate's pointId and moves; camera pose persists, so the new
        view index is exactly the candidate's point.
        """
        new_row = int(self.nbr_h[row, slot])
        new_view = int(self.point_h[row, slot])
        assert new_row >= 0
        return new_row, new_view

    # ---------------------------------------------------------- turn-based
    def navigable_at(self, row: int, view: int) -> list[tuple[int, float, float]]:
        """Ordered (neighbor_row, rel_heading, rel_elevation) visible from
        (row, view) — simulator navigableLocations[1:] parity."""
        hfov = geo.camera_hfov(self.feat_table.image_w, self.feat_table.image_h,
                               np.radians(self.feat_table.vfov))
        cam_h = geo.heading_of_view(view)
        cam_e = geo.elevation_of_view(view)
        n = int(self.count_h[row])
        rel_h = geo.normalize_angle(self.heading_h[row, :n] - cam_h)
        rel_e = self.elev_h[row, :n] - cam_e
        vis = np.abs(rel_h) <= hfov / 2.0 + 1e-9
        order = np.flatnonzero(vis)
        ang = np.sqrt(rel_h[order] ** 2 + rel_e[order] ** 2)
        order = order[np.argsort(ang, kind="stable")]
        return [(int(self.nbr_h[row, s]), float(rel_h[s]), float(rel_e[s])) for s in order]

    def turn_based_teacher(self, scan: str, row: int, view: int, goal_row: int) -> int:
        """Low-level teacher action id (model_actions order: left, right, up,
        down, forward, <end>) — parity with
        tasks/turn_based/data_loader.py:509-546 + agent.py:212-232."""
        LEFT, RIGHT, UP, DOWN, FORWARD, END = range(6)
        if row == goal_row:
            return END
        g = self.graphs[scan]
        off = self.feat_table.scan_offsets[scan]
        nxt = int(g.next_hop[row - off, goal_row - off]) + off
        nav = self.navigable_at(row, view)
        for i, (nbr_row, rel_h, rel_e) in enumerate(nav):
            if nbr_row == nxt:
                if rel_h > np.pi / 6.0:
                    return RIGHT
                if rel_h < -np.pi / 6.0:
                    return LEFT
                if rel_e > np.pi / 6.0 and view // 12 < 2:
                    return UP
                if rel_e < -np.pi / 6.0 and view // 12 > 0:
                    return DOWN
                return FORWARD
        # Not visible: neutralize elevation, else turn the shorter way.
        if view // 12 == 0:
            return UP
        if view // 12 == 2:
            return DOWN
        slot = int(np.flatnonzero(self.nbr_h[row] == nxt)[0])
        target_heading = float(self.heading_h[row, slot]) % (2 * np.pi)
        heading = geo.heading_of_view(view)
        if heading > target_heading and heading - target_heading < np.pi:
            return LEFT
        if target_heading > heading and target_heading - heading > np.pi:
            return LEFT
        return RIGHT

    def apply_turn_action(self, row: int, view: int, action: int) -> tuple[int, int]:
        """Apply a low-level action id; returns (row, view).  forward moves to
        the first (most-centered) navigable location, matching the reference
        agent which can only pick 'the one in the middle' (agent.py:67)."""
        LEFT, RIGHT, UP, DOWN, FORWARD, END = range(6)
        hstep, erow = view % 12, view // 12
        if action == LEFT:
            hstep = (hstep - 1) % 12
        elif action == RIGHT:
            hstep = (hstep + 1) % 12
        elif action == UP:
            erow = min(erow + 1, 2)
        elif action == DOWN:
            erow = max(erow - 1, 0)
        elif action == FORWARD:
            nav = self.navigable_at(row, view)
            if nav:
                row = nav[0][0]
        return row, erow * 12 + hstep

    def turn_based_rollout_arrays(self, scans: list[str], start_rows, start_views,
                                  goal_rows, episode_len: int, ignore_id: int = -100):
        """Precompute a teacher-forced low-level episode: (B, T) cur_row, view,
        teacher action ids, forward-allowed flags, active mask."""
        b = len(start_rows)
        cur_row = np.zeros((b, episode_len), np.int32)
        view = np.zeros((b, episode_len), np.int32)
        teacher = np.full((b, episode_len), ignore_id, np.int32)
        fwd_ok = np.zeros((b, episode_len), bool)
        active = np.zeros((b, episode_len), bool)
        END = 5
        for i in range(b):
            row, v = int(start_rows[i]), int(start_views[i])
            goal = int(goal_rows[i])
            ended = False
            for t in range(episode_len):
                cur_row[i, t] = row
                view[i, t] = v
                fwd_ok[i, t] = len(self.navigable_at(row, v)) > 0
                if ended:
                    continue
                a = self.turn_based_teacher(scans[i], row, v, goal)
                teacher[i, t] = a
                active[i, t] = True
                if a == END:
                    ended = True
                else:
                    row, v = self.apply_turn_action(row, v, a)
        return {"cur_row": cur_row, "view": view, "teacher": teacher,
                "fwd_ok": fwd_ok, "active": active}

    def sample_rollout_arrays(self, scans: list[str], goal_rows) -> dict:
        """Per-item device-side teacher columns for student-forced training.

        For a fixed goal, the shortest-path teacher from any viewpoint v is
        one column of the next-hop table: teacher_col[i, v] = global row of
        the next hop from scan-local v toward goal_i.  With this on device,
        sampled (student-forced) rollouts compute their teacher supervision
        inside the jitted scan — no host in the loop (reference
        feedback='sample' training, agent.py:406-425).
        """
        b = len(goal_rows)
        v_max = max(g.num_viewpoints for g in self.graphs.values())
        teacher_col = np.full((b, v_max), -1, np.int32)
        dist_col = np.full((b, v_max), 1e6, np.float32)
        offsets = np.zeros(b, np.int32)
        for i, scan in enumerate(scans):
            g = self.graphs[scan]
            off = self.feat_table.scan_offsets[scan]
            goal = int(goal_rows[i]) - off
            col = g.next_hop[:, goal].astype(np.int32)
            teacher_col[i, : g.num_viewpoints] = np.where(col >= 0, col + off, -1)
            # Metric distance-to-goal per viewpoint: the on-device RL reward
            # (progress + success bonus) is a gather into this column.
            d = g.dist[:, goal].astype(np.float32)
            dist_col[i, : g.num_viewpoints] = np.where(np.isfinite(d), d, 1e6)
            offsets[i] = off
        return {"teacher_col": teacher_col, "dist_col": dist_col,
                "scan_offset": offsets}

    def teacher_rollout_arrays(self, scans: list[str], start_rows: np.ndarray,
                               start_views: np.ndarray, goal_rows: np.ndarray,
                               episode_len: int, ignore_id: int = -100):
        """Precompute the full teacher-forced episode for a batch.

        Returns dict of (B, T) int32 arrays: cur_row, view, teacher_slot
        (ignore_id once ended), plus (B, T) active mask.  The rollout itself
        (features, decoder, loss) then runs in one jitted scan.
        """
        b = len(start_rows)
        t_len = episode_len
        cur_row = np.zeros((b, t_len), np.int32)
        view = np.zeros((b, t_len), np.int32)
        teacher = np.full((b, t_len), ignore_id, np.int32)
        active = np.zeros((b, t_len), bool)
        for i in range(b):
            row, v = int(start_rows[i]), int(start_views[i])
            goal = int(goal_rows[i])
            ended = False
            for t in range(t_len):
                cur_row[i, t] = row
                view[i, t] = v
                if ended:
                    continue
                slot = self.teacher_slot(scans[i], row, goal)
                teacher[i, t] = slot
                active[i, t] = True
                if slot == int(self.count_h[row]):  # stop
                    ended = True
                else:
                    row, v = self.step_to(row, slot)
        return {
            "cur_row": cur_row,
            "view": view,
            "teacher": teacher,
            "active": active,
        }


# ---------------------------------------------------------------------------
# NavRuntime as a jax pytree: the 8 device tables are leaves, everything else
# (graphs, host arrays, caches) rides along as opaque aux data.
#
# Why: jitted rollout code used to CLOSE OVER the device tables, which embeds
# them into every lowered program as HLO constants — each lowering fetches
# the arrays to host (minutes over a remote-relay TPU) and at Matterport
# scale (~10.8K viewpoints x 36 x 2048 bf16 ~ 1.6 GB) would be fatal.
# Registering the runtime as a pytree lets agents pass it as an ordinary jit
# ARGUMENT: zero-copy (arrays are already device-resident), small HLO, and
# table updates never trigger retraces of a different program.
# ---------------------------------------------------------------------------

_RT_DEVICE_FIELDS = ("feats", "count", "nbr", "point", "heading", "elev",
                     "pano_af", "view_af")


def _rt_flatten(rt: NavRuntime):
    return tuple(getattr(rt, f) for f in _RT_DEVICE_FIELDS), rt


def _rt_unflatten(aux: NavRuntime, children):
    new = object.__new__(NavRuntime)
    new.__dict__.update(aux.__dict__)
    for f, c in zip(_RT_DEVICE_FIELDS, children):
        setattr(new, f, c)
    return new


import jax  # noqa: E402  (registration only; jnp already imported above)

jax.tree_util.register_pytree_node(NavRuntime, _rt_flatten, _rt_unflatten)


def place_runtime_on_mesh(runtime: NavRuntime, mesh) -> NavRuntime:
    """Globally-replicated device copy of the runtime's array leaves for a
    mesh step: single-host via device_put, multi-host by assembling each
    host's identical local copy into one global array.  Jitted mesh steps
    must receive THIS, not the raw host-local runtime — mixing host-local
    leaves with mesh-sharded batch/state arrays is an incompatible-devices
    error under jax.distributed.  Callers cache per (runtime, mesh): the
    placement is one full HBM upload of the world tables."""
    from visitron_tpu.parallel import replicated_sharding

    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        place = lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x))
    else:
        place = lambda x: jax.device_put(x, sh)
    return jax.tree.map(place, runtime)


def cached_step_runtime(agent):
    """Shared implementation of the agents' ``step_runtime()``: the
    mesh-replicated runtime for the train step, cached on the agent and
    keyed on the runtime object's identity — swapping in rebuilt tables
    (``agent.runtime = ...``) must re-place rather than silently train
    against the stale device copy.  Host-local (no mesh) agents pass the
    raw runtime through.  One helper so the caching contract cannot drift
    between the three mesh-aware agents."""
    if agent.mesh is None:
        return agent.runtime
    if agent._rt_placed is None or agent._rt_placed[0] is not agent.runtime:
        agent._rt_placed = (agent.runtime,
                            place_runtime_on_mesh(agent.runtime, agent.mesh))
    return agent._rt_placed[1]
