"""EnvBatch / SimNavEnv: live-sim obs assembly vs NavRuntime tables; extras."""

import numpy as np
import pytest

from visitron_tpu import geometry as geo
from visitron_tpu.agents import NavRuntime
from visitron_tpu.data import SceneFeatureTable
from visitron_tpu.data.env import EnvBatch, SimNavEnv


@pytest.fixture(scope="module")
def table(world):
    return SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)


@pytest.fixture(scope="module")
def runtime(world, table):
    return NavRuntime.build(world.graphs, table)


def _items(world, n=3):
    return world.ndh_items("train", n, start_idx=5000)


def test_env_batch_states_and_features(world, table):
    env = EnvBatch(world.graphs, table, batch_size=2)
    scan = world.scans[0]
    vps = world.graphs[scan].viewpoints[:2]
    env.new_episodes([scan, scan], vps, [0.0, 1.0])
    for (feat, state), vp in zip(env.get_states(), vps):
        assert state.location.viewpointId == vp
        np.testing.assert_array_equal(feat, table.get(scan, vp))
    env.make_actions([(0, 1.0, 0.0), (0, 0.0, 0.0)])
    assert env.get_states()[0][1].viewIndex % 12 == 1


def test_env_batch_per_view_mode(world, table):
    env = EnvBatch(world.graphs, table, batch_size=1, pano_features=False)
    scan = world.scans[0]
    vp = world.graphs[scan].viewpoints[0]
    env.new_episodes([scan], [vp], [0.0])
    feat, state = env.get_states()[0]
    np.testing.assert_array_equal(feat, table.get(scan, vp)[state.viewIndex])


def test_sim_env_obs_matches_runtime_tables(world, table, runtime):
    """Live-sim candidate extraction must equal the precomputed tables the
    TPU rollout gathers from — same candidates, pointIds, features."""
    items = _items(world, 3)
    env = SimNavEnv(world.graphs, table, batch_size=3, path_type="planner_path")
    obs = env.reset(items)
    for i, ob in enumerate(obs):
        scan = ob["scan"]
        g = world.graphs[scan]
        row = runtime.row(scan, ob["viewpoint"])
        n = int(runtime.count_h[row])
        cand_by_vp = {c["viewpointId"]: c for c in ob["candidate"]}
        assert len(ob["candidate"]) == n
        for slot in range(n):
            nbr_scan, nbr_vp = runtime.row_to_id(int(runtime.nbr_h[row, slot]))
            c = cand_by_vp[nbr_vp]
            assert c["pointId"] == runtime.point_h[row, slot]
            assert c["idx"] == runtime.nav_idx_h[row, slot]
        # Teacher is the next hop toward the path goal.
        goal = items[i]["planner_path"][-1]
        assert ob["teacher"] == g.next_on_path(ob["viewpoint"], goal)
        # Pano feature = scene feature ++ angle table for the base view.
        np.testing.assert_allclose(
            ob["feature"][:, -4:], geo.all_point_angle_feature()[ob["viewIndex"]])
    # Candidate cache hit path returns consistent features.
    obs2 = env._get_obs()
    for o1, o2 in zip(obs, obs2):
        assert [c["viewpointId"] for c in o1["candidate"]] == \
               [c["viewpointId"] for c in o2["candidate"]]
        for c1, c2 in zip(o1["candidate"], o2["candidate"]):
            np.testing.assert_allclose(c1["feature"], c2["feature"], atol=1e-6)


def test_sim_env_step(world, table):
    items = _items(world, 2)
    env = SimNavEnv(world.graphs, table, batch_size=2, path_type="planner_path")
    obs = env.reset(items)
    obs = env.step([(0, 1.0, 0.0), (0, -1.0, 0.0)])
    assert obs[0]["viewIndex"] % 12 == (geo.snap_heading(items[0]["start_pano"]["heading"]) + 1) % 12


def test_classification_model():
    import jax
    import jax.numpy as jnp

    from visitron_tpu.models import BertConfig
    from visitron_tpu.models.classification import ImageBertForActionPrediction

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=32, type_vocab_size=4,
                     img_feature_dim=20)
    model = ImageBertForActionPrediction(cfg, candidate_dim=24)
    ids = jnp.ones((2, 16), jnp.int32)
    cands = jnp.ones((2, 5, 24))
    params = jax.jit(lambda r: model.init(r, ids, cands))(jax.random.PRNGKey(0))
    logits = model.apply(params, ids, cands)
    assert logits.shape == (2, 5)


def test_orientation_pipeline_roundtrip(tmp_path):
    from visitron_tpu.pipelines.orientation import (
        add_orientation,
        convert_tsv_to_oriented_pickle,
        read_bottomup_tsv,
        write_bottomup_tsv,
    )

    rng = np.random.default_rng(0)
    items = []
    for i in range(3):
        n = int(rng.integers(2, 6))
        boxes = rng.uniform(0, 500, (n, 4)).astype(np.float32)
        boxes[:, 2:] = np.minimum(boxes[:, :2] + 50, 599)
        items.append({
            "scanId": "s", "viewpointId": f"v{i}", "image_w": 600, "image_h": 600,
            "vfov": 80, "features": rng.standard_normal((n, 32)).astype(np.float32),
            "boxes": boxes,
            "cls_prob": rng.dirichlet(np.ones(4), n).astype(np.float32),
            "region_tokens": [f"tok{j}" for j in range(n)],
            "featureViewIndex": str(i),
        })
    tsv = str(tmp_path / "bu.tsv")
    write_bottomup_tsv(tsv, items)
    loaded = read_bottomup_tsv(tsv)
    np.testing.assert_allclose(loaded[0]["features"], items[0]["features"], rtol=1e-6)
    assert loaded[0]["region_tokens"] == items[0]["region_tokens"]
    n = convert_tsv_to_oriented_pickle(tsv, str(tmp_path / "bu.pickle"))
    assert n == 3
    import pickle
    data = pickle.load(open(tmp_path / "bu.pickle", "rb"))
    assert data[0]["features"].shape[1] == 32 + 6
