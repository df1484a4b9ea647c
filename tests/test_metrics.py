import json

import numpy as np
import pytest

from visitron_tpu.evaluation import Evaluator, binary_classification_metrics, cls_metric, ndtw
from visitron_tpu.graph import NavGraph


def _line_graph(n=5, spacing=2.0) -> NavGraph:
    entries = []
    for i in range(n):
        unob = [abs(i - j) == 1 for j in range(n)]
        entries.append(
            {
                "image_id": f"v{i}",
                "pose": [1, 0, 0, i * spacing, 0, 1, 0, 0.0, 0, 0, 1, 0.0, 0, 0, 0, 1],
                "included": True,
                "height": 0.0,
                "unobstructed": unob,
            }
        )
    return NavGraph.from_connectivity("line", entries)


@pytest.fixture()
def line():
    return _line_graph()


def _item(idx, path, end=None, player=None):
    return {
        "inst_idx": idx,
        "scan": "line",
        "planner_path": path,
        "player_path": player or path,
        "end_panos": end or [path[-1]],
    }


def test_perfect_trajectory(line):
    gt = [_item(0, ["v0", "v1", "v2", "v3"])]
    ev = Evaluator(gt, {"line": line})
    results = {0: [("v0", 0, 0), ("v1", 0, 0), ("v2", 0, 0), ("v3", 0, 0)]}
    s, _ = ev.score_results(results)
    assert s["success_rate"] == 1.0
    assert s["spl"] == 1.0
    assert s["nav_error"] == 0.0
    np.testing.assert_allclose(s["dist_to_end_reduction"], 6.0)
    np.testing.assert_allclose(s["ndtw"], 1.0)
    np.testing.assert_allclose(s["cls"], 1.0)
    assert s["hops"] == 3


def test_stationary_agent_goal_progress_zero(line):
    gt = [_item(0, ["v0", "v1", "v2", "v3"])]
    ev = Evaluator(gt, {"line": line})
    s, _ = ev.score_results({0: [("v0", 0, 0)]})
    assert s["dist_to_end_reduction"] == 0.0
    assert s["success_rate"] == 0.0
    assert s["spl"] == 0.0
    np.testing.assert_allclose(s["nav_error"], 6.0)


def test_overshoot_detour_spl_penalty(line):
    gt = [_item(0, ["v0", "v1", "v2"])]
    ev = Evaluator(gt, {"line": line})
    # Reaches goal but path length 8 vs shortest 4.
    traj = [("v0",0,0), ("v1",0,0), ("v2",0,0), ("v3",0,0), ("v2",0,0)]
    s, _ = ev.score_results({0: traj})
    assert s["success_rate"] == 1.0
    np.testing.assert_allclose(s["spl"], 4.0 / 8.0)
    assert s["oracle_success_rate"] == 1.0


def test_oracle_success_passing_through(line):
    # Agent passes the goal region (v2) and keeps going to v4.
    gt = [_item(0, ["v0", "v1", "v2"])]
    ev = Evaluator(gt, {"line": line})
    traj = [("v0",0,0), ("v1",0,0), ("v2",0,0), ("v3",0,0), ("v4",0,0)]
    s, _ = ev.score_results({0: traj})
    assert s["oracle_success_rate"] == 1.0
    assert s["success_rate"] == 0.0  # ends 4m away (> 3m margin)


def test_zero_length_shortest_path_spl(line):
    # Start == goal: taking no action is correct and earns SPL 1.
    gt = [_item(0, ["v1"])]
    ev = Evaluator(gt, {"line": line})
    s, _ = ev.score_results({0: [("v1", 0, 0)]})
    assert s["success_rate"] == 1.0 and s["spl"] == 1.0


def test_invalid_edge_raises(line):
    gt = [_item(0, ["v0", "v1"])]
    ev = Evaluator(gt, {"line": line})
    with pytest.raises(ValueError):
        ev.score_results({0: [("v0", 0, 0), ("v2", 0, 0)]})  # no edge v0-v2


def test_missing_trajectory_asserts(line):
    gt = [_item(0, ["v0", "v1"]), _item(1, ["v1", "v2"])]
    ev = Evaluator(gt, {"line": line})
    with pytest.raises(AssertionError):
        ev.score_results({0: [("v0", 0, 0)]})


def test_trusted_path_derivation(line):
    # Player passes planner goal after start -> trust player.
    item = _item(0, ["v0", "v1"], player=["v0", "v1", "v2"])
    ev = Evaluator([item], {"line": line}, path_type="trusted_path")
    assert ev.gt[0]["trusted_path"] == ["v0", "v1", "v2"]
    # Player misses planner goal -> trust planner.
    item = _item(1, ["v0", "v3"], player=["v0", "v1"])
    ev = Evaluator([item], {"line": line}, path_type="trusted_path")
    assert ev.gt[1]["trusted_path"] == ["v0", "v3"]


def test_ndtw_cls_match_reference_formulas(line):
    pred = ["v0", "v1", "v2"]
    ref = ["v0", "v1", "v2", "v3"]
    # Hand-rolled DP identical to eval.py:92-104.
    import numpy as np
    d = lambda a, b: abs(int(a[1]) - int(b[1])) * 2.0
    m = np.full((len(pred) + 1, len(ref) + 1), np.inf)
    m[0][0] = 0
    for i in range(1, len(pred) + 1):
        for j in range(1, len(ref) + 1):
            m[i][j] = d(pred[i - 1], ref[j - 1]) + min(m[i-1][j], m[i][j-1], m[i-1][j-1])
    expect = np.exp(-m[len(pred)][len(ref)] / (3.0 * len(ref)))
    np.testing.assert_allclose(ndtw(line, pred, ref), expect, rtol=1e-6)

    cov = np.mean([np.exp(-min(d(u, v) for v in pred) / 3.0) for u in ref])
    ref_len, pred_len = 6.0, 4.0
    expected = cov * ref_len
    score = expected / (expected + abs(expected - pred_len))
    np.testing.assert_allclose(cls_metric(line, pred, ref), cov * score, rtol=1e-6)


def test_score_file_roundtrip(tmp_path, line):
    gt = [_item(0, ["v0", "v1"])]
    ev = Evaluator(gt, {"line": line})
    out = tmp_path / "preds.json"
    out.write_text(json.dumps([{"inst_idx": 0, "trajectory": [["v0", 0, 0], ["v1", 0, 0]]}]))
    s, _ = ev.score(str(out))
    assert s["success_rate"] == 1.0


def test_classifier_metrics_vs_sklearn():
    from sklearn.metrics import (accuracy_score, balanced_accuracy_score, f1_score,
                                 matthews_corrcoef)
    rng = np.random.default_rng(3)
    y = rng.integers(0, 2, 200)
    p = np.where(rng.random(200) < 0.3, 1 - y, y)
    m = binary_classification_metrics(y, p)
    np.testing.assert_allclose(m["accuracy"], accuracy_score(y, p))
    np.testing.assert_allclose(m["f1"], f1_score(y, p))
    np.testing.assert_allclose(m["balanced_accuracy"], balanced_accuracy_score(y, p))
    np.testing.assert_allclose(m["mcc"], matthews_corrcoef(y, p), atol=1e-12)
