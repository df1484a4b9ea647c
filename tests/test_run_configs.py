"""Run-config library: every experiment JSON must load as a valid RunConfig."""

import glob

from visitron_tpu.config import RunConfig


def test_all_run_configs_load():
    paths = glob.glob("run_configs/**/*.json", recursive=True)
    assert len(paths) >= 12
    for p in paths:
        cfg = RunConfig.from_json(p)
        assert cfg.output_dir
        assert cfg.path_type in ("planner_path", "player_path", "trusted_path")
        assert cfg.episode_len in (10, 40)


def test_config_override_merging():
    from visitron_tpu import run as runner
    import dataclasses, json, tempfile, os

    with tempfile.TemporaryDirectory() as d:
        base = RunConfig(num_iterations=123, path_type="player_path")
        p = os.path.join(d, "c.json")
        base.to_json(p)
        # Simulate: --config c.json --num_iterations 7
        captured = {}

        def fake_viewpoint(cfg, do_val=True):
            captured["cfg"] = cfg

        orig = runner.run_viewpoint
        runner.run_viewpoint = fake_viewpoint
        try:
            runner.main(["viewpoint", "--config", p, "--num_iterations", "7"])
        finally:
            runner.run_viewpoint = orig
        assert captured["cfg"].num_iterations == 7       # CLI override wins
        assert captured["cfg"].path_type == "player_path"  # file value kept
