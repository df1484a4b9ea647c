"""Skybox cubemap renderer: sampler ground truth, face orientation, intrinsics
consistency, and the Matterport-layout file provider."""

import numpy as np
import pytest

from visitron_tpu import geometry as geo
from visitron_tpu.pipelines.rendering import (
    FACES, SKYBOX_FACE_INDEX, SkyboxRenderer, rasterize_cubemap,
    sample_cubemap, view_ray_grid)


def _smooth_color(d):
    return np.stack([0.5 + 0.4 * d[..., 0],
                     0.5 + 0.4 * d[..., 1],
                     0.5 + 0.4 * d[..., 2]], axis=-1)


def test_sampler_matches_analytic_ground_truth():
    """Rasterize an analytic cubemap, re-sample it through every one of the 36
    discretized views, compare to evaluating the function on the rays."""
    faces = rasterize_cubemap(_smooth_color, size=128)
    for v in [0, 7, 12, 18, 30, 35]:
        rays = view_ray_grid(geo.heading_of_view(v), geo.elevation_of_view(v),
                             64, 48, np.radians(60))
        got = sample_cubemap(faces, rays)
        want = _smooth_color(rays)
        assert np.max(np.abs(got - want)) < 5e-3, v


def test_face_orientation():
    """Axis rays hit the right face; headings map to the compass faces."""
    colors = np.zeros((6, 8, 8, 3), np.float32)
    for i in range(6):
        colors[i] = (i + 1) / 10.0
    by_face = {name: (i + 1) / 10.0 for i, name in enumerate(FACES)}

    def at(d):
        return sample_cubemap(colors, np.asarray(d, np.float32))[0]

    assert at([1, 0, 0]) == pytest.approx(by_face["+x"])
    assert at([0, 1, 0]) == pytest.approx(by_face["+y"])
    assert at([0, 0, 1]) == pytest.approx(by_face["+z"])
    assert at([0, 0, -1]) == pytest.approx(by_face["-z"])
    # Heading 0 = north (+y); heading 90deg = east (+x)  (geometry.py
    # heading-from-north convention).
    for view, face in [(12, "+y"), (15, "+x"), (18, "-y"), (21, "-x")]:
        rays = view_ray_grid(geo.heading_of_view(view), 0.0, 9, 9, np.radians(60))
        center = sample_cubemap(colors, rays[4, 4])
        assert center[0] == pytest.approx(by_face[face]), view


def test_rays_consistent_with_box_orientation_intrinsics():
    """A pixel's ray heading/elevation must match ops.detection.box_orientation
    run on a degenerate box centred at that pixel (same pinhole model)."""
    from visitron_tpu.ops.detection import box_orientation

    w, h, vfov = 640, 480, 60.0
    view = 14  # heading 60deg, elevation 0
    hd, el = geo.heading_of_view(view), geo.elevation_of_view(view)
    rays = view_ray_grid(hd, el, w, h, np.radians(vfov))
    for (py, px) in [(240, 320), (100, 50), (430, 600)]:
        d = rays[py, px]
        ray_heading = np.arctan2(d[0], d[1])  # clockwise from north
        ray_elev = np.arcsin(np.clip(d[2], -1, 1))
        cx, cy = px + 0.5, py + 0.5
        boxes = np.array([[cx, cy, cx, cy]], np.float32)
        bh, be = box_orientation(boxes, hd, el, w, h, vfov)
        # Headings agree exactly (same atan2((cx-W/2)/foc) model).  Elevations
        # agree at the image centre; off-axis the reference approximates the
        # two angle offsets as independent, drifting a few degrees at the
        # corners — we bound that known gap rather than hide it.
        assert abs(geo.normalize_angle(ray_heading - bh[0, 0])) < np.radians(0.01)
        assert abs(ray_elev - be[0, 0]) < np.radians(5.0)
    # Exact agreement at the optical axis.
    d = rays[240, 320]
    bh, be = box_orientation(np.array([[320.5, 240.5, 320.5, 240.5]], np.float32),
                             hd, el, w, h, vfov)
    assert abs(np.arcsin(d[2]) - be[0, 0]) < np.radians(0.01)


def test_skybox_renderer_from_files(tmp_path):
    """End-to-end: write Matterport-layout skybox JPEGs, render 36 views."""
    from PIL import Image

    scan, vp = "scanA", "vp0001"
    d = tmp_path / scan / "matterport_skybox_images"
    d.mkdir(parents=True)
    face_rgb = {}
    for name, idx in SKYBOX_FACE_INDEX.items():
        rgb = np.zeros((32, 32, 3), np.uint8)
        rgb[..., 0] = 40 * (idx + 1)
        face_rgb[name] = rgb[0, 0].astype(np.float32) / 255.0
        Image.fromarray(rgb).save(str(d / f"{vp}_skybox{idx}_sami.jpg"), quality=95)

    r = SkyboxRenderer(str(tmp_path), image_w=64, image_h=48, vfov=60)
    views = r(scan, vp)
    assert views.shape == (36, 48, 64, 3)
    assert views.dtype == np.float32
    assert 0.0 <= views.min() and views.max() <= 1.0
    # Center pixel of the level north/east/south/west views hits the matching
    # compass face (JPEG-lossy tolerance).
    for view, name in [(12, "+y"), (15, "+x"), (18, "-y"), (21, "-x")]:
        got = views[view, 24, 32]
        assert np.max(np.abs(got - face_rgb[name])) < 0.05, (view, name)


@pytest.mark.slow
def test_renderer_feeds_scene_feature_extractor(tmp_path):
    """The renderer satisfies the image_provider contract of the scene
    pipeline (pipelines/scene_features.py)."""
    from PIL import Image

    from visitron_tpu.pipelines.scene_features import SceneFeatureExtractor

    class _OneVp:
        viewpoints = ["v1"]
        num_viewpoints = 1

    scan, vp = "s1", "v1"
    d = tmp_path / scan / "matterport_skybox_images"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for idx in range(6):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            str(d / f"{vp}_skybox{idx}_sami.jpg"))

    renderer = SkyboxRenderer(str(tmp_path), image_w=32, image_h=32, vfov=60)
    ex = SceneFeatureExtractor.random_init(depth=50, image_hw=(32, 32),
                                           image_w=32, image_h=32)
    feats = ex.extract_all({scan: _OneVp()}, renderer)
    assert feats[f"{scan}_{vp}"].shape == (36, 2048)


@pytest.mark.slow
def test_extract_cli_end_to_end(tmp_path):
    """run.py extract_scene + extract_regions drive skybox files through the
    full offline pipeline (rendering -> network -> store)."""
    import json

    from PIL import Image

    from visitron_tpu import run as runner
    from visitron_tpu.config import RunConfig
    from visitron_tpu.data.features import RegionFeatureStore, read_tsv_img_features

    # One-scan world: 2 viewpoints, connectivity + skyboxes on disk.
    conn = tmp_path / "conn"
    conn.mkdir()
    entries = [
        {"image_id": "vpA", "pose": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1],
         "included": True, "unobstructed": [False, True], "height": 1.5},
        {"image_id": "vpB", "pose": [1, 0, 0, 2.0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1],
         "included": True, "unobstructed": [True, False], "height": 1.5},
    ]
    (conn / "sc1_connectivity.json").write_text(json.dumps(entries))
    rng = np.random.default_rng(0)
    sky = tmp_path / "mp" / "sc1" / "matterport_skybox_images"
    sky.mkdir(parents=True)
    for vp in ("vpA", "vpB"):
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
                str(sky / f"{vp}_skybox{i}_sami.jpg"))

    out = tmp_path / "out"
    cfg = RunConfig(debug=True, connectivity_dir=str(conn),
                    matterport_dir=str(tmp_path / "mp"), output_dir=str(out),
                    img_feature_file=str(out / "scene.tsv"),
                    region_feature_prefix=str(out / "regions"))
    out.mkdir()
    runner.run_extract_scene(cfg)
    feats = read_tsv_img_features(str(out / "scene.tsv"), 2048)["features"]
    assert feats["sc1_vpA"].shape == (36, 2048)
    runner.run_extract_regions(cfg)
    store = RegionFeatureStore.from_pickle(str(out / "regions"))
    assert len(store) == 2 * 36
    k = b"sc1_vpA_0"
    assert store[k].shape[1] == 2048 + 6
    assert len(store.get_region_tokens(k)) == store[k].shape[0]


def test_cubemap_lut_matches_sampler():
    """CubemapLUT precomputes exactly sample_cubemap's math (host parity) and
    render_jax reproduces SkyboxRenderer.render_views on device arrays."""
    import jax.numpy as jnp

    from visitron_tpu.pipelines.rendering import CubemapLUT

    rng = np.random.default_rng(0)
    faces = rng.integers(0, 255, (6, 32, 32, 3), dtype=np.uint8)
    rays = np.stack([
        view_ray_grid(h * np.pi / 6, e * np.pi / 6, 20, 16, np.radians(60))
        for h in range(12) for e in (-1, 0, 1)
    ])
    lut = CubemapLUT(rays, 32)
    ref = sample_cubemap(faces, rays)
    got = lut.render_np(faces)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)
    dev = np.asarray(lut.render_jax(jnp.asarray(faces)))
    np.testing.assert_allclose(dev, ref / 255.0, rtol=0, atol=1e-5)
    # Leading batch dim preserved.
    two = np.asarray(lut.render_jax(jnp.asarray(np.stack([faces, faces]))))
    assert two.shape == (2, *rays.shape[:-1], 3)
    np.testing.assert_allclose(two[0], dev, atol=0)


def test_scene_extractor_faces_mode_matches_images_mode(tmp_path):
    """provider="faces" (device-fused render) == provider="images" (host
    render) at fp32 on the same skybox."""
    from PIL import Image

    from visitron_tpu.pipelines.scene_features import SceneFeatureExtractor
    import jax.numpy as jnp

    class _OneVp:
        viewpoints = ["v1"]
        num_viewpoints = 1

    scan, vp = "s1", "v1"
    d = tmp_path / scan / "matterport_skybox_images"
    d.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for idx in range(6):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            str(d / f"{vp}_skybox{idx}_sami.jpg"))

    renderer = SkyboxRenderer(str(tmp_path), image_w=32, image_h=32, vfov=60)
    ex = SceneFeatureExtractor.random_init(depth=50, image_hw=(32, 32),
                                           image_w=32, image_h=32,
                                           vfov=60, dtype=jnp.float32)
    by_images = ex.extract_all({scan: _OneVp()}, renderer)
    by_faces = ex.extract_all({scan: _OneVp()}, renderer.load_faces,
                              provider="faces")
    a, b = by_images[f"{scan}_{vp}"], by_faces[f"{scan}_{vp}"]
    assert a.shape == b.shape == (36, 2048)
    denom = np.sqrt(np.mean(a ** 2)) + 1e-8
    assert np.max(np.abs(a - b)) / denom < 1e-4
