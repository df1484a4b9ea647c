"""Feature-extraction throughput on the real TPU (BASELINE.md north star).

Measures frames/s/chip with the on-device timing harness for both offline
pipelines at production shapes:

  * scene: ResNet-152 global-pool features over 36 panorama views at
    640x480 (precompute_resnet_img_features.py:175-283 protocol; the
    reference logs avg per-100-viewpoint wall time on a 4-GPU Pool,
    :270-282, 329-331);
  * regions: bottom-up Faster R-CNN ResNet-101 (1601 classes / 401
    attributes, pre-NMS 6000, 20 ROIs — the reference clamps 1..20 boxes,
    precompute_bottom-up_features.py:199-203) on a 600x600 image
    (Caffe TEST.SCALE 600), per view.

Weights are random (identical FLOPs/memory behavior to converted weights).
Prints one JSON line per pipeline with frames/s/chip and projected hours for
the full Matterport sweep (10,800 viewpoints x 36 views — the reference's
own accounting at :410-420).

``measure_scene_device`` / ``measure_scene_fused`` / ``measure_regions`` are
importable single-configuration probes (bench.py's ``secondary`` block reuses
them so the driver's BENCH_r*.json records these north stars officially).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MATTERPORT_VIEWPOINTS = 10_800
VIEWS = 36


def _scene_params():
    import jax
    import jax.numpy as jnp

    from visitron_tpu.models.resnet import ResNet

    return jax.jit(ResNet(152).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 640, 3), jnp.float32))


def measure_scene_device(dtype: str = "bf16", params=None) -> dict:
    """ResNet-152 over 72 pre-rendered 640x480 views (2 panoramas/forward —
    the pipeline default; +11% over single-panorama on v5e, 4 regress).
    ``dtype`` bf16 = the pipeline default convs; fp32 = torchvision parity.
    NOTE params stay fp32 either way — casting the IMAGES to bf16 does not
    give bf16 convs (flax promotes to the param dtype)."""
    import jax
    import jax.numpy as jnp

    from visitron_tpu.models.resnet import ResNet
    from visitron_tpu.utils.benchmark import time_fn

    if params is None:
        params = _scene_params()
    n_views = 2 * VIEWS
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (n_views, 480, 640, 3)),
        jnp.float32)
    model = ResNet(152, dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32)

    def scene_fwd(p, x):
        return model.apply(p, x)

    ms = time_fn(scene_fwd, params, images, n_lo=3, n_hi=13)
    fps = n_views / (ms / 1000.0)
    return {
        "metric": "scene_feature_frames_per_sec_per_chip",
        "value": round(fps, 1), "unit": "frames/s/chip",
        "view_ms": round(ms / n_views, 3),
        "device": jax.devices()[0].device_kind,
        "matterport_sweep_hours": round(
            MATTERPORT_VIEWPOINTS * VIEWS / fps / 3600.0, 3),
        "model": f"resnet152_{dtype}_640x480x72",
        "pipeline_default": dtype == "bf16",
    }


def measure_scene_fused(params=None) -> dict:
    """The production path end-to-end device side: six 1024x1024 uint8 skybox
    faces resampled to 72 views INSIDE the extractor jit (CubemapLUT) +
    ResNet-152 — the host only decodes JPEGs (run.py extract_scene).
    Host-side resampling would cost ~110 ms/view per core."""
    import jax
    import jax.numpy as jnp

    from visitron_tpu.pipelines.scene_features import SceneFeatureExtractor
    from visitron_tpu.utils.benchmark import time_fn

    if params is None:
        params = _scene_params()
    ex = SceneFeatureExtractor(params=params["params"], depth=152,
                               image_w=640, image_h=480, vfov=60)
    faces = jnp.asarray(np.random.default_rng(2).integers(
        0, 255, (2, 6, 1024, 1024, 3), dtype=np.uint8))
    fused = ex._faces_forward(1024)

    def fused_fwd(p, f):
        return fused(p["params"], f)

    n_views = 2 * VIEWS
    ms = time_fn(fused_fwd, params, faces, n_lo=3, n_hi=13)
    fps = n_views / (ms / 1000.0)
    return {
        "metric": "scene_feature_frames_per_sec_per_chip",
        "value": round(fps, 1), "unit": "frames/s/chip",
        "view_ms": round(ms / n_views, 3),
        "device": jax.devices()[0].device_kind,
        "matterport_sweep_hours": round(
            MATTERPORT_VIEWPOINTS * VIEWS / fps / 3600.0, 3),
        "model": "resnet152_bf16_fused_cubemap_render_1024faces",
        "pipeline_default": True,
    }


def measure_regions(tag: str = "batch6") -> dict:
    """Bottom-up Faster R-CNN R101 @ 600x600.  Arms: the pipeline default
    (6 views per vmapped dispatch, fp32 — the batch-1 backbone is
    weight-traffic-bound and batching amortizes it), the bf16-backbone
    opt-in (+10% at batch 6; fp32 stays default because backbone drift can
    flip which boxes survive NMS), and the single-image fp32 control.
    Keep dispatches small: batch 12 regresses (HBM), batch 18 once crashed
    the relay worker."""
    import jax
    import jax.numpy as jnp

    from visitron_tpu.models.detector import FasterRCNN
    from visitron_tpu.utils.benchmark import time_fn

    nimg, ddt = {"batch6": (6, jnp.float32),
                 "batch6-bf16": (6, jnp.bfloat16),
                 "single": (1, jnp.float32)}[tag]
    dparams = jax.jit(FasterRCNN(
        depth=101, num_classes=1601, num_attributes=401, num_rois=20,
        pre_nms_top_n=6000, caffe_preproc=True, caffe_v1=True).init)(
        jax.random.PRNGKey(1), jnp.zeros((600, 600, 3), jnp.float32))
    det = FasterRCNN(depth=101, num_classes=1601, num_attributes=401,
                     num_rois=20, pre_nms_top_n=6000,
                     caffe_preproc=True, caffe_v1=True, dtype=ddt)
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (nimg, 600, 600, 3)),
        jnp.float32)

    def det_fwd(p, x):
        if nimg == 1:
            out = det.apply(p, x[0])
        else:
            out = jax.vmap(det.apply, in_axes=(None, 0))(p, x)
        return (out["features"], out["cls_prob"], out["attr_prob"],
                out["boxes"])

    ms = time_fn(det_fwd, dparams, imgs, n_lo=2, n_hi=10)
    fps = nimg * 1000.0 / ms
    return {
        "metric": "region_feature_frames_per_sec_per_chip",
        "value": round(fps, 2), "unit": "frames/s/chip",
        "frame_ms": round(ms / nimg, 2),
        "device": jax.devices()[0].device_kind,
        "matterport_sweep_hours": round(
            MATTERPORT_VIEWPOINTS * VIEWS / fps / 3600.0, 2),
        "model": f"fasterrcnn_r101_vg_600x600_prenms6000_rois20_{tag}",
        "pipeline_default": tag == "batch6",
    }


def main() -> None:
    params = _scene_params()
    for dtype in ("bf16", "fp32"):
        print(json.dumps(measure_scene_device(dtype, params=params)), flush=True)
    print(json.dumps(measure_scene_fused(params=params)), flush=True)
    for tag in ("batch6", "batch6-bf16", "single"):
        print(json.dumps(measure_regions(tag)), flush=True)


if __name__ == "__main__":
    main()
