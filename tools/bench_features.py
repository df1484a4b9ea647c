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
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MATTERPORT_VIEWPOINTS = 10_800
VIEWS = 36


def main() -> None:
    import jax
    import jax.numpy as jnp

    from visitron_tpu.utils.benchmark import time_fn

    device = jax.devices()[0].device_kind

    # -- scene features: ResNet-152 @ 36 x 640 x 480 -------------------------
    from visitron_tpu.models.resnet import ResNet

    params = jax.jit(ResNet(152).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 640, 3), jnp.float32))

    # Two panoramas per forward — the pipeline default
    # (SceneFeatureExtractor.viewpoints_per_batch): +11% over single-panorama
    # batches on v5e; 4 panoramas regress (XLA auto-remat near HBM).
    # dtype arms: bf16 convs (the pipeline default) vs fp32 (torchvision
    # parity).  NOTE params are fp32 in both — casting the IMAGES to bf16
    # does not give bf16 convs (flax promotes to the param dtype).
    n_views = 2 * VIEWS
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (n_views, 480, 640, 3)),
        jnp.float32)
    for tag, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        model = ResNet(152, dtype=dt)

        def scene_fwd(p, x, model=model):
            return model.apply(p, x)

        ms = time_fn(scene_fwd, params, images, n_lo=3, n_hi=13)
        fps = n_views / (ms / 1000.0)
        total_h = MATTERPORT_VIEWPOINTS * VIEWS / fps / 3600.0
        print(json.dumps({
            "metric": "scene_feature_frames_per_sec_per_chip",
            "value": round(fps, 1), "unit": "frames/s/chip",
            "view_ms": round(ms / n_views, 3), "device": device,
            "matterport_sweep_hours": round(total_h, 3),
            "model": f"resnet152_{tag}_640x480x72",
            "pipeline_default": dt is jnp.bfloat16,
        }), flush=True)

    # -- scene features, fused on-device render (production path) -----------
    # run.py extract_scene ships the six 1024x1024 uint8 skybox faces and
    # resamples them to the 72 views INSIDE the extractor jit (CubemapLUT):
    # the host only decodes JPEGs.  Host-side resampling costs ~110 ms/view
    # per core — this arm times the whole device side of the real pipeline.
    from visitron_tpu.pipelines.scene_features import SceneFeatureExtractor

    ex = SceneFeatureExtractor(params=params["params"], depth=152,
                               image_w=640, image_h=480, vfov=60)
    faces = jnp.asarray(np.random.default_rng(2).integers(
        0, 255, (2, 6, 1024, 1024, 3), dtype=np.uint8))
    fused = ex._faces_forward(1024)

    def fused_fwd(p, f):
        return fused(p["params"], f)

    ms = time_fn(fused_fwd, params, faces, n_lo=3, n_hi=13)
    fps = n_views / (ms / 1000.0)
    print(json.dumps({
        "metric": "scene_feature_frames_per_sec_per_chip",
        "value": round(fps, 1), "unit": "frames/s/chip",
        "view_ms": round(ms / n_views, 3), "device": device,
        "matterport_sweep_hours": round(
            MATTERPORT_VIEWPOINTS * VIEWS / fps / 3600.0, 3),
        "model": "resnet152_bf16_fused_cubemap_render_1024faces",
        "pipeline_default": True,
    }), flush=True)

    # -- region features: bottom-up Faster R-CNN R101 @ 600x600 --------------
    from visitron_tpu.models.detector import FasterRCNN

    dparams = jax.jit(FasterRCNN(
        depth=101, num_classes=1601, num_attributes=401, num_rois=20,
        pre_nms_top_n=6000, caffe_preproc=True, caffe_v1=True).init)(
        jax.random.PRNGKey(1), jnp.zeros((600, 600, 3), jnp.float32))
    # Arms: the pipeline default (6 views per vmapped dispatch, fp32 — the
    # batch-1 backbone is weight-traffic-bound and batching amortizes it; see
    # RegionFeatureExtractor.views_per_dispatch), the bf16-backbone opt-in
    # (--feature_extract_dtype bfloat16 — immaterial at batch 1 but +10% at
    # batch 6 once weight traffic is amortized; fp32 stays the default
    # because backbone drift can flip which boxes survive NMS), and the
    # single-image fp32 control.
    for tag, nimg, ddt in (("batch6", 6, jnp.float32),
                           ("batch6-bf16", 6, jnp.bfloat16),
                           ("single", 1, jnp.float32)):
        det = FasterRCNN(depth=101, num_classes=1601, num_attributes=401,
                         num_rois=20, pre_nms_top_n=6000,
                         caffe_preproc=True, caffe_v1=True, dtype=ddt)
        imgs = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (nimg, 600, 600, 3)),
            jnp.float32)

        def det_fwd(p, x, nimg=nimg, det=det):
            if nimg == 1:
                out = det.apply(p, x[0])
            else:
                out = jax.vmap(det.apply, in_axes=(None, 0))(p, x)
            return (out["features"], out["cls_prob"], out["attr_prob"],
                    out["boxes"])

        ms = time_fn(det_fwd, dparams, imgs, n_lo=2, n_hi=10)
        fps = nimg * 1000.0 / ms
        total_h = MATTERPORT_VIEWPOINTS * VIEWS / fps / 3600.0
        print(json.dumps({
            "metric": "region_feature_frames_per_sec_per_chip",
            "value": round(fps, 2), "unit": "frames/s/chip",
            "frame_ms": round(ms / nimg, 2), "device": device,
            "matterport_sweep_hours": round(total_h, 2),
            "model": f"fasterrcnn_r101_vg_600x600_prenms6000_rois20_{tag}",
            "pipeline_default": nimg == 6 and ddt is jnp.float32,
        }), flush=True)


if __name__ == "__main__":
    main()
