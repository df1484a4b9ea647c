"""Region-feature (bottom-up) extraction pipeline.

Structure-parity with scripts/precompute_bottom-up_features.py: for every
(scan, viewpoint, view) render, a detector proposes boxes with class/attribute
distributions and pooled features; host post-processing applies per-class NMS
confidence pooling, box-count clamping, per-box heading/elevation from
intrinsics, greedy angular-feature dedup to 10 boxes, and region-token
extraction.  Output: the reference pickle layout (RegionFeatureStore) plus the
orientation-appended 2054-d features (scripts/add_orientation_to_features.py).

The detector is pluggable via the ``RegionDetector`` protocol.  The reference
uses a Caffe Faster R-CNN (ResNet-101, Visual Genome); production parity
requires converting those weights into ``ResNetDetector`` — this module ships
the full surrounding pipeline and a deterministic ``StubDetector`` so the
pipeline is exercised end-to-end without them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Protocol

import numpy as np

from visitron_tpu import geometry as geo
from visitron_tpu.data.features import RegionFeatureStore
from visitron_tpu.ops import detection as det


class RegionDetector(Protocol):
    num_classes: int
    num_attributes: int
    feature_dim: int

    def __call__(self, image: np.ndarray) -> dict:
        """image (H, W, 3) -> {"boxes" (N,4), "cls_prob" (N,C), "attr_prob"
        (N,A), "features" (N,D)}."""
        ...


@dataclass
class StubDetector:
    """Deterministic pseudo-detector (pipeline tests / --debug parity)."""

    num_classes: int = 12
    num_attributes: int = 5
    feature_dim: int = 2048
    boxes_per_image: int = 24
    seed: int = 0

    def __call__(self, image: np.ndarray) -> dict:
        h, w = image.shape[:2]
        # Deterministic per-image rng from content.
        key = int(np.abs(image).sum() * 1000) % (2**31)
        rng = np.random.default_rng(self.seed + key)
        n = self.boxes_per_image
        x1 = rng.uniform(0, w * 0.7, n)
        y1 = rng.uniform(0, h * 0.7, n)
        bw = rng.uniform(w * 0.1, w * 0.3, n)
        bh = rng.uniform(h * 0.1, h * 0.3, n)
        boxes = np.stack([x1, y1, np.minimum(x1 + bw, w - 1),
                          np.minimum(y1 + bh, h - 1)], axis=1).astype(np.float32)
        cls_prob = rng.dirichlet(np.ones(self.num_classes), n).astype(np.float32)
        attr_prob = rng.dirichlet(np.ones(self.num_attributes), n).astype(np.float32)
        feats = rng.standard_normal((n, self.feature_dim)).astype(np.float32)
        return {"boxes": boxes, "cls_prob": cls_prob, "attr_prob": attr_prob,
                "features": feats}


@dataclass
class RegionFeatureExtractor:
    detector: RegionDetector
    classes: list[str]       # index 0 = __background__
    attributes: list[str]    # index 0 = __no_attribute__
    image_w: int = 600
    image_h: int = 600
    vfov: int = 80
    max_total_boxes: int = det.MAX_TOTAL_BOXES
    # Views per device dispatch (vmapped detector).  6 is the v5e sweet spot
    # measured with the lazy-row NMS: 441-463 vs 314 frames/s single-image
    # (the batch-1 backbone is weight-traffic-bound; batching amortizes it,
    # 1.82 -> 1.13 ms/frame).  12 regresses (272 f/s, HBM pressure from the
    # stacked backbone activations) and 18+ crashed the TPU worker in this
    # environment — keep dispatches small.  Set 1 to force the single-image
    # path (e.g. detectors without detect_batch fall back automatically).
    # dtype x batch interaction (one-window probe): a bf16 backbone is
    # immaterial at batch 1 but +10% at batch 6 (503 vs 459 f/s) once weight
    # traffic is amortized — opt in via --feature_extract_dtype bfloat16;
    # fp32 stays the default because backbone drift can flip NMS survivors.
    views_per_dispatch: int = 6

    def extract_view(self, image: np.ndarray, view_heading: float,
                     view_elevation: float) -> dict:
        """One rendered view -> deduped record with <=10 boxes, tokens and
        orientation-appended features."""
        return self._postprocess(self.detector(image), view_heading,
                                 view_elevation)

    def _postprocess(self, raw: dict, view_heading: float,
                     view_elevation: float) -> dict:
        keep = det.select_boxes(raw["boxes"], raw["cls_prob"])
        rec = {
            "boxes": raw["boxes"][keep],
            "cls_prob": raw["cls_prob"][keep],
            "attr_prob": raw["attr_prob"][keep],
            "features": raw["features"][keep],
        }
        rec["featureHeading"], rec["featureElevation"] = det.box_orientation(
            rec["boxes"], view_heading, view_elevation,
            self.image_w, self.image_h, self.vfov)
        det.dedup_boxes(rec, self.max_total_boxes)
        rec["region_tokens"] = det.region_tokens(
            rec["cls_prob"], rec["attr_prob"], self.classes, self.attributes)
        rec["features"] = det.append_orientation(
            rec["features"], rec["boxes"], self.image_w, self.image_h)
        return rec

    def _render_fn(self, face_size: int):
        """Device cubemap render for provider="faces": (6, S, S, 3) uint8 ->
        (36, H, W, 3) float32 views, one dispatch, output stays on device
        for the detector (host resampling costs ~110 ms/view/core and would
        render-bound the sweep; see CubemapLUT / VALIDATION.md)."""
        cached = getattr(self, "_render_jit", None)
        if cached is None or self._render_face_size != face_size:
            import math

            import jax
            import jax.numpy as jnp

            from visitron_tpu.pipelines.rendering import CubemapLUT, view_ray_grid

            rays = np.stack([
                view_ray_grid(geo.heading_of_view(v), geo.elevation_of_view(v),
                              self.image_w, self.image_h,
                              math.radians(self.vfov))
                for v in range(geo.NUM_VIEWS)
            ])
            lut = CubemapLUT(rays, face_size)
            self._render_jit = jax.jit(
                lambda f: lut.render_jax(f, dtype=jnp.float32))
            self._render_face_size = face_size
        return self._render_jit

    def extract_all(self, graphs: dict, image_provider: Callable,
                    provider: str = "images") -> RegionFeatureStore:
        """image_provider(scan, vp) -> (36, H, W, 3) views ("images" mode) or
        (6, S, S, 3) uint8 skybox faces ("faces" mode: the cubemap resample
        runs on device, identical math to SkyboxRenderer); returns the store
        keyed ``scan_vp_viewIdx`` (reference FeaturesReader layout)."""
        features: dict[bytes, np.ndarray] = {}
        tokens: dict[bytes, list[str]] = {}
        detect_batch = (getattr(self.detector, "detect_batch", None)
                        if self.views_per_dispatch > 1 else None)
        for scan in sorted(graphs):
            g = graphs[scan]
            for vp in g.viewpoints:
                pano = image_provider(scan, vp)
                if provider == "faces":
                    import jax.numpy as jnp

                    pano = self._render_fn(pano.shape[1])(jnp.asarray(pano))
                    if detect_batch is None:
                        pano = np.asarray(pano)
                if detect_batch is not None:
                    # Keep views_per_dispatch a divisor of 36 — a ragged
                    # final slice would compile a second jit variant.
                    raws = [r for s in range(0, geo.NUM_VIEWS,
                                             self.views_per_dispatch)
                            for r in detect_batch(
                                pano[s:s + self.views_per_dispatch])]
                else:
                    raws = [self.detector(pano[view])
                            for view in range(geo.NUM_VIEWS)]
                for view, raw in enumerate(raws):
                    rec = self._postprocess(
                        raw, geo.heading_of_view(view),
                        geo.elevation_of_view(view))
                    key = f"{scan}_{vp}_{view}".encode()
                    features[key] = rec["features"]
                    tokens[key] = rec["region_tokens"]
        return RegionFeatureStore(features, tokens, self.image_w, self.image_h, self.vfov)


def verify_region_store(path_prefix: str) -> dict:
    """Round-trip sanity check of a written store
    (scripts/verify_bottom-up_features_in_python3.py parity)."""
    store = RegionFeatureStore.from_pickle(path_prefix)
    assert len(store) > 0
    key = store.keys[0]
    feats = store[key]
    toks = store.get_region_tokens(key)
    assert feats.ndim == 2 and feats.shape[0] == len(toks)
    assert np.isfinite(feats).all()
    return {"num_keys": len(store), "feature_dim": int(feats.shape[1]),
            "boxes_first": int(feats.shape[0])}
