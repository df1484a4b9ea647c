"""Scene-feature extraction: ResNet global features for all 36 views.

Replaces scripts/precompute_resnet_img_features.py (render 36 views per
viewpoint, torchvision ResNet-152 in batches of 12, TSV output) with a
TPU-batched extractor: the jitted backbone processes whole panoramas (36
views) at once in bfloat16, and the writer emits the identical TSV schema.

Rendering is decoupled: the extractor consumes an ``image_provider`` callable
``(scan, viewpoint) -> (36, H, W, 3) float32 in [0,1]`` (pre-rendered skybox
crops, a rendering service, or the synthetic generator in tests).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from visitron_tpu import geometry as geo
from visitron_tpu.data.features import write_tsv_img_features
from visitron_tpu.models.resnet import ResNet
from visitron_tpu.utils import Timer


@dataclass
class SceneFeatureExtractor:
    params: dict
    depth: int = 152
    image_w: int = 640
    image_h: int = 480
    vfov: int = 60
    batch_views: int = 36  # whole panorama per device batch
    # Panoramas per forward: 2 (72 views) measures +11% throughput over
    # single-panorama batches on v5e (568 vs 513 frames/s, 0.40 vs 0.36 MFU);
    # 4 (144 views) regresses (XLA auto-remat near HBM).  VALIDATION.md.
    viewpoints_per_batch: int = 2
    # Conv compute dtype.  bfloat16 is 1.64x faster on v5e (914 vs 556
    # frames/s within-window) at ~2% mean feature drift; dtype=jnp.float32
    # restores exact torchvision numerical parity.  Params stay fp32 either
    # way; pooled output is always fp32 (models/resnet.py).
    dtype: object = jnp.bfloat16

    def __post_init__(self):
        self.model = ResNet(self.depth, dtype=self.dtype)

        @jax.jit
        def forward(params, images):
            return self.model.apply({"params": params}, images)

        self._forward = forward
        self._lut = None
        self._forward_faces = None

    def _faces_forward(self, face_size: int):
        """Fused on-device render + extract: (P, 6, S, S, 3) uint8 skybox
        faces -> (P*36, D) features.  Only the faces cross host->device
        (~19 MB per 2-panorama dispatch vs ~265 MB of rendered fp32 views),
        and the host does no per-pixel work at all — host-side cubemap
        resampling (~110 ms/view/core) would otherwise render-bound the
        sweep (VALIDATION.md)."""
        if self._forward_faces is None or self._lut.face_size != face_size:
            from visitron_tpu.pipelines.rendering import CubemapLUT, view_ray_grid

            vf = np.radians(self.vfov)
            rays = np.stack([
                view_ray_grid(geo.heading_of_view(v), geo.elevation_of_view(v),
                              self.image_w, self.image_h, vf)
                for v in range(geo.NUM_VIEWS)
            ])
            self._lut = CubemapLUT(rays, face_size)
            lut = self._lut

            @jax.jit
            def forward_faces(params, faces):
                views = jax.vmap(lambda f: lut.render_jax(f, dtype=self.dtype))(faces)
                views = views.reshape(-1, *views.shape[2:])
                return self.model.apply({"params": params}, views)

            self._forward_faces = forward_faces
        return self._forward_faces

    @classmethod
    def from_torch_checkpoint(cls, path: str, depth: int = 152, **kw):
        import torch

        from visitron_tpu.models.resnet import convert_torchvision_resnet

        state = torch.load(path, map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in state.items()}
        return cls(params=convert_torchvision_resnet(state, depth), depth=depth, **kw)

    @classmethod
    def random_init(cls, rng_seed: int = 0, depth: int = 50, image_hw=(64, 64), **kw):
        """Randomly initialized backbone (tests / --debug parity)."""
        model = ResNet(depth)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(rng_seed), jnp.zeros((1, *image_hw, 3)))["params"]
        return cls(params=params, depth=depth, **kw)

    def extract_viewpoint(self, images: np.ndarray) -> np.ndarray:
        """(36, H, W, 3) -> (36, 2048) float32."""
        assert images.shape[0] == geo.NUM_VIEWS
        out = self._forward(self.params, jnp.asarray(images, jnp.float32))
        return np.asarray(out, np.float32)

    def _flush(self, buf: list, features: dict, faces: bool = False) -> None:
        """Run one multi-panorama forward over the buffered viewpoints.

        The final partial batch pads with zeros to the steady-state shape so
        exactly ONE jit variant exists; padded rows are discarded.
        ``faces``: buf holds (key, (6, S, S, 3) uint8 skybox faces) and the
        render happens on device inside the same jit (_faces_forward)."""
        vpb = self.viewpoints_per_batch
        if faces:
            stack = np.stack([f for _, f in buf])  # (P, 6, S, S, 3)
            if len(buf) < vpb:
                pad = np.zeros((vpb - len(buf), *stack.shape[1:]), stack.dtype)
                stack = np.concatenate([stack, pad], axis=0)
            fwd = self._faces_forward(stack.shape[2])
            out = np.asarray(fwd(self.params, jnp.asarray(stack)), np.float32)
        else:
            for key, images in buf:
                # Same fail-fast as extract_viewpoint: a wrong view count
                # would silently shift every panorama slice in the batch.
                assert images.shape[0] == geo.NUM_VIEWS, (
                    f"{key}: expected {geo.NUM_VIEWS} views, got {images.shape[0]}")
            imgs = np.concatenate([images for _, images in buf], axis=0)
            if len(buf) < vpb:
                pad = np.zeros(((vpb - len(buf)) * geo.NUM_VIEWS, *imgs.shape[1:]),
                               imgs.dtype)
                imgs = np.concatenate([imgs, pad], axis=0)
            out = np.asarray(self._forward(self.params,
                                           jnp.asarray(imgs, jnp.float32)),
                             np.float32)
        for i, (key, _) in enumerate(buf):
            features[key] = out[i * geo.NUM_VIEWS:(i + 1) * geo.NUM_VIEWS]
        buf.clear()

    def extract_all(self, graphs: dict, image_provider, out_tsv: str | None = None,
                    log_every: int = 100, logger=None,
                    provider: str = "images") -> dict[str, np.ndarray]:
        """All (scan, viewpoint) panoramas -> {scan_vp: (36, D)}; optional TSV.

        ``provider="images"``: image_provider(scan, vp) -> (36, H, W, 3)
        float [0, 1] pre-rendered views (host rendering).
        ``provider="faces"``: image_provider(scan, vp) -> (6, S, S, 3) uint8
        skybox faces; the cubemap resample runs ON DEVICE fused with the
        backbone (identical math to SkyboxRenderer.render_views, see
        CubemapLUT) — the host's only work is JPEG decode.

        Mirrors the reference throughput accounting (render/net time per
        viewpoint, projected totals; precompute_resnet_img_features.py:270-282).
        """
        faces = provider == "faces"
        features: dict[str, np.ndarray] = {}
        render_t, net_t = Timer(), Timer()
        total = sum(g.num_viewpoints for g in graphs.values())
        done = 0
        start = time.time()
        buf: list = []
        for scan in sorted(graphs):
            g = graphs[scan]
            for vp in g.viewpoints:
                render_t.tic()
                images = image_provider(scan, vp)
                render_t.toc()
                buf.append((f"{scan}_{vp}", images))
                if len(buf) == self.viewpoints_per_batch:
                    net_t.tic()
                    self._flush(buf, features, faces=faces)
                    net_t.toc()
                done += 1
                if logger and done % log_every == 0:
                    avg_r = render_t.toc(average=True)
                    # net_t ticks once per flush of viewpoints_per_batch.
                    avg_n = (net_t.toc(average=True)
                             / max(self.viewpoints_per_batch, 1))
                    rate = done / (time.time() - start)
                    logger.info(
                        "%d/%d viewpoints; render %.3fs net %.3fs; ~%.1f h left",
                        done, total, avg_r, avg_n, (total - done) / rate / 3600)
        if buf:
            self._flush(buf, features, faces=faces)
        if out_tsv:
            write_tsv_img_features(out_tsv, features, self.image_w, self.image_h, self.vfov)
        return features
