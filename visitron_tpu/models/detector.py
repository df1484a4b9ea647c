"""Bottom-up-attention Faster R-CNN (ResNet-C4) for region features, in flax.

Replaces the reference's external Caffe detector
(scripts/precompute_bottom-up_features.py:33-41: Faster R-CNN ResNet-101
trained on Visual Genome — 1601 object classes, 401 attributes;
detection at :177-231).  Architecture parity with the public
bottom-up-attention network, re-expressed with static shapes so the whole
image->regions path is ONE jitted XLA program:

  * ResNet conv1..conv4 backbone (stride 16) — shared with models/resnet.py;
  * RPN: 3x3/512 conv + 2A objectness + 4A deltas over A=12 anchors
    (scales 4,8,16,32 x ratios 0.5,1,2 — the VG config);
  * proposal selection: top-K pre-NMS, fixed-iteration NMS at 0.7, top
    ``num_rois`` kept (fixed, padded by lowest-score boxes);
  * per-ROI head: ROI-align 14x14 on C4, conv5 stage, global pool -> 2048-d
    pool5 features (exactly the vector the reference extracts, :205).
    Documented deviation: the caffe net uses quantizing ROIPooling (max);
    bilinear ROI-align is the strictly-more-accurate successor (Mask R-CNN
    §3) and is gather-friendly on TPU — features from converted weights
    differ slightly at box edges but rank/semantics are preserved;
  * heads: 1601-way softmax, class-conditioned attribute branch (class
    embedding 256 ⧺ pool5 -> fc 512 -> 401-way softmax), and the (unused for
    extraction) per-class bbox regression, matching the Caffe net.

Like the reference extraction (:212: ``cls_boxes = rois[:, 1:5]``), the
returned boxes are the RPN proposals, not regressed boxes.

Weights: ``convert_caffe_bottomup`` maps a {caffe_layer: array} dump of the
published VG .caffemodel (res*/bn*/scale* merged, rpn_*, cls_score,
cls_embedding, fc_attr, attr_score) onto this module;
``BottomUpDetector.random_init`` gives a runnable randomly-initialized
detector for tests and --debug runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from visitron_tpu.models.resnet import Bottleneck, FrozenBatchNorm, STAGE_BLOCKS, _conv

VG_CLASSES = 1601
VG_ATTRIBUTES = 401
ANCHOR_SCALES = (4, 8, 16, 32)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
FEAT_STRIDE = 16
RPN_PRE_NMS_TOP_N = 6000
RPN_NMS_THRESH = 0.7
RPN_MIN_SIZE = 16.0


def generate_anchors(base_size: int = 16, ratios=ANCHOR_RATIOS,
                     scales=ANCHOR_SCALES) -> np.ndarray:
    """Base anchor windows, exact py-faster-rcnn ``generate_anchors`` math
    (integer-rounded ratio enumeration)."""
    base = np.array([0, 0, base_size - 1, base_size - 1], np.float64)

    def whctrs(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mkanchors(ws, hs, x, y):
        ws, hs = ws[:, None], hs[:, None]
        return np.hstack([x - 0.5 * (ws - 1), y - 0.5 * (hs - 1),
                          x + 0.5 * (ws - 1), y + 0.5 * (hs - 1)])

    w, h, x, y = whctrs(base)
    size_ratios = (w * h) / np.asarray(ratios, np.float64)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(ratios))
    ratio_anchors = mkanchors(ws, hs, x, y)
    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, x, y = whctrs(ratio_anchors[i])
        ws = w * np.asarray(scales, np.float64)
        hs = h * np.asarray(scales, np.float64)
        out.append(mkanchors(ws, hs, x, y))
    return np.vstack(out).astype(np.float32)


def shifted_anchors(fh: int, fw: int, stride: int = FEAT_STRIDE,
                    ratios=ANCHOR_RATIOS, scales=ANCHOR_SCALES) -> np.ndarray:
    """All anchors of an (fh, fw) feature map: (fh*fw*A, 4), A-fastest order
    (matches the (H, W, A*4) conv output reshape)."""
    base = generate_anchors(ratios=ratios, scales=scales)  # (A, 4)
    sx = np.arange(fw, dtype=np.float32) * stride
    sy = np.arange(fh, dtype=np.float32) * stride
    shift = np.stack(np.broadcast_arrays(
        sx[None, :], sy[:, None], sx[None, :], sy[:, None]), axis=-1)  # (fh, fw, 4)
    anchors = shift[:, :, None, :] + base[None, None, :, :]
    return anchors.reshape(-1, 4)


# py-faster-rcnn BBOX_XFORM_CLIP: cap dw/dh so exp() cannot overflow.
BBOX_XFORM_CLIP = float(np.log(1000.0 / 16.0))


def decode_boxes(anchors, deltas):
    """bbox_transform_inv: (N, 4) anchors + (N, 4) (dx, dy, dw, dh) -> boxes."""
    w = anchors[:, 2] - anchors[:, 0] + 1.0
    h = anchors[:, 3] - anchors[:, 1] + 1.0
    cx = anchors[:, 0] + 0.5 * w
    cy = anchors[:, 1] + 0.5 * h
    pcx = deltas[:, 0] * w + cx
    pcy = deltas[:, 1] * h + cy
    pw = jnp.exp(jnp.minimum(deltas[:, 2], BBOX_XFORM_CLIP)) * w
    ph = jnp.exp(jnp.minimum(deltas[:, 3], BBOX_XFORM_CLIP)) * h
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw - 1.0, pcy + 0.5 * ph - 1.0], axis=1)


def clip_boxes(boxes, height, width):
    return jnp.stack([
        jnp.clip(boxes[:, 0], 0, width - 1), jnp.clip(boxes[:, 1], 0, height - 1),
        jnp.clip(boxes[:, 2], 0, width - 1), jnp.clip(boxes[:, 3], 0, height - 1),
    ], axis=1)


def _iou_matrix(boxes):
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(0.0, xx2 - xx1 + 1) * jnp.maximum(0.0, yy2 - yy1 + 1)
    return inter / (area[:, None] + area[None, :] - inter)


def nms_fixed(boxes, scores, iou_thresh: float, max_out: int):
    """Greedy NMS with static shapes: returns (max_out,) indices (descending
    score; when fewer boxes survive, remaining slots hold the best suppressed
    boxes so downstream shapes stay fixed — their scores are returned too).

    Only ``max_out`` IOU ROWS are ever needed (one per greedy pick), so each
    row is computed on the fly inside the loop instead of materializing the
    (N, N) matrix — at the detector's N=6000 the matrix is 144 MB of HBM
    traffic per image and was 6x slower on v5e (0.35 vs 0.06 ms), and under
    ``vmap`` it scaled with the batch and made batched detection HBM-bound."""
    neg = jnp.finfo(jnp.float32).min
    boxes = jnp.asarray(boxes)  # row gathers below index with traced i
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)

    def body(_, carry):
        live_scores, kept_idx, kept_scores, step = carry
        i = jnp.argmax(live_scores)
        s = live_scores[i]
        kept_idx = kept_idx.at[step].set(i)
        kept_scores = kept_scores.at[step].set(s)
        xx1 = jnp.maximum(x1, x1[i])
        yy1 = jnp.maximum(y1, y1[i])
        xx2 = jnp.minimum(x2, x2[i])
        yy2 = jnp.minimum(y2, y2[i])
        inter = (jnp.maximum(0.0, xx2 - xx1 + 1)
                 * jnp.maximum(0.0, yy2 - yy1 + 1))
        iou_row = inter / (area + area[i] - inter)
        live_scores = jnp.where(iou_row > iou_thresh, neg, live_scores)
        live_scores = live_scores.at[i].set(neg)
        return live_scores, kept_idx, kept_scores, step + 1

    init = (scores.astype(jnp.float32), jnp.zeros(max_out, jnp.int32),
            jnp.full(max_out, neg, jnp.float32), 0)
    _, kept_idx, kept_scores, _ = jax.lax.fori_loop(0, max_out, body, init)
    return kept_idx, kept_scores


def roi_align(feat, boxes, out_size: int, stride: float = FEAT_STRIDE):
    """Bilinear ROI align: feat (H, W, C), boxes (N, 4) in image coords ->
    (N, out, out, C).  One sample per bin (centre), XLA-gather friendly."""
    h, w, c = feat.shape
    x1, y1, x2, y2 = (boxes[:, i] / stride for i in range(4))
    bw = jnp.maximum(x2 - x1, 1e-3)
    bh = jnp.maximum(y2 - y1, 1e-3)
    grid = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    xs = x1[:, None] + grid[None, :] * bw[:, None]  # (N, out)
    ys = y1[:, None] + grid[None, :] * bh[:, None]
    xs = jnp.clip(xs, 0.0, w - 1.000001)
    ys = jnp.clip(ys, 0.0, h - 1.000001)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    fx = (xs - x0)[:, None, :, None]   # (N, 1, out, 1)
    fy = (ys - y0)[:, :, None, None]   # (N, out, 1, 1)
    x0 = jnp.minimum(x0, w - 2)
    y0 = jnp.minimum(y0, h - 2)

    def gather(yi, xi):
        return feat[yi[:, :, None], xi[:, None, :]]  # (N, out, out, C)

    p00 = gather(y0, x0)
    p01 = gather(y0, x0 + 1)
    p10 = gather(y0 + 1, x0)
    p11 = gather(y0 + 1, x0 + 1)
    return (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy + p11 * fx * fy)


# Caffe bottom-up-attention preprocessing: BGR, 0-255 pixel means.
CAFFE_PIXEL_MEANS = np.array([102.9801, 115.9465, 122.7717], np.float32)


class ConvBody(nn.Module):
    """ResNet conv1..conv4 (C4 feature, stride 16); layer naming shared with
    models/resnet.py so the torchvision/caffe converters apply.

    ``caffe_preproc``: the published VG weights were trained on BGR images
    minus per-channel pixel means (no std); torch-style weights use
    [0,1]-RGB ImageNet normalization.
    """

    depth: int = 101
    caffe_preproc: bool = False
    caffe_v1: bool = False
    # Compute dtype for the backbone convs (fp32 default = exact caffe/torch
    # parity; bf16 doubles MXU throughput at a small feature drift — see
    # models/resnet.py).  Output feature map is cast back to fp32 so the RPN
    # logits and box regression numerics are dtype-independent.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from visitron_tpu.models.resnet import IMAGENET_MEAN, IMAGENET_STD

        blocks = STAGE_BLOCKS[self.depth]
        if self.caffe_preproc:
            x = x[..., ::-1] * 255.0 - CAFFE_PIXEL_MEANS
        else:
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = FrozenBatchNorm(64, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        # caffe pool1 is k3 s2 pad0 ceil-mode (windows anchored at pixel 0,
        # implicit bottom/right pad); torch-style is pad1 both sides.  Same
        # output size, different window alignment — weights only reproduce
        # under their own convention.
        pool_pad = [(0, 1), (0, 1)] if self.caffe_v1 else [(1, 1), (1, 1)]
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)
        width = 64
        for si, n in enumerate(blocks[:3]):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = Bottleneck(width, strides=stride, downsample=bi == 0,
                               caffe_v1=self.caffe_v1, dtype=self.dtype,
                               name=f"layer{si + 1}_{bi}")(x)
            width *= 2
        return x.astype(jnp.float32)  # (H/16, W/16, 1024)


class Conv5Head(nn.Module):
    """ResNet conv5 applied per ROI (14x14 -> 7x7 -> global pool 2048)."""

    depth: int = 101
    caffe_v1: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, 14, 14, 1024)
        x = rois.astype(self.dtype)
        for bi in range(STAGE_BLOCKS[self.depth][3]):
            x = Bottleneck(512, strides=2 if bi == 0 else 1, downsample=bi == 0,
                           caffe_v1=self.caffe_v1, dtype=self.dtype,
                           name=f"layer4_{bi}")(x)
        # Pool in fp32: these are the published region features.
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (N, 2048)


class RPN(nn.Module):
    num_anchors: int = len(ANCHOR_SCALES) * len(ANCHOR_RATIOS)

    @nn.compact
    def __call__(self, feat):
        x = nn.relu(nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)],
                            name="rpn_conv")(feat))
        logits = nn.Conv(2 * self.num_anchors, (1, 1), name="rpn_cls")(x)
        deltas = nn.Conv(4 * self.num_anchors, (1, 1), name="rpn_bbox")(x)
        return logits, deltas


class FasterRCNN(nn.Module):
    """Single-image detection network returning fixed ``num_rois`` regions."""

    depth: int = 101
    num_classes: int = VG_CLASSES
    num_attributes: int = VG_ATTRIBUTES
    num_rois: int = 300
    pre_nms_top_n: int = RPN_PRE_NMS_TOP_N
    nms_thresh: float = RPN_NMS_THRESH
    roi_size: int = 14
    cls_emb_dim: int = 256
    attr_hidden: int = 512
    anchor_scales: tuple = ANCHOR_SCALES
    anchor_ratios: tuple = ANCHOR_RATIOS
    caffe_preproc: bool = False
    caffe_v1: bool = False  # original stride placement + pool alignment
    # Backbone/head conv compute dtype; proposals, NMS, box decode and the
    # classifier/attr heads always run fp32 (see ConvBody.dtype).
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image):
        """image (H, W, 3) float in [0,1] -> dict(boxes, scores, cls_prob,
        attr_prob, features, bbox_deltas)."""
        h, w = image.shape[0], image.shape[1]
        feat = ConvBody(self.depth, self.caffe_preproc, self.caffe_v1,
                        dtype=self.dtype, name="body")(image[None])[0]
        fh, fw = feat.shape[0], feat.shape[1]
        logits, deltas = RPN(name="rpn")(feat[None])
        a = len(self.anchor_scales) * len(self.anchor_ratios)
        # (fh, fw, 2A) -> objectness prob of the "fg" channel per anchor.
        logits = logits[0].reshape(fh * fw * a, 2)
        obj = jax.nn.softmax(logits, axis=-1)[:, 1]
        deltas = deltas[0].reshape(fh * fw * a, 4)
        anchors = jnp.asarray(shifted_anchors(
            fh, fw, FEAT_STRIDE, self.anchor_ratios, self.anchor_scales))
        proposals = clip_boxes(decode_boxes(anchors, deltas), h, w)
        # Drop tiny proposals (proposal_layer min_size filter).  Sentinel
        # score (not -1.0): a filtered proposal that survives into the
        # fixed-shape NMS output must read as padding, never as a live row.
        ws = proposals[:, 2] - proposals[:, 0] + 1
        hs = proposals[:, 3] - proposals[:, 1] + 1
        valid = (ws >= RPN_MIN_SIZE) & (hs >= RPN_MIN_SIZE)
        obj = jnp.where(valid, obj, jnp.finfo(jnp.float32).min)
        k = min(self.pre_nms_top_n, proposals.shape[0])
        top_scores, top_idx = jax.lax.top_k(obj, k)
        top_boxes = proposals[top_idx]
        keep, keep_scores = nms_fixed(top_boxes, top_scores,
                                      self.nms_thresh, self.num_rois)
        boxes = top_boxes[keep]
        scores = keep_scores
        rois = roi_align(feat, boxes, self.roi_size)
        pooled = Conv5Head(self.depth, self.caffe_v1, dtype=self.dtype,
                           name="head")(rois)  # (R, 2048)
        cls_logits = nn.Dense(self.num_classes, name="cls_score")(pooled)
        cls_prob = jax.nn.softmax(cls_logits, axis=-1)
        bbox_deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(pooled)
        # Attribute branch conditioned on the argmax class (Caffe
        # cls_embedding -> concat pool5 -> fc_attr -> attr_score).
        emb = nn.Embed(self.num_classes, self.cls_emb_dim, name="cls_embedding")(
            jnp.argmax(cls_prob, axis=-1))
        attr_in = jnp.concatenate([pooled, emb], axis=-1)
        attr_h = nn.relu(nn.Dense(self.attr_hidden, name="fc_attr")(attr_in))
        attr_prob = jax.nn.softmax(
            nn.Dense(self.num_attributes, name="attr_score")(attr_h), axis=-1)
        return {"boxes": boxes, "scores": scores, "cls_prob": cls_prob,
                "attr_prob": attr_prob, "features": pooled,
                "bbox_deltas": bbox_deltas}


@dataclass
class BottomUpDetector:
    """RegionDetector-protocol wrapper: jitted FasterRCNN + numpy I/O.

    Drop-in replacement for the pipeline's StubDetector; plug into
    pipelines.region_features.RegionFeatureExtractor.
    """

    params: dict
    model: FasterRCNN
    num_classes: int = VG_CLASSES
    num_attributes: int = VG_ATTRIBUTES
    feature_dim: int = 2048

    def __post_init__(self):
        @jax.jit
        def forward(params, image):
            return self.model.apply(params, image)

        # Batched variant (see RegionFeatureExtractor.views_per_dispatch,
        # default 6).  With the lazy-row NMS, batch 6 runs 441-463 frames/s
        # vs 314 single-image on v5e (the batch-1 backbone is
        # weight-traffic-bound; batching amortizes it).  Larger batches
        # regress (HBM pressure) — with the OLD materialized (N, N) NMS IOU
        # matrix batching lost outright (139 f/s at 36), which is why
        # nms_fixed computes IOU rows on the fly.
        @jax.jit
        def forward_batch(params, images):
            return jax.vmap(self.model.apply, in_axes=(None, 0))(params, images)

        self._forward = forward
        self._forward_batch = forward_batch

    @classmethod
    def random_init(cls, num_classes: int = 32, num_attributes: int = 8,
                    depth: int = 50, num_rois: int = 16, image_hw=(64, 64),
                    pre_nms_top_n: int = 256, seed: int = 0):
        model = FasterRCNN(depth=depth, num_classes=num_classes,
                           num_attributes=num_attributes, num_rois=num_rois,
                           pre_nms_top_n=pre_nms_top_n)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(seed), jnp.zeros((*image_hw, 3), jnp.float32))
        return cls(params=params, model=model, num_classes=num_classes,
                   num_attributes=num_attributes)

    @classmethod
    def from_caffe_dump(cls, state: dict, depth: int = 101, **kw):
        kw.setdefault("caffe_preproc", True)
        kw.setdefault("caffe_v1", True)
        model = FasterRCNN(depth=depth, **kw)
        return cls(params={"params": convert_caffe_bottomup(state, depth)},
                   model=model)

    @staticmethod
    def _strip_padding(out: dict) -> dict:
        # Fixed-shape padding rows carry sentinel scores; drop them on host so
        # the post-processing sees only real proposals.
        live = out["scores"] > np.finfo(np.float32).min / 2
        return {"boxes": out["boxes"][live], "cls_prob": out["cls_prob"][live],
                "attr_prob": out["attr_prob"][live],
                "features": out["features"][live]}

    def __call__(self, image: np.ndarray) -> dict:
        out = self._forward(self.params, jnp.asarray(image, jnp.float32))
        return self._strip_padding({k: np.asarray(v) for k, v in out.items()})

    def detect_batch(self, images: np.ndarray) -> list[dict]:
        """(N, H, W, 3) -> N per-image result dicts, ONE device dispatch.
        Keep N fixed across calls (e.g. always a 36-view panorama) so a
        single jit variant exists."""
        out = self._forward_batch(self.params, jnp.asarray(images, jnp.float32))
        out = {k: np.asarray(v) for k, v in out.items()}
        return [self._strip_padding({k: v[i] for k, v in out.items()})
                for i in range(images.shape[0])]


def _caffe_stage_names(depth: int):
    """Caffe res-layer name per (stage, block): res2a/res2b/..., res4b22 etc."""
    names = {}
    letters = "abcdefghijklmnopqrstuvwxyz"
    for si, n in enumerate(STAGE_BLOCKS[depth]):
        stage = si + 2
        for bi in range(n):
            if n <= 3 or bi == 0:
                name = f"res{stage}{letters[bi]}"
            else:
                name = f"res{stage}b{bi}"
            names[(si, bi)] = name
    return names


def convert_caffe_bottomup(state: dict, depth: int = 101) -> dict:
    """{caffe_blob: np.ndarray} -> flax params for FasterRCNN.

    Expects the standard dump layout: for every conv layer L, ``L.weight``
    (OIHW); BatchNorm folded as ``bn<L>.{mean,var}`` + ``scale<L>.{weight,
    bias}``; fully-connected ``{cls_score,bbox_pred,fc_attr,attr_score}.
    {weight,bias}`` (torch-style (out, in)); ``cls_embedding.weight``; RPN
    convs ``rpn_conv/3x3`` / ``rpn_cls_score`` / ``rpn_bbox_pred``.
    """
    g = lambda k: np.asarray(state[k])

    def conv(k):
        return {"kernel": g(k + ".weight").transpose(2, 3, 1, 0)}

    def bn(cname):
        # caffe BN + Scale pair, e.g. bn2a_branch2a + scale2a_branch2a.
        return {"mean": g(f"bn{cname}.mean"), "var": g(f"bn{cname}.var"),
                "scale": g(f"scale{cname}.weight"),
                "bias": g(f"scale{cname}.bias")}

    def dense(k):
        return {"kernel": g(k + ".weight").T, "bias": g(k + ".bias")}

    names = _caffe_stage_names(depth)

    def block(si, bi):
        cn = names[(si, bi)].removeprefix("res")
        out = {
            "conv1": conv(f"res{cn}_branch2a"), "bn1": bn(f"{cn}_branch2a"),
            "conv2": conv(f"res{cn}_branch2b"), "bn2": bn(f"{cn}_branch2b"),
            "conv3": conv(f"res{cn}_branch2c"), "bn3": bn(f"{cn}_branch2c"),
        }
        if bi == 0:
            out["downsample_conv"] = conv(f"res{cn}_branch1")
            out["downsample_bn"] = bn(f"{cn}_branch1")
        return out

    body = {"conv1": conv("conv1"), "bn1": bn("_conv1")}
    for si, n in enumerate(STAGE_BLOCKS[depth][:3]):
        for bi in range(n):
            body[f"layer{si + 1}_{bi}"] = block(si, bi)
    head = {f"layer4_{bi}": block(3, bi) for bi in range(STAGE_BLOCKS[depth][3])}
    rpn = {
        "rpn_conv": {"kernel": g("rpn_conv/3x3.weight").transpose(2, 3, 1, 0),
                     "bias": g("rpn_conv/3x3.bias")},
        "rpn_cls": {"kernel": g("rpn_cls_score.weight").transpose(2, 3, 1, 0),
                    "bias": g("rpn_cls_score.bias")},
        "rpn_bbox": {"kernel": g("rpn_bbox_pred.weight").transpose(2, 3, 1, 0),
                     "bias": g("rpn_bbox_pred.bias")},
    }
    return {
        "body": body, "head": head, "rpn": rpn,
        "cls_score": dense("cls_score"),
        "bbox_pred": dense("bbox_pred"),
        "fc_attr": dense("fc_attr"),
        "attr_score": dense("attr_score"),
        "cls_embedding": {"embedding": g("cls_embedding.weight")},
    }
