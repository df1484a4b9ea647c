"""Numerical parity of the flax Faster R-CNN vs an independent torch replica.

The published VG .caffemodel is unavailable offline, so true weight-level
validation (NOTES-NEXT-ROUND #1) is approximated the strongest way available:
a random caffe-layout weight dump is loaded by ``convert_caffe_bottomup`` into
the flax detector AND consumed directly (native OIHW layout) by a torch
re-implementation of the caffe graph written here from the prototxt
conventions (ResNet v1 stride placement, ceil-mode pool1, BN+Scale folding,
class-conditioned attribute branch).  Agreement across the two frameworks
validates every weight transpose in the converter and the conv/BN/pool/dense
semantics of the flax model — everything except the bytes of the real
checkpoint.

Reference: scripts/precompute_bottom-up_features.py:84-231 (Caffe net usage).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from visitron_tpu.models.detector import (  # noqa: E402
    BottomUpDetector, FasterRCNN, _caffe_stage_names, roi_align)
from visitron_tpu.models.resnet import STAGE_BLOCKS  # noqa: E402

DEPTH = 50
C_CLS = 12
C_ATTR = 7
NUM_ROIS = 6
PRE_NMS = 64
IMG = 64


def _make_caffe_dump(rng: np.random.Generator) -> dict:
    """Random weights in the caffe dump layout convert_caffe_bottomup expects."""
    s: dict = {}

    def conv(name, cout, cin, k):
        s[name + ".weight"] = rng.normal(
            0, 1.0 / np.sqrt(cin * k * k), (cout, cin, k, k)).astype(np.float32)

    def bn(cname, c):
        s[f"bn{cname}.mean"] = rng.normal(0, 0.05, c).astype(np.float32)
        s[f"bn{cname}.var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        s[f"scale{cname}.weight"] = rng.uniform(0.8, 1.2, c).astype(np.float32)
        s[f"scale{cname}.bias"] = rng.normal(0, 0.05, c).astype(np.float32)

    def dense(name, cout, cin):
        s[name + ".weight"] = rng.normal(
            0, 1.0 / np.sqrt(cin), (cout, cin)).astype(np.float32)
        s[name + ".bias"] = rng.normal(0, 0.02, cout).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("_conv1", 64)
    names = _caffe_stage_names(DEPTH)
    inplanes = 64
    for si, n in enumerate(STAGE_BLOCKS[DEPTH]):
        width = 64 * 2 ** si
        for bi in range(n):
            cn = names[(si, bi)].removeprefix("res")
            conv(f"res{cn}_branch2a", width, inplanes if bi == 0 else width * 4, 1)
            bn(f"{cn}_branch2a", width)
            conv(f"res{cn}_branch2b", width, width, 3)
            bn(f"{cn}_branch2b", width)
            conv(f"res{cn}_branch2c", width * 4, width, 1)
            bn(f"{cn}_branch2c", width * 4)
            if bi == 0:
                conv(f"res{cn}_branch1", width * 4, inplanes, 1)
                bn(f"{cn}_branch1", width * 4)
        inplanes = width * 4
    conv("rpn_conv/3x3", 512, 1024, 3)
    s["rpn_conv/3x3.bias"] = rng.normal(0, 0.02, 512).astype(np.float32)
    a = 12
    conv("rpn_cls_score", 2 * a, 512, 1)
    s["rpn_cls_score.bias"] = rng.normal(0, 0.02, 2 * a).astype(np.float32)
    conv("rpn_bbox_pred", 4 * a, 512, 1)
    s["rpn_bbox_pred.bias"] = rng.normal(0, 0.1, 4 * a).astype(np.float32)
    dense("cls_score", C_CLS, 2048)
    dense("bbox_pred", 4 * C_CLS, 2048)
    s["cls_embedding.weight"] = rng.normal(0, 0.1, (C_CLS, 256)).astype(np.float32)
    dense("fc_attr", 512, 2048 + 256)
    dense("attr_score", C_ATTR, 512)
    return s


# ---------------------------------------------------------------------------
# torch replica of the caffe graph (independent of the flax code)
# ---------------------------------------------------------------------------

def _t(x):
    return torch.from_numpy(np.asarray(x))


def _bnf(s, cname, x):
    inv = _t(s[f"scale{cname}.weight"]) / torch.sqrt(_t(s[f"bn{cname}.var"]) + 1e-5)
    shift = _t(s[f"scale{cname}.bias"]) - _t(s[f"bn{cname}.mean"]) * inv
    return x * inv[None, :, None, None] + shift[None, :, None, None]


def _block(s, cn, x, stride, has_branch1):
    out = F.conv2d(x, _t(s[f"res{cn}_branch2a.weight"]), stride=stride)
    out = F.relu(_bnf(s, f"{cn}_branch2a", out))
    out = F.conv2d(out, _t(s[f"res{cn}_branch2b.weight"]), padding=1)
    out = F.relu(_bnf(s, f"{cn}_branch2b", out))
    out = F.conv2d(out, _t(s[f"res{cn}_branch2c.weight"]))
    out = _bnf(s, f"{cn}_branch2c", out)
    if has_branch1:
        sc = F.conv2d(x, _t(s[f"res{cn}_branch1.weight"]), stride=stride)
        sc = _bnf(s, f"{cn}_branch1", sc)
    else:
        sc = x
    return F.relu(out + sc)


def torch_backbone(s, image_rgb01: np.ndarray) -> np.ndarray:
    """image (H, W, 3) [0,1] RGB -> caffe-preproc C4 features (H/16, W/16, 1024)."""
    bgr = image_rgb01[..., ::-1] * 255.0 - np.array(
        [102.9801, 115.9465, 122.7717], np.float32)
    x = _t(np.ascontiguousarray(bgr.transpose(2, 0, 1))[None])
    x = F.conv2d(x, _t(s["conv1.weight"]), stride=2, padding=3)
    x = F.relu(_bnf(s, "_conv1", x))
    x = F.max_pool2d(x, 3, stride=2, ceil_mode=True)  # caffe pool1
    names = _caffe_stage_names(DEPTH)
    for si, n in enumerate(STAGE_BLOCKS[DEPTH][:3]):
        for bi in range(n):
            cn = names[(si, bi)].removeprefix("res")
            _block_stride = 2 if (si > 0 and bi == 0) else 1
            x = _block(s, cn, x, _block_stride, has_branch1=bi == 0)
    return x[0].numpy().transpose(1, 2, 0)


def torch_conv5(s, rois_nhwc: np.ndarray) -> np.ndarray:
    x = _t(np.ascontiguousarray(rois_nhwc.transpose(0, 3, 1, 2)))
    names = _caffe_stage_names(DEPTH)
    for bi in range(STAGE_BLOCKS[DEPTH][3]):
        cn = names[(3, bi)].removeprefix("res")
        x = _block(s, cn, x, 2 if bi == 0 else 1, has_branch1=bi == 0)
    return x.mean(dim=(2, 3)).numpy()  # (N, 2048)


@pytest.fixture(scope="module")
def dump():
    return _make_caffe_dump(np.random.default_rng(11))


@pytest.fixture(scope="module")
def det(dump):
    return BottomUpDetector.from_caffe_dump(
        dump, depth=DEPTH, num_classes=C_CLS, num_attributes=C_ATTR,
        num_rois=NUM_ROIS, pre_nms_top_n=PRE_NMS)


@pytest.fixture(scope="module")
def image():
    return np.random.default_rng(7).uniform(0, 1, (IMG, IMG, 3)).astype(np.float32)


def test_backbone_matches_torch(dump, det, image):
    from visitron_tpu.models.detector import ConvBody

    body = ConvBody(DEPTH, caffe_preproc=True, caffe_v1=True)
    feat = np.asarray(body.apply(
        {"params": det.params["params"]["body"]}, jnp.asarray(image)[None])[0])
    ref = torch_backbone(dump, image)
    assert feat.shape == ref.shape == (IMG // 16, IMG // 16, 1024)
    # f32 accumulation-order noise across 16 conv layers on O(100) values.
    np.testing.assert_allclose(feat, ref, rtol=1e-3, atol=1e-3)


def test_rpn_and_heads_match_torch(dump, det, image):
    out = {k: np.asarray(v) for k, v in
           det.model.apply(det.params, jnp.asarray(image)).items()}
    feat = torch_backbone(dump, image)

    # RPN conv outputs
    x = _t(np.ascontiguousarray(feat.transpose(2, 0, 1))[None])
    rpn = F.relu(F.conv2d(x, _t(dump["rpn_conv/3x3.weight"]),
                          bias=_t(dump["rpn_conv/3x3.bias"]), padding=1))
    logits = F.conv2d(rpn, _t(dump["rpn_cls_score.weight"]),
                      bias=_t(dump["rpn_cls_score.bias"]))
    # ROI features on the boxes the flax model selected (box selection itself
    # is covered by the NMS/decode golden tests).
    boxes = out["boxes"]
    rois = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 14))
    pooled_ref = torch_conv5(dump, rois)
    np.testing.assert_allclose(out["features"], pooled_ref, rtol=2e-4, atol=2e-4)

    cls_ref = torch.softmax(
        _t(pooled_ref) @ _t(dump["cls_score.weight"]).T + _t(dump["cls_score.bias"]),
        dim=-1).numpy()
    np.testing.assert_allclose(out["cls_prob"], cls_ref, rtol=2e-4, atol=2e-4)

    emb = _t(dump["cls_embedding.weight"])[torch.as_tensor(cls_ref.argmax(-1))]
    attr_in = torch.cat([_t(pooled_ref), emb], dim=-1)
    attr_h = F.relu(attr_in @ _t(dump["fc_attr.weight"]).T + _t(dump["fc_attr.bias"]))
    attr_ref = torch.softmax(
        attr_h @ _t(dump["attr_score.weight"]).T + _t(dump["attr_score.bias"]),
        dim=-1).numpy()
    np.testing.assert_allclose(out["attr_prob"], attr_ref, rtol=2e-4, atol=2e-4)
    assert logits.shape[1] == 24


def test_generate_anchors_pyfasterrcnn_golden():
    """Anchor enumeration must reproduce py-faster-rcnn's generate_anchors()
    actual output for the canonical base 16 / ratios (0.5, 1, 2) /
    scales (8, 16, 32) config.  (The array printed in the upstream docstring
    is famously +1 off from what the code computes — these are the values the
    shipped code, and every model trained with it, actually used.)"""
    from visitron_tpu.models.detector import generate_anchors

    golden = np.array([
        [-84., -40., 99., 55.],
        [-176., -88., 191., 103.],
        [-360., -184., 375., 199.],
        [-56., -56., 71., 71.],
        [-120., -120., 135., 135.],
        [-248., -248., 263., 263.],
        [-36., -80., 51., 95.],
        [-80., -168., 95., 183.],
        [-168., -344., 183., 359.],
    ], np.float32)
    got = generate_anchors(16, (0.5, 1.0, 2.0), (8, 16, 32))
    np.testing.assert_array_equal(got, golden)


def _numpy_nms(boxes, scores, thresh):
    """Independent greedy NMS (py-faster-rcnn cpu_nms semantics)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


def test_proposal_pipeline_matches_numpy_reference(dump, det, image):
    """End-to-end proposal parity: RPN outputs from the INDEPENDENT torch
    backbone, decoded/clipped/filtered/NMS'd with plain numpy following the
    published py-faster-rcnn proposal_layer math, must reproduce the flax
    model's static-shape selected boxes and objectness scores."""
    from visitron_tpu.models.detector import (BBOX_XFORM_CLIP, RPN_MIN_SIZE,
                                              RPN_NMS_THRESH, shifted_anchors)

    out = {k: np.asarray(v) for k, v in
           det.model.apply(det.params, jnp.asarray(image)).items()}

    feat = torch_backbone(dump, image)
    x = _t(np.ascontiguousarray(feat.transpose(2, 0, 1))[None])
    rpn = F.relu(F.conv2d(x, _t(dump["rpn_conv/3x3.weight"]),
                          bias=_t(dump["rpn_conv/3x3.bias"]), padding=1))
    logits = F.conv2d(rpn, _t(dump["rpn_cls_score.weight"]),
                      bias=_t(dump["rpn_cls_score.bias"]))[0].numpy()
    deltas = F.conv2d(rpn, _t(dump["rpn_bbox_pred.weight"]),
                      bias=_t(dump["rpn_bbox_pred.bias"]))[0].numpy()
    fh, fw = feat.shape[:2]
    a = 12
    logits = logits.transpose(1, 2, 0).reshape(fh * fw * a, 2)
    e = np.exp(logits - logits.max(-1, keepdims=True))  # stable softmax
    obj = e[:, 1] / e.sum(-1)
    d = deltas.transpose(1, 2, 0).reshape(fh * fw * a, 4)

    # bbox_transform_inv + clip + min-size (plain numpy)
    anchors = shifted_anchors(fh, fw)
    w = anchors[:, 2] - anchors[:, 0] + 1
    h = anchors[:, 3] - anchors[:, 1] + 1
    cx, cy = anchors[:, 0] + 0.5 * w, anchors[:, 1] + 0.5 * h
    pcx, pcy = d[:, 0] * w + cx, d[:, 1] * h + cy
    pw = np.exp(np.minimum(d[:, 2], BBOX_XFORM_CLIP)) * w
    ph = np.exp(np.minimum(d[:, 3], BBOX_XFORM_CLIP)) * h
    boxes = np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw - 1, pcy + 0.5 * ph - 1], axis=1)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, IMG - 1)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, IMG - 1)
    valid = ((boxes[:, 2] - boxes[:, 0] + 1 >= RPN_MIN_SIZE)
             & (boxes[:, 3] - boxes[:, 1] + 1 >= RPN_MIN_SIZE))
    obj, boxes = obj[valid], boxes[valid]
    top = np.argsort(-obj, kind="stable")[:PRE_NMS]
    keep = _numpy_nms(boxes[top], obj[top], RPN_NMS_THRESH)[:NUM_ROIS]

    live = out["scores"] > np.finfo(np.float32).min / 2
    assert live.sum() == len(keep)
    np.testing.assert_allclose(out["boxes"][live], boxes[top][keep],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out["scores"][live], obj[top][keep],
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_full_scale_parity():
    """The PRODUCTION graph — ResNet-101, 1601 classes, 401 attributes,
    production NMS budget — end-to-end vs the torch replica with identical
    random caffe-layout weights.  After this, the only unknown on the real
    published VG .caffemodel is the bytes of the weight file itself."""
    global DEPTH, C_CLS, C_ATTR, NUM_ROIS, PRE_NMS, IMG
    saved = (DEPTH, C_CLS, C_ATTR, NUM_ROIS, PRE_NMS, IMG)
    try:
        DEPTH, C_CLS, C_ATTR, NUM_ROIS, PRE_NMS, IMG = 101, 1601, 401, 20, 300, 128
        dump = _make_caffe_dump(np.random.default_rng(23))
        det = BottomUpDetector.from_caffe_dump(
            dump, depth=DEPTH, num_classes=C_CLS, num_attributes=C_ATTR,
            num_rois=NUM_ROIS, pre_nms_top_n=PRE_NMS)
        image = np.random.default_rng(29).uniform(
            0, 1, (IMG, IMG, 3)).astype(np.float32)

        # Backbone parity at full depth.
        from visitron_tpu.models.detector import ConvBody

        body = ConvBody(DEPTH, caffe_preproc=True, caffe_v1=True)
        feat = np.asarray(body.apply(
            {"params": det.params["params"]["body"]}, jnp.asarray(image)[None])[0])
        ref = torch_backbone(dump, image)
        assert feat.shape == ref.shape == (IMG // 16, IMG // 16, 1024)
        np.testing.assert_allclose(feat, ref, rtol=2e-3, atol=2e-3)

        # Proposal pipeline + pool5 + 1601/401 heads.
        test_proposal_pipeline_matches_numpy_reference(dump, det, image)
        test_rpn_and_heads_match_torch(dump, det, image)
    finally:
        DEPTH, C_CLS, C_ATTR, NUM_ROIS, PRE_NMS, IMG = saved


def test_caffe_v1_differs_from_torch_style(dump, image):
    """The stride/pool conventions are not interchangeable — loading caffe
    weights into the torchvision-style graph must NOT reproduce (guards
    against silently dropping the caffe_v1 flag)."""
    from visitron_tpu.models.detector import ConvBody, convert_caffe_bottomup

    params = convert_caffe_bottomup(dump, DEPTH)
    v1 = ConvBody(DEPTH, caffe_preproc=True, caffe_v1=True)
    v15 = ConvBody(DEPTH, caffe_preproc=True, caffe_v1=False)
    f1 = np.asarray(v1.apply({"params": params["body"]}, jnp.asarray(image)[None]))
    f2 = np.asarray(v15.apply({"params": params["body"]}, jnp.asarray(image)[None]))
    assert not np.allclose(f1, f2, atol=1e-3)
