"""Faster R-CNN detector: anchor goldens, NMS parity, ROI-align math,
end-to-end region extraction, and the Caffe weight converter."""

import numpy as np
import pytest

from visitron_tpu.models.detector import (
    BottomUpDetector, FasterRCNN, convert_caffe_bottomup, decode_boxes,
    generate_anchors, nms_fixed, roi_align, shifted_anchors)


def test_generate_anchors_golden():
    """Exact py-faster-rcnn generate_anchors output for the canonical config
    (base 16, ratios 0.5/1/2, scales 8/16/32) — the well-known 9-anchor table."""
    got = generate_anchors(16, (0.5, 1.0, 2.0), (8, 16, 32))
    want = np.array([
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
    np.testing.assert_array_equal(got, want)


def test_shifted_anchors_layout():
    a = shifted_anchors(2, 3, stride=16)
    A = 12  # 4 scales x 3 ratios (VG config)
    assert a.shape == (2 * 3 * A, 4)
    # Anchor block at (row 1, col 2) is the base block shifted by (32, 16).
    base = a[:A]
    blk = a[(1 * 3 + 2) * A:(1 * 3 + 2 + 1) * A]
    np.testing.assert_allclose(blk - base, np.tile([[32, 16, 32, 16]], (A, 1)))


def test_decode_boxes_roundtrip():
    anchors = np.array([[0, 0, 15, 15], [10, 20, 49, 59]], np.float32)
    got = np.asarray(decode_boxes(anchors, np.zeros((2, 4), np.float32)))
    np.testing.assert_allclose(got, anchors, atol=1e-5)
    # dw = log 2 doubles the width around the same centre.
    d = np.array([[0, 0, np.log(2.0), 0]], np.float32)
    got = np.asarray(decode_boxes(anchors[:1], d))[0]
    assert got[2] - got[0] + 1 == pytest.approx(32.0, abs=1e-4)


def test_nms_fixed_matches_numpy_nms():
    from visitron_tpu.ops.detection import nms as np_nms

    rng = np.random.default_rng(0)
    n = 80
    x1 = rng.uniform(0, 80, n).astype(np.float32)
    y1 = rng.uniform(0, 80, n).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + rng.uniform(5, 40, n).astype(np.float32),
                      y1 + rng.uniform(5, 40, n).astype(np.float32)], axis=1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ref = np_nms(boxes, scores, 0.5)
    keep, kscores = nms_fixed(boxes, scores, 0.5, n)
    keep = np.asarray(keep)
    kscores = np.asarray(kscores)
    live = kscores > np.finfo(np.float32).min / 2
    assert live.sum() == len(ref)
    np.testing.assert_array_equal(keep[live], ref)
    # Truncated variant returns the same prefix.
    keep20, ks20 = nms_fixed(boxes, scores, 0.5, 20)
    np.testing.assert_array_equal(np.asarray(keep20), ref[:20])


def test_roi_align_exact_on_linear_field():
    """Bilinear sampling reproduces a linear function exactly."""
    h = w = 16
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    feat = np.stack([xs, ys], axis=-1)  # value == coordinate
    boxes = np.array([[16., 32., 80., 96.]], np.float32)  # /16 -> [1,2,5,6]
    out = np.asarray(roi_align(feat, boxes, out_size=4, stride=16.0))
    # Bin centres along x: 1 + (i+0.5)/4*(5-1)
    want_x = 1 + (np.arange(4) + 0.5) / 4 * 4
    np.testing.assert_allclose(out[0, 0, :, 0], want_x, rtol=1e-5)
    want_y = 2 + (np.arange(4) + 0.5) / 4 * 4
    np.testing.assert_allclose(out[0, :, 0, 1], want_y, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_detector():
    return BottomUpDetector.random_init(
        num_classes=12, num_attributes=5, depth=50, num_rois=12,
        image_hw=(64, 64), pre_nms_top_n=128)


def test_detector_forward_shapes(tiny_detector):
    rng = np.random.default_rng(1)
    out = tiny_detector(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    n = out["boxes"].shape[0]
    assert 1 <= n <= 12
    assert out["cls_prob"].shape == (n, 12)
    assert out["attr_prob"].shape == (n, 5)
    assert out["features"].shape == (n, 2048)
    np.testing.assert_allclose(out["cls_prob"].sum(-1), 1.0, rtol=1e-4)
    assert (out["boxes"][:, 2] >= out["boxes"][:, 0]).all()
    assert out["boxes"].min() >= 0 and out["boxes"].max() <= 63


def test_detect_batch_matches_sequential(tiny_detector):
    """detect_batch (one vmapped dispatch per panorama) returns exactly the
    per-image results of the single-image path — same proposals, NMS
    survivors, features."""
    rng = np.random.default_rng(3)
    images = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    batched = tiny_detector.detect_batch(images)
    assert len(batched) == 4
    for i in range(4):
        single = tiny_detector(images[i])
        assert set(single) == set(batched[i])
        for k in single:
            # vmapped and single-image programs compile to different XLA
            # fusions, so conv outputs drift in the last ~1e-4; identical
            # box SETS and shapes are the real contract.
            np.testing.assert_allclose(batched[i][k], single[k], rtol=1e-3,
                                       atol=1e-2, err_msg=f"img {i} {k}")


@pytest.mark.slow
def test_detector_drives_region_pipeline(tiny_detector):
    """The flax detector slots into the full bottom-up pipeline in place of
    the stub (pipelines/region_features.py)."""
    from visitron_tpu.pipelines.region_features import RegionFeatureExtractor

    classes = ["__background__"] + [f"c{i}" for i in range(11)]
    attrs = ["__no_attribute__"] + [f"a{i}" for i in range(4)]
    ex = RegionFeatureExtractor(tiny_detector, classes, attrs,
                                image_w=64, image_h=64, vfov=80)
    rng = np.random.default_rng(2)

    class _OneVp:
        viewpoints = ["v1"]
        num_viewpoints = 1

    pano = rng.uniform(0, 1, (36, 64, 64, 3)).astype(np.float32)
    store = ex.extract_all({"s1": _OneVp()}, lambda s, v: pano)
    key = b"s1_v1_0"
    feats = store[key]
    toks = store.get_region_tokens(key)
    assert feats.shape[1] == 2048 + 6  # orientation-appended
    assert 1 <= feats.shape[0] <= 10
    assert len(toks) == feats.shape[0]


@pytest.mark.slow
def test_caffe_converter_structure():
    """A synthetic caffe-name dump converts into params that run the model."""
    import jax
    import jax.numpy as jnp

    model = FasterRCNN(depth=50, num_classes=7, num_attributes=4, num_rois=6,
                       pre_nms_top_n=64, cls_emb_dim=8, attr_hidden=16,
                       caffe_preproc=True)
    tmpl = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jnp.zeros((32, 32, 3), jnp.float32))

    # Build the caffe-style dump from the flax template's shapes.
    from visitron_tpu.models.detector import _caffe_stage_names
    from visitron_tpu.models.resnet import STAGE_BLOCKS

    rng = np.random.default_rng(0)
    state = {}

    def add_conv(name, flax_kernel_shape, bias=False):
        kh, kw, i, o = flax_kernel_shape
        state[name + ".weight"] = (0.05 * rng.standard_normal((o, i, kh, kw))).astype(np.float32)
        if bias:
            state[name + ".bias"] = rng.standard_normal(o).astype(np.float32)

    def add_bn(cname, feats):
        state[f"bn{cname}.mean"] = rng.standard_normal(feats).astype(np.float32)
        state[f"bn{cname}.var"] = rng.uniform(0.5, 2, feats).astype(np.float32)
        state[f"scale{cname}.weight"] = rng.standard_normal(feats).astype(np.float32)
        state[f"scale{cname}.bias"] = rng.standard_normal(feats).astype(np.float32)

    def add_dense(name, flax_kernel_shape):
        i, o = flax_kernel_shape
        state[name + ".weight"] = (0.05 * rng.standard_normal((o, i))).astype(np.float32)
        state[name + ".bias"] = rng.standard_normal(o).astype(np.float32)

    p = tmpl["params"]
    add_conv("conv1", p["body"]["conv1"]["kernel"].shape)
    add_bn("_conv1", 64)
    names = _caffe_stage_names(50)
    for si, n in enumerate(STAGE_BLOCKS[50][:3]):
        for bi in range(n):
            blk = p["body"][f"layer{si + 1}_{bi}"]
            cn = names[(si, bi)].removeprefix("res")
            for ci, branch in [(1, "branch2a"), (2, "branch2b"), (3, "branch2c")]:
                add_conv(f"res{cn}_{branch}", blk[f"conv{ci}"]["kernel"].shape)
                add_bn(f"{cn}_{branch}", blk[f"bn{ci}"]["scale"].shape[0])
            if bi == 0:
                add_conv(f"res{cn}_branch1", blk["downsample_conv"]["kernel"].shape)
                add_bn(f"{cn}_branch1", blk["downsample_bn"]["scale"].shape[0])
    for bi in range(STAGE_BLOCKS[50][3]):
        blk = p["head"][f"layer4_{bi}"]
        cn = names[(3, bi)].removeprefix("res")
        for ci, branch in [(1, "branch2a"), (2, "branch2b"), (3, "branch2c")]:
            add_conv(f"res{cn}_{branch}", blk[f"conv{ci}"]["kernel"].shape)
            add_bn(f"{cn}_{branch}", blk[f"bn{ci}"]["scale"].shape[0])
        if bi == 0:
            add_conv(f"res{cn}_branch1", blk["downsample_conv"]["kernel"].shape)
            add_bn(f"{cn}_branch1", blk["downsample_bn"]["scale"].shape[0])
    add_conv("rpn_conv/3x3", p["rpn"]["rpn_conv"]["kernel"].shape, bias=True)
    add_conv("rpn_cls_score", p["rpn"]["rpn_cls"]["kernel"].shape, bias=True)
    add_conv("rpn_bbox_pred", p["rpn"]["rpn_bbox"]["kernel"].shape, bias=True)
    for name in ("cls_score", "bbox_pred", "fc_attr", "attr_score"):
        add_dense(name, p[name]["kernel"].shape)
    state["cls_embedding.weight"] = (0.05 * rng.standard_normal(
        p["cls_embedding"]["embedding"].shape)).astype(np.float32)

    params = convert_caffe_bottomup(state, depth=50)
    # Structure matches the template exactly...
    got = jax.tree_util.tree_structure({"params": params})
    assert got == jax.tree_util.tree_structure(tmpl)
    for (ka, va), (kb, vb) in zip(
            sorted(jax.tree_util.tree_flatten_with_path({"params": params})[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(tmpl)[0],
                   key=lambda t: str(t[0]))):
        assert va.shape == vb.shape, (ka, va.shape, vb.shape)
    # ...and the converted network runs.
    out = model.apply({"params": params},
                      jnp.zeros((32, 32, 3), jnp.float32))
    assert np.isfinite(np.asarray(out["features"])).all()


# ---------------------------------------------------------------------------
# tools/dump_caffemodel.py: protobuf wire-format round trip
# ---------------------------------------------------------------------------

def _pb_varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _pb_field(num, wt, payload):
    key = _pb_varint((num << 3) | wt)
    if wt == 2:
        return key + _pb_varint(len(payload)) + payload
    return key + payload


def _pb_blob(arr, legacy=False):
    arr = np.asarray(arr, np.float32)
    body = b""
    if legacy:
        dims = ([1] * (4 - arr.ndim)) + list(arr.shape)
        for i, d in enumerate(dims, start=1):
            body += _pb_field(i, 0, _pb_varint(d))
    else:
        shape = b"".join(_pb_field(1, 0, _pb_varint(d)) for d in arr.shape)
        body += _pb_field(7, 2, shape)
    body += _pb_field(5, 2, arr.ravel().tobytes())
    return body


def _pb_layer(name, ltype, blobs, v1=False):
    if v1:
        body = _pb_field(4, 2, name.encode())
        body += _pb_field(5, 0, _pb_varint({"Convolution": 4,
                                            "InnerProduct": 14}[ltype]))
        body += b"".join(_pb_field(6, 2, _pb_blob(b, legacy=True)) for b in blobs)
        return _pb_field(2, 2, body)
    body = _pb_field(1, 2, name.encode())
    body += _pb_field(2, 2, ltype.encode())
    body += b"".join(_pb_field(7, 2, _pb_blob(b)) for b in blobs)
    return _pb_field(100, 2, body)


def test_dump_caffemodel_wire_roundtrip():
    """A synthetic NetParameter byte stream (new + legacy V1 layers, BN scale
    factor, packed shapes) parses into exactly the dump layout
    convert_caffe_bottomup consumes."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "dump_caffemodel",
        os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                     "dump_caffemodel.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(0)
    w_conv = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    b_conv = rng.normal(size=8).astype(np.float32)
    bn_mean = rng.normal(size=8).astype(np.float32)
    bn_var = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    sc_w = rng.normal(size=8).astype(np.float32)
    sc_b = rng.normal(size=8).astype(np.float32)
    w_fc = rng.normal(size=(4, 8)).astype(np.float32)
    b_fc = rng.normal(size=4).astype(np.float32)
    w_conv1 = rng.normal(size=(1, 8, 3, 3)).astype(np.float32)

    raw = b"".join([
        _pb_layer("res2a_branch2a", "Convolution", [w_conv, b_conv]),
        # caffe BN: blobs (mean, var, scale_factor) — stats divided by factor.
        _pb_layer("bn2a_branch2a", "BatchNorm",
                  [bn_mean * 2.0, bn_var * 2.0, np.array([2.0], np.float32)]),
        _pb_layer("scale2a_branch2a", "Scale", [sc_w, sc_b]),
        _pb_layer("relu1", "ReLU", []),
        _pb_layer("cls_score", "InnerProduct", [w_fc, b_fc], v1=True),
        # Legacy conv whose true leading dim is 1 (single output channel):
        # must stay rank-4 OIHW, not be stripped like IP padding.
        _pb_layer("mask_conv", "Convolution",
                  [w_conv1, np.ones(1, np.float32)], v1=True),
    ])
    layers = mod.parse_caffemodel(raw)
    assert [n for n, _, _ in layers] == [
        "res2a_branch2a", "bn2a_branch2a", "scale2a_branch2a", "cls_score",
        "mask_conv"]
    dump = mod.to_dump(layers)
    np.testing.assert_array_equal(dump["res2a_branch2a.weight"], w_conv)
    np.testing.assert_array_equal(dump["res2a_branch2a.bias"], b_conv)
    np.testing.assert_allclose(dump["bn2a_branch2a.mean"], bn_mean, rtol=1e-6)
    np.testing.assert_allclose(dump["bn2a_branch2a.var"], bn_var, rtol=1e-6)
    np.testing.assert_array_equal(dump["scale2a_branch2a.weight"], sc_w)
    np.testing.assert_array_equal(dump["scale2a_branch2a.bias"], sc_b)
    # V1 legacy IP: the (1, 1, O, I) padding normalizes to torch-style
    # (out, in); a legacy conv keeps rank-4 OIHW even with num_output == 1.
    np.testing.assert_array_equal(dump["cls_score.weight"], w_fc)
    np.testing.assert_array_equal(dump["cls_score.bias"], b_fc)
    np.testing.assert_array_equal(dump["mask_conv.weight"], w_conv1)
