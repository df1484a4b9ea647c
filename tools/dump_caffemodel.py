"""Dump a Caffe .caffemodel to the numpy layout convert_caffe_bottomup expects.

No Caffe (or even protobuf) installation needed: a .caffemodel is a protobuf
``NetParameter`` message, and the handful of fields holding weights are
parsed here with a minimal wire-format reader —

    NetParameter:   layer = 100 (LayerParameter, new) / layers = 2 (V1, old)
    LayerParameter: name = 1 (string), type = 2 (string), blobs = 7
    V1LayerParameter: name = 4 (string), type = 5 (enum), blobs = 6
    BlobProto:      shape = 7 (BlobShape: dim = 1 repeated int64),
                    data = 5 (packed float), legacy num/channels/height/width
                    = 1..4 (int32), double_data = 8 (packed double)

Output mapping (the dump layout of models/detector.py:convert_caffe_bottomup):
  * conv layers  -> ``<name>.weight`` (OIHW) [+ ``<name>.bias``]
  * BatchNorm    -> ``bn<suffix>.mean`` / ``.var``   (blobs 0,1 divided by the
                    scale factor in blob 2, standard caffe BN convention)
  * Scale        -> ``scale<suffix>.weight`` / ``.bias``
  * InnerProduct -> ``<name>.weight`` (out, in) + ``<name>.bias``
  * Embed        -> ``<name>.weight``

Usage: python tools/dump_caffemodel.py model.caffemodel out_dump.npz
Then:  BottomUpDetector.from_caffe_dump(dict(np.load("out_dump.npz")))
"""

from __future__ import annotations

import sys

import numpy as np


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a protobuf message body.
    value: int for varint, memoryview for length-delimited, bytes for fixed."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, pos = _read_varint(buf, pos)
            yield field, wt, v
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            yield field, wt, buf[pos:pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            yield field, wt, bytes(buf[pos:pos + 4])
            pos += 4
        elif wt == 1:  # fixed64
            yield field, wt, bytes(buf[pos:pos + 8])
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt} at {pos}")


def _parse_blob(buf: memoryview) -> np.ndarray:
    dims: list[int] = []
    legacy = {}
    data = None
    for field, wt, v in _iter_fields(buf):
        if field == 7 and wt == 2:  # shape: BlobShape{dim=1 repeated varint}
            for f2, w2, v2 in _iter_fields(v):
                if f2 == 1:
                    if w2 == 0:
                        dims.append(int(v2))
                    else:  # packed
                        p = 0
                        while p < len(v2):
                            d, p = _read_varint(v2, p)
                            dims.append(int(d))
        elif field == 5 and wt == 2:  # packed float data
            data = np.frombuffer(bytes(v), np.float32)
        elif field == 5 and wt == 5:  # unpacked float (rare)
            data = (np.array([], np.float32) if data is None else data)
            data = np.append(data, np.frombuffer(v, np.float32))
        elif field == 8 and wt == 2:  # packed double data
            data = np.frombuffer(bytes(v), np.float64).astype(np.float32)
        elif field in (1, 2, 3, 4) and wt == 0:  # legacy NCHW
            legacy[field] = int(v)
    if data is None:
        return np.zeros(0, np.float32)
    if not dims and legacy:
        # Keep the full legacy num/channels/height/width shape: which leading
        # 1-dims are padding depends on the LAYER (InnerProduct pads to
        # (1, 1, O, I); a conv with num_output=1 legitimately starts with 1),
        # so normalization is to_dump's type-aware job, not the parser's.
        dims = [legacy.get(i, 1) for i in (1, 2, 3, 4)]
    if dims and int(np.prod(dims)) == data.size:
        return data.reshape(dims)
    return data


_V1_TYPES = {4: "Convolution", 14: "InnerProduct", 33: "Embed"}


def parse_caffemodel(raw: bytes) -> list[tuple[str, str, list[np.ndarray]]]:
    """-> [(layer_name, layer_type, [blobs])] in file order."""
    layers = []
    for field, wt, v in _iter_fields(memoryview(raw)):
        if wt != 2 or field not in (100, 2):
            continue
        name = ""
        ltype = ""
        blobs = []
        name_f, type_f, blob_f = (1, 2, 7) if field == 100 else (4, 5, 6)
        for f2, w2, v2 in _iter_fields(v):
            if f2 == name_f and w2 == 2:
                name = bytes(v2).decode("utf-8", "replace")
            elif f2 == type_f:
                ltype = (bytes(v2).decode("utf-8", "replace") if w2 == 2
                         else _V1_TYPES.get(int(v2), str(v2)))
            elif f2 == blob_f and w2 == 2:
                blobs.append(_parse_blob(v2))
        if blobs:
            layers.append((name, ltype, blobs))
    return layers


def to_dump(layers) -> dict:
    """Map parsed layers to the convert_caffe_bottomup dump key layout."""
    out = {}
    for name, ltype, blobs in layers:
        if ltype == "BatchNorm":
            mean, var = blobs[0].ravel(), blobs[1].ravel()
            if len(blobs) > 2 and blobs[2].size:  # moving-average scale factor
                s = float(blobs[2].ravel()[0])
                if s != 0.0:
                    mean, var = mean / s, var / s
            suffix = name.removeprefix("bn")
            out[f"bn{suffix}.mean"] = mean.astype(np.float32)
            out[f"bn{suffix}.var"] = var.astype(np.float32)
        elif ltype == "Scale":
            suffix = name.removeprefix("scale")
            out[f"scale{suffix}.weight"] = blobs[0].ravel().astype(np.float32)
            if len(blobs) > 1:
                out[f"scale{suffix}.bias"] = blobs[1].ravel().astype(np.float32)
        elif ltype in ("Convolution", "InnerProduct", "Embed"):
            w = blobs[0]
            if ltype in ("InnerProduct", "Embed") and w.ndim > 2:
                # Legacy V1 stores IP weights as (1, 1, O, I); the dump
                # layout (and torch) wants (O, I).  Convolution weights are
                # already OIHW at rank 4 — including num_output == 1.
                w = w.reshape(w.shape[-2], w.shape[-1])
            out[f"{name}.weight"] = w.astype(np.float32)
            if len(blobs) > 1 and blobs[1].size:
                out[f"{name}.bias"] = blobs[1].ravel().astype(np.float32)
        # other layer types (ReLU, Pooling, Python, ...) carry no weights
    return out


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit("usage: dump_caffemodel.py model.caffemodel out_dump.npz")
    with open(sys.argv[1], "rb") as f:
        raw = f.read()
    layers = parse_caffemodel(raw)
    dump = to_dump(layers)
    print(f"{len(layers)} weighted layers -> {len(dump)} arrays")
    for k in sorted(dump)[:10]:
        print(f"  {k}: {dump[k].shape}")
    np.savez(sys.argv[2], **dump)


if __name__ == "__main__":
    main()
