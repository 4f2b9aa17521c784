"""Front-end hardening: non-SAME convs fail loudly, Sub/Slice lower,
Gemm alpha/beta fold (onnx2air air_stmt.h:25-36 contract coverage)."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "ace_tpu", "compiler", "_onnx"))
import onnx_pb2  # noqa: E402

from ace_tpu.compiler.onnx_front import load_onnx, NNGraph, NNOp
from ace_tpu.compiler.lowering import GraphRunner
from ace_tpu.compiler import packing as pk


def _mk_model(nodes, weights, in_shape, out_name, tmp_path):
    m = onnx_pb2.ModelProto()
    g = m.graph
    for node_spec in nodes:
        n = g.node.add()
        n.op_type = node_spec["op"]
        n.name = node_spec.get("name", node_spec["op"])
        n.input.extend(node_spec["inputs"])
        n.output.extend(node_spec["outputs"])
        for k, v in node_spec.get("attrs", {}).items():
            a = n.attribute.add()
            a.name = k
            if isinstance(v, int):
                a.type = onnx_pb2.AttributeProto.INT
                a.i = v
            elif isinstance(v, float):
                a.type = onnx_pb2.AttributeProto.FLOAT
                a.f = v
            else:
                a.type = onnx_pb2.AttributeProto.INTS
                a.ints.extend(v)
    for name, arr in weights.items():
        t = g.initializer.add()
        t.name = name
        t.data_type = 11  # double
        t.dims.extend(arr.shape)
        t.raw_data = np.asarray(arr, np.float64).tobytes()
    vi = g.input.add()
    vi.name = "x"
    for d in in_shape:
        vi.type.tensor_type.shape.dim.add().dim_value = d
    g.output.add().name = out_name
    path = str(tmp_path / "m.onnx")
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    return path


def test_non_same_conv_rejected(tmp_path):
    w = np.zeros((4, 3, 3, 3))
    path = _mk_model(
        [dict(op="Conv", inputs=["x", "w"], outputs=["y"],
              attrs={"pads": [0, 0, 0, 0], "strides": [1, 1]})],
        {"w": w}, (1, 3, 8, 8), "y", tmp_path)
    with pytest.raises(NotImplementedError, match="SAME"):
        load_onnx(path)


def test_grouped_conv_rejected(tmp_path):
    w = np.zeros((4, 1, 3, 3))
    path = _mk_model(
        [dict(op="Conv", inputs=["x", "w"], outputs=["y"],
              attrs={"pads": [1, 1, 1, 1], "group": 4})],
        {"w": w}, (1, 4, 8, 8), "y", tmp_path)
    with pytest.raises(NotImplementedError, match="group"):
        load_onnx(path)


def test_overlapping_pool_rejected(tmp_path):
    path = _mk_model(
        [dict(op="AveragePool", inputs=["x"], outputs=["y"],
              attrs={"kernel_shape": [2, 2], "strides": [1, 1]})],
        {}, (1, 4, 8, 8), "y", tmp_path)
    with pytest.raises(NotImplementedError, match="non-overlapping"):
        load_onnx(path)


def test_sub_and_slice_lowering(tmp_path):
    """x[1,4,2,2] -> Sub(x, c) -> Slice channels 1:3 -> matches numpy."""
    c = np.arange(16, dtype=np.float64).reshape(1, 4, 2, 2) * 0.01
    path = _mk_model(
        [dict(op="Sub", inputs=["x", "c"], outputs=["s"]),
         dict(op="Slice", inputs=["s", "st", "en", "ax"], outputs=["y"])],
        {"c": c, "st": np.array([1.0]), "en": np.array([3.0]),
         "ax": np.array([1.0])},
        (1, 4, 2, 2), "y", tmp_path)
    g = load_onnx(path)
    assert g.ops[-1].out_shape == (1, 2, 2, 2)
    x = np.linspace(0, 1, 16)
    be = pk.PlainBackend(64)
    out = GraphRunner(g, be).run(be.pack(x))
    want = (x.reshape(1, 4, 2, 2) - c)[0, 1:3].reshape(-1)
    assert np.allclose(out[:8], want)
    assert np.allclose(out[8:], 0)


def test_gemm_alpha_beta(tmp_path):
    w = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.array([10.0, 20.0])
    path = _mk_model(
        [dict(op="Gemm", inputs=["x", "w", "b"], outputs=["y"],
              attrs={"alpha": 0.5, "beta": 2.0, "transB": 1})],
        {"w": w, "b": b}, (1, 2), "y", tmp_path)
    g = load_onnx(path)
    x = np.array([1.0, 1.0])
    be = pk.PlainBackend(16)
    out = GraphRunner(g, be).run(be.pack(x))
    want = 0.5 * (w @ x) + 2.0 * b
    assert np.allclose(out[:2], want)
