"""ONNX front-end: ModelProto -> NN op graph.

Replaces the reference's onnx2air (nn-addon/onnx2air/src/air_gen.cxx)
with a thin Python importer: parses the protobuf (bindings generated
from the standard onnx.proto schema), resolves initializers/constants,
infers NCHW shapes, and yields a topologically-ordered op list ready
for slot-packing lowering. Supported ops match the reference's dispatch
table (nn-addon/include/nn/onnx2air/air_stmt.h:25-36): Add, AveragePool,
Constant, Conv, Flatten, Gemm, GlobalAveragePool, MaxPool, Mul, Relu,
Reshape.
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

_PB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_onnx")
if _PB_DIR not in sys.path:
    sys.path.insert(0, _PB_DIR)

import onnx_pb2  # noqa: E402  (generated from the standard ONNX schema)

_DTYPE = {1: np.float32, 6: np.int32, 7: np.int64, 11: np.float64}


@dataclasses.dataclass
class NNOp:
    op_type: str
    name: str
    inputs: list
    outputs: list
    attrs: dict
    in_shape: tuple | None = None   # NCHW shape of the data input
    out_shape: tuple | None = None


@dataclasses.dataclass
class NNGraph:
    ops: list
    weights: dict            # name -> np.ndarray
    input_name: str
    input_shape: tuple
    output_name: str


def _tensor_to_np(t) -> np.ndarray:
    dtype = _DTYPE[t.data_type]
    if t.raw_data:
        arr = np.frombuffer(t.raw_data, dtype=dtype)
    elif t.float_data:
        arr = np.asarray(t.float_data, dtype=dtype)
    elif t.int64_data:
        arr = np.asarray(t.int64_data, dtype=dtype)
    elif t.int32_data:
        arr = np.asarray(t.int32_data, dtype=dtype)
    else:
        arr = np.zeros(0, dtype=dtype)
    return arr.reshape([d for d in t.dims]) if t.dims else arr


def _attr_value(a):
    if a.type == onnx_pb2.AttributeProto.INT:
        return int(a.i)
    if a.type == onnx_pb2.AttributeProto.INTS:
        return [int(v) for v in a.ints]
    if a.type == onnx_pb2.AttributeProto.FLOAT:
        return float(a.f)
    if a.type == onnx_pb2.AttributeProto.FLOATS:
        return [float(v) for v in a.floats]
    if a.type == onnx_pb2.AttributeProto.TENSOR:
        return _tensor_to_np(a.t)
    if a.type == onnx_pb2.AttributeProto.STRING:
        return a.s.decode()
    return None


def load_onnx(path: str) -> NNGraph:
    model = onnx_pb2.ModelProto()
    with open(path, "rb") as f:
        model.ParseFromString(f.read())
    g = model.graph

    weights = {init.name: _tensor_to_np(init) for init in g.initializer}

    # fold Constant nodes into weights
    ops = []
    for node in g.node:
        attrs = {a.name: _attr_value(a) for a in node.attribute}
        if node.op_type == "Constant":
            weights[node.output[0]] = attrs["value"]
            continue
        ops.append(NNOp(node.op_type, node.name or node.output[0],
                        list(node.input), list(node.output), attrs))

    graph_input = None
    for vi in g.input:
        if vi.name not in weights:
            graph_input = vi
    assert graph_input is not None
    in_shape = tuple(d.dim_value
                     for d in graph_input.type.tensor_type.shape.dim)

    # shape inference (NCHW only, batch must be 1)
    shapes = {graph_input.name: in_shape}
    for op in ops:
        data_in = op.inputs[0]
        s = shapes.get(data_in)
        op.in_shape = s
        if op.op_type == "Conv":
            w = weights[op.inputs[1]]
            strides = op.attrs.get("strides", [1, 1])
            oh = s[2] // strides[0]
            ow = s[3] // strides[1]
            op.out_shape = (s[0], w.shape[0], oh, ow)
        elif op.op_type in ("Relu", "Add", "Mul"):
            op.out_shape = s
        elif op.op_type == "GlobalAveragePool":
            op.out_shape = (s[0], s[1], 1, 1)
        elif op.op_type in ("AveragePool", "MaxPool"):
            k = op.attrs["kernel_shape"][0]
            op.out_shape = (s[0], s[1], s[2] // k, s[3] // k)
        elif op.op_type in ("Reshape", "Flatten"):
            op.out_shape = (1, int(np.prod([d for d in s if d])),)
        elif op.op_type == "Gemm":
            w = weights[op.inputs[1]]
            out_dim = w.shape[1] if op.attrs.get("transB", 0) == 0 \
                else w.shape[0]
            op.out_shape = (1, out_dim)
        else:
            raise NotImplementedError(f"op {op.op_type}")
        shapes[op.outputs[0]] = op.out_shape

    return NNGraph(ops, weights, graph_input.name, in_shape,
                   g.output[0].name)
