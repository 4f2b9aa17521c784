"""ONNX front-end + plain-backend execution of the reference models.

The plain slot VM is the oracle for the packing semantics; the model
output must match a direct numpy NCHW implementation of the network.
"""

import numpy as np
import pytest

from ace_tpu.compiler.onnx_front import load_onnx
from ace_tpu.compiler.lowering import GraphRunner
from ace_tpu.compiler import packing as pk

MODEL = "/root/reference/model/resnet20_cifar10_pre.onnx"
RNG = np.random.default_rng(5)


def ref_forward(g, x):
    """Direct numpy NCHW execution of the NN graph (no packing)."""
    env = {g.input_name: x}
    for op in g.ops:
        xin = env[op.inputs[0]]
        if op.op_type == "Conv":
            w = np.asarray(g.weights[op.inputs[1]], np.float64)
            b = np.asarray(g.weights[op.inputs[2]], np.float64)
            s = op.attrs.get("strides", [1, 1])[0]
            pads = op.attrs.get("pads", [0] * 4)
            out = conv_nchw(xin, w, b, s, pads[0])
        elif op.op_type == "Relu":
            out = np.maximum(xin, 0)
        elif op.op_type == "Add":
            out = xin + env[op.inputs[1]]
        elif op.op_type == "GlobalAveragePool":
            out = xin.mean(axis=(1, 2))
        elif op.op_type in ("Reshape", "Flatten"):
            out = xin.reshape(-1)
        elif op.op_type == "Gemm":
            w = np.asarray(g.weights[op.inputs[1]], np.float64)
            if op.attrs.get("transB", 0) == 0:
                w = w.T
            b = np.asarray(g.weights[op.inputs[2]], np.float64)
            out = w @ xin + b
        else:
            raise NotImplementedError(op.op_type)
        env[op.outputs[0]] = out
    return env[g.output_name]


def conv_nchw(x, w, b, stride, pad):
    c_out, c_in, kh, kw = w.shape
    _, h, wd = x.shape
    xp = np.zeros((c_in, h + 2 * pad, wd + 2 * pad))
    xp[:, pad:pad + h, pad:pad + wd] = x
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((c_out, oh, ow))
    for co in range(c_out):
        for i in range(oh):
            for j in range(ow):
                out[co, i, j] = np.sum(
                    xp[:, i * stride:i * stride + kh,
                       j * stride:j * stride + kw] * w[co]) + b[co]
    return out


def test_resnet20_parses():
    g = load_onnx(MODEL)
    assert g.input_shape == (1, 3, 32, 32)
    assert sum(1 for op in g.ops if op.op_type == "Conv") == 21
    assert sum(1 for op in g.ops if op.op_type == "Relu") == 19


@pytest.mark.slow
def test_resnet20_plain_slot_vm_matches_numpy():
    g = load_onnx(MODEL)
    x = RNG.uniform(-1, 1, (3, 32, 32))
    be = pk.PlainBackend(1 << 15)
    runner = GraphRunner(g, be)
    got = runner.run(be.pack(x.reshape(-1)))
    expect = ref_forward(g, x)
    assert np.allclose(got[:10], expect[:10], atol=1e-6), \
        (got[:10], expect[:10])


def test_resnet110_native_graph():
    # resnet110 is built natively (the reference ships only extern
    # weight declarations for it); verify topology and that calibrated
    # weights keep every ReLU input inside its certified value range
    import numpy as np
    from ace_tpu.models import resnet as M
    from ace_tpu.compiler.relu_ranges import ranges_for

    g = M.load_model("resnet110_cifar10")
    relus = [op for op in g.ops if op.op_type == "Relu"]
    assert len(relus) == 109  # 54 blocks x 2 + stem (build script's count)
    assert len(g.ops) == 277
    dflt, vr = ranges_for("resnet110_cifar10")
    assert all(any(op.name == k for op in g.ops) for k in vr)
    logits = M.infer_plain(
        g, np.random.default_rng(3).uniform(-1.5, 1.5, (3, 32, 32)))
    assert np.all(np.isfinite(logits)) and np.max(np.abs(logits)) < 100
