"""End-to-end encrypted CNN inference at tiny ring degree.

The full pipeline of the reference's generated programs
(dataset/resnet_cifar.main.inc): NN graph -> scheme-info param
selection -> context/keys -> encode+encrypt -> conv metakernel ->
bootstrap -> composite-sign ReLU -> pooling -> decrypt/decode ->
compare against plain inference. This is the miniature of the ResNet
flow that runs in CI; the real models run in the slow tier / on TPU.
"""

import numpy as np
import pytest

from ace_tpu.compiler.onnx_front import NNOp, NNGraph
from ace_tpu.compiler.scheme_info import SchemeConfig, select_params
from ace_tpu.models import resnet as M

RNG = np.random.default_rng(17)


def tiny_cnn():
    """Conv(1->2, 3x3, same) -> ReLU -> GlobalAveragePool on 4x4."""
    w = RNG.uniform(-0.5, 0.5, (2, 1, 3, 3))
    b = RNG.uniform(-0.1, 0.1, 2)
    ops = [
        NNOp("Conv", "conv1", ["input", "w1", "b1"], ["c1"],
             {"strides": [1, 1], "pads": [1, 1, 1, 1]},
             in_shape=(1, 1, 4, 4), out_shape=(1, 2, 4, 4)),
        NNOp("Relu", "relu1", ["c1"], ["r1"], {},
             in_shape=(1, 2, 4, 4), out_shape=(1, 2, 4, 4)),
        NNOp("GlobalAveragePool", "gap", ["r1"], ["out"], {},
             in_shape=(1, 2, 4, 4), out_shape=(1, 2, 1, 1)),
    ]
    return NNGraph(ops, {"w1": w, "b1": b}, "input", (1, 1, 4, 4), "out")


def ref_forward(g, x):
    w, b = g.weights["w1"], g.weights["b1"]
    xp = np.zeros((1, 6, 6))
    xp[:, 1:5, 1:5] = x
    out = np.zeros((2, 4, 4))
    for co in range(2):
        for i in range(4):
            for j in range(4):
                out[co, i, j] = np.sum(xp[0, i:i + 3, j:j + 3] * w[co, 0]) \
                    + b[co]
    return np.maximum(out, 0).mean(axis=(1, 2))


def test_scheme_selection_tiny():
    g = tiny_cnn()
    cfg = SchemeConfig(security_level=0, hamming_weight=32)
    info = select_params(g, cfg)
    assert info.poly_degree == 64
    assert info.mul_level >= 15 + 14  # bootstrap + relu segment


def test_tiny_cnn_plain_vm_matches_numpy():
    from ace_tpu.compiler import packing as pk
    g = tiny_cnn()
    x = RNG.uniform(-1, 1, (1, 4, 4))
    got = M.infer_plain(g, x, n_slots=32)
    assert np.allclose(got[:2], ref_forward(g, x), atol=1e-9)


@pytest.mark.slow
def test_tiny_cnn_encrypted_end_to_end():
    g = tiny_cnn()
    cfg = SchemeConfig(security_level=0, hamming_weight=32,
                       relu_value_range=2.0, relu_mul_depth=13)
    model = M.compile_model(g, cfg, num_classes=2)
    x = RNG.uniform(-1, 1, (1, 4, 4))
    got = M.infer_encrypted(model, x)
    want = ref_forward(g, x)
    assert np.max(np.abs(got - want)) < 5e-2, (got, want)


@pytest.mark.slow
def test_tiny_cnn_encrypted_with_rtt_validation():
    """-VEC:rtt analog: lockstep shadow validation through the whole
    encrypted graph (raises on divergence)."""
    g = tiny_cnn()
    cfg = SchemeConfig(security_level=0, hamming_weight=32,
                       relu_value_range=2.0, relu_mul_depth=13)
    model = M.compile_model(g, cfg, num_classes=2, check_every=True)
    x = RNG.uniform(-1, 1, (1, 4, 4))
    got = M.infer_encrypted(model, x)
    assert np.max(np.abs(got - ref_forward(g, x))) < 5e-2
