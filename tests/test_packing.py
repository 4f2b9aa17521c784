"""Packing/metakernel lowering tests: the slot VM (PlainBackend) vs
direct numpy convolution/pooling/gemm, plus an encrypted conv via the
FheBackend."""

import numpy as np
import pytest

from ace_tpu.compiler import packing as pk

RNG = np.random.default_rng(3)


def ref_conv2d(x, w, b, stride=1):
    """Direct NCHW conv, 'same' padding, square input."""
    c_out, c_in, kh, kw = w.shape
    _, h, wd = x.shape
    p = (kh - 1) // 2
    xp = np.zeros((c_in, h + 2 * p, wd + 2 * p))
    xp[:, p:p + h, p:p + wd] = x
    oh, ow = h // stride, wd // stride
    out = np.zeros((c_out, oh, ow))
    for co in range(c_out):
        for i in range(oh):
            for j in range(ow):
                patch = xp[:, i * stride:i * stride + kh,
                           j * stride:j * stride + kw]
                out[co, i, j] = np.sum(patch * w[co]) + b[co]
    return out


@pytest.mark.parametrize("c_in,c_out,h,stride", [
    (2, 4, 8, 1), (3, 3, 8, 1), (4, 8, 8, 2), (2, 2, 4, 2)])
def test_conv2d_plain(c_in, c_out, h, stride):
    be = pk.PlainBackend(1 << 12)
    x = RNG.standard_normal((c_in, h, h))
    w = RNG.standard_normal((c_out, c_in, 3, 3))
    b = RNG.standard_normal(c_out)
    packed = be.pack(x.reshape(-1))
    got = pk.conv2d(be, packed, w, b, h, h, stride)
    expect = ref_conv2d(x, w, b, stride)
    oh = h // stride
    assert np.allclose(got[:c_out * oh * oh],
                       expect.reshape(-1), atol=1e-9)


def test_avg_pool_plain():
    be = pk.PlainBackend(1 << 10)
    c, h, k = 3, 8, 2
    x = RNG.standard_normal((c, h, h))
    got = pk.average_pool(be, be.pack(x.reshape(-1)), c, h, h, k)
    expect = x.reshape(c, h // k, k, h // k, k).mean(axis=(2, 4))
    assert np.allclose(got[:c * (h // k) ** 2], expect.reshape(-1), atol=1e-9)


def test_global_avg_pool_plain():
    be = pk.PlainBackend(1 << 10)
    c, h = 8, 4
    x = RNG.standard_normal((c, h, h))
    got = pk.global_average_pool(be, be.pack(x.reshape(-1)), c, h, h)
    assert np.allclose(got[:c], x.mean(axis=(1, 2)), atol=1e-9)


@pytest.mark.parametrize("out_dim,in_dim", [(4, 16), (8, 8), (16, 64)])
def test_gemm_plain(out_dim, in_dim):
    be = pk.PlainBackend(1 << 10)
    w = RNG.standard_normal((out_dim, in_dim))
    b = RNG.standard_normal(out_dim)
    x = RNG.standard_normal(in_dim)
    got = pk.gemm(be, be.pack(x), w, b)
    assert np.allclose(got[:out_dim], w @ x + b, atol=1e-9)


def test_conv2d_encrypted():
    """End-to-end encrypted conv vs plain conv (small params)."""
    from ace_tpu.ckks.params import CkksParams
    from ace_tpu.ckks.encoder import Encoder
    from ace_tpu.ckks.keygen import KeyGenerator
    from ace_tpu.ckks.evaluator import Evaluator

    # slots must fit dup copies: c_in*h*h * 2 = 64 <= 128 slots
    c_in, c_out, h = 2, 2, 4
    params = CkksParams(degree=256, num_q=4, first_mod_size=40,
                        scaling_mod_size=33)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(11))
    ev = Evaluator(params, kg, enc)
    be = pk.FheBackend(ev, enc)

    x = RNG.uniform(-1, 1, (c_in, h, h))
    w = RNG.uniform(-1, 1, (c_out, c_in, 3, 3))
    b = RNG.uniform(-1, 1, c_out)

    vec = np.zeros(params.degree // 2, dtype=np.complex128)
    vec[:c_in * h * h] = x.reshape(-1)
    ct = ev.encrypt(enc.encode(vec))
    out_ct = pk.conv2d(be, ct, w, b, h, h, 1)
    got = enc.decode(ev.decrypt(out_ct)).real
    expect = ref_conv2d(x, w, b).reshape(-1)
    assert np.allclose(got[:len(expect)], expect, atol=5e-3)


def test_conv2d_channel_split_matches_direct():
    """Channel-expanding conv beyond the ring splits into chunks and
    concatenates compacted outputs (the N/2 = c_in*h*w packing)."""
    rng = np.random.default_rng(9)
    c_in, c_out, h, w, s = 2, 4, 4, 4, 2
    weight = rng.uniform(-1, 1, (c_out, c_in, 3, 3))
    bias = rng.uniform(-0.5, 0.5, c_out)
    x = rng.uniform(-1, 1, c_in * h * w)

    # big ring: no split
    be_big = pk.PlainBackend(256)
    ref = pk.conv2d(be_big, be_big.pack(x), weight, bias, h, w, s)
    # small ring: c_out*hw = 64 > 32 slots -> split into c_in-sized chunks
    be_small = pk.PlainBackend(32)
    got = pk.conv2d(be_small, be_small.pack(x), weight, bias, h, w, s)
    n_out = c_out * (h // s) * (w // s)
    assert np.allclose(got[:n_out], ref[:n_out], atol=1e-12)
