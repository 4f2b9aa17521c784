"""Chebyshev-PS evaluation and composite-sign ReLU tests."""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ckks.encoder import Encoder
from ace_tpu.ckks.keygen import KeyGenerator
from ace_tpu.ckks.evaluator import Evaluator
from ace_tpu.ckks import cheby, relu as relu_mod

RNG = np.random.default_rng(17)


def cheb_eval_plain(coeffs, x):
    """Clenshaw evaluation of sum c_i T_i(x)."""
    out = np.zeros_like(x)
    for i, c in enumerate(coeffs):
        out = out + c * np.cos(i * np.arccos(np.clip(x, -1, 1)))
    return out


def test_long_div_chebyshev_identity():
    rng = np.random.default_rng(0)
    f = list(rng.uniform(-1, 1, 14))
    g = [0.0] * 9
    g[-1] = 1.0
    q, r = cheby.long_div_chebyshev(f, g)
    # plain series convention on all lists (the doubled-c0 storage is
    # only the PUBLIC eval_chebyshev contract, handled at entry)
    x = np.linspace(-1, 1, 101)
    lhs = cheb_eval_plain(f, x)
    rhs = (cheb_eval_plain(q, x) * cheb_eval_plain(g, x)
           + cheb_eval_plain(r, x))
    assert np.allclose(lhs, rhs, atol=1e-9)


@pytest.fixture(scope="module")
def ctx():
    params = CkksParams(degree=64, num_q=16, first_mod_size=50,
                        scaling_mod_size=40)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(23))
    ev = Evaluator(params, kg, enc)
    return params, enc, kg, ev


def test_eval_chebyshev_deg15(ctx):
    params, enc, kg, ev = ctx
    coeffs = relu_mod.SIGN_CHEBYSHEV_DEPTH13[1]  # deg-15 odd poly
    x = RNG.uniform(-1, 1, 32)
    ct = ev.encrypt(enc.encode(x.astype(np.complex128)))
    out_ct = cheby.ChebyEvaluator(ev).eval_chebyshev(ct, coeffs)
    got = enc.decode(ev.decrypt(out_ct)).real
    expect = cheb_eval_plain(coeffs, x)
    assert np.max(np.abs(got - expect)) < 1e-4


def test_sign_and_relu(ctx):
    params, enc, kg, ev = ctx
    x = RNG.uniform(-1, 1, 32)
    x[np.abs(x) < 0.05] += 0.1  # composite sign is inaccurate near 0
    ct = ev.encrypt(enc.encode(x.astype(np.complex128)))
    out = enc.decode(ev.decrypt(relu_mod.relu(ev, ct, 1.0, 11))).real
    expect = np.maximum(x, 0)
    assert np.max(np.abs(out - expect)) < 5e-3


def test_sign_and_relu_depth9(ctx):
    # the reference's alfa=5 depth-9 composite (power basis converted
    # exactly to Chebyshev): transition band |x| < 2^-5
    params, enc, kg, ev = ctx
    x = RNG.uniform(-1, 1, 32)
    x[np.abs(x) < 2 ** -5] += 0.1
    ct = ev.encrypt(enc.encode(x.astype(np.complex128)))
    out = enc.decode(ev.decrypt(relu_mod.relu(ev, ct, 1.0, 9))).real
    expect = np.maximum(x, 0)
    assert np.max(np.abs(out - expect)) < 5e-3


def test_sign_and_relu_depth9_with_range(ctx):
    # per-ReLU value-range contract: inputs in [-4, 4], range=4
    params, enc, kg, ev = ctx
    x = RNG.uniform(-4, 4, 32)
    x[np.abs(x) < 4 * 2 ** -5] += 0.5
    ct = ev.encrypt(enc.encode(x.astype(np.complex128)))
    out = enc.decode(ev.decrypt(relu_mod.relu(ev, ct, 4.0, 9))).real
    expect = np.maximum(x, 0)
    assert np.max(np.abs(out - expect)) < 2e-2
