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
    # convention: q's constant term is stored doubled (consumed as
    # q[0]/2 at evaluation time, ckks_chebyshev.c:227,323)
    q = [q[0] / 2] + list(q[1:])
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
