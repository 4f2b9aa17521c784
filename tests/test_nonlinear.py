"""exp / reciprocal / rsqrt approximations + slot-block helpers
(the primitives behind the encrypted transformer block)."""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ckks.encoder import Encoder
from ace_tpu.ckks.keygen import KeyGenerator
from ace_tpu.ckks.evaluator import Evaluator
from ace_tpu.ckks import nonlinear as NL

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def ctx():
    params = CkksParams(degree=64, num_q=24, first_mod_size=60,
                        scaling_mod_size=50)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(41))
    ev = Evaluator(params, kg, enc)
    return params, enc, kg, ev


def _roundtrip(ctx, x):
    params, enc, kg, ev = ctx
    return ev, enc, ev.encrypt(enc.encode(x.astype(np.complex128)))


def test_exp_smoke(ctx):
    x = RNG.uniform(-1.0, 1.0, 32)
    ev, enc, ct = _roundtrip(ctx, x)
    out = NL.exp(ev, ct, -1.0, 1.0, degree=7)
    got = enc.decode(ev.decrypt(out)).real
    assert np.max(np.abs(got - np.exp(x))) < 2e-3, got


@pytest.mark.slow
def test_exp(ctx):
    x = RNG.uniform(-5.0, 0.5, 32)
    ev, enc, ct = _roundtrip(ctx, x)
    out = NL.exp(ev, ct, -5.0, 0.5, degree=27)
    got = enc.decode(ev.decrypt(out)).real
    assert np.max(np.abs(got - np.exp(x))) < 2e-4, got


@pytest.mark.slow
def test_reciprocal(ctx):
    x = RNG.uniform(0.4, 8.0, 32)
    ev, enc, ct = _roundtrip(ctx, x)
    # rel err <= (1 - x_min/x_max)^(2^(iters+1)): 20:1 range needs 6
    out = NL.reciprocal(ev, ct, 8.0, iters=6)
    got = enc.decode(ev.decrypt(out)).real
    assert np.max(np.abs(got - 1.0 / x) / (1.0 / x)) < 5e-3, got


@pytest.mark.slow
def test_rsqrt(ctx):
    x = RNG.uniform(0.3, 4.0, 32)
    ev, enc, ct = _roundtrip(ctx, x)
    out = NL.rsqrt(ev, ct, 0.3, 4.0, degree=15, newton_iters=1)
    got = enc.decode(ev.decrypt(out)).real
    assert np.max(np.abs(got - 1.0 / np.sqrt(x))) < 1e-4, got


def test_block_sum_replicated(ctx):
    params, enc, kg, ev = ctx
    block, total = 8, 32
    x = RNG.uniform(-1, 1, total)
    ct = ev.encrypt(enc.encode(x.astype(np.complex128)))
    out = NL.block_sum_replicated(ev, ct, block, total, enc,
                                  mask_scale=1.0 / block)
    got = enc.decode(ev.decrypt(out)).real[:total]
    want = np.repeat(x.reshape(-1, block).mean(axis=1), block)
    assert np.max(np.abs(got - want)) < 1e-6, (got, want)
