"""CKKS scheme-layer tests: mirrors the reference unittest strategy
(rtlib/ant/unittest/ut_ckks_arithmetic.cxx): tiny context (degree 16,
33/30-bit primes), encode -> encrypt -> op -> decrypt -> decode compared
against plain complex math within epsilon."""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ckks.encoder import Encoder
from ace_tpu.ckks.keygen import KeyGenerator
from ace_tpu.ckks.evaluator import Evaluator

EPS = 5e-3
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def ctx():
    params = CkksParams(degree=16, num_q=4, first_mod_size=33,
                        scaling_mod_size=30)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(1234))
    ev = Evaluator(params, kg, enc)
    return params, enc, kg, ev


def rand_msg(n=8):
    return (RNG.uniform(-1, 1, n) + 1j * RNG.uniform(-1, 1, n))


def test_encode_decode_roundtrip(ctx):
    params, enc, kg, ev = ctx
    msg = rand_msg()
    pl = enc.encode(msg)
    out = enc.decode(pl)
    assert np.allclose(out, msg, atol=1e-6)


def test_encode_decode_sf_degree2(ctx):
    params, enc, kg, ev = ctx
    msg = rand_msg()
    pl = enc.encode(msg, sf_degree=2)
    out = enc.decode(pl)
    assert np.allclose(out, msg, atol=1e-6)


def test_encrypt_decrypt(ctx):
    params, enc, kg, ev = ctx
    msg = rand_msg()
    ct = ev.encrypt(enc.encode(msg))
    out = enc.decode(ev.decrypt(ct))
    assert np.allclose(out, msg, atol=EPS)


def test_add_sub(ctx):
    params, enc, kg, ev = ctx
    m1, m2 = rand_msg(), rand_msg()
    c1 = ev.encrypt(enc.encode(m1))
    c2 = ev.encrypt(enc.encode(m2))
    assert np.allclose(enc.decode(ev.decrypt(ev.add(c1, c2))), m1 + m2,
                       atol=EPS)
    assert np.allclose(enc.decode(ev.decrypt(ev.sub(c1, c2))), m1 - m2,
                       atol=EPS)


def test_add_plain_and_const(ctx):
    params, enc, kg, ev = ctx
    m1, m2 = rand_msg(), rand_msg()
    c1 = ev.encrypt(enc.encode(m1))
    out = enc.decode(ev.decrypt(ev.add_plain(c1, enc.encode(m2))))
    assert np.allclose(out, m1 + m2, atol=EPS)
    out = enc.decode(ev.decrypt(ev.add_const(c1, 0.5)))
    assert np.allclose(out, m1 + 0.5, atol=EPS)


def test_mul_plain(ctx):
    params, enc, kg, ev = ctx
    m1, m2 = rand_msg(), rand_msg()
    c1 = ev.encrypt(enc.encode(m1))
    prod = ev.mul_plain(c1, enc.encode(m2))
    assert prod.sf_degree == 2
    out = enc.decode(ev.decrypt(prod))
    assert np.allclose(out, m1 * m2, atol=EPS)


def test_mul_relin(ctx):
    params, enc, kg, ev = ctx
    m1, m2 = rand_msg(), rand_msg()
    c1 = ev.encrypt(enc.encode(m1))
    c2 = ev.encrypt(enc.encode(m2))
    prod = ev.mul(c1, c2)
    out = enc.decode(ev.decrypt(prod))
    assert np.allclose(out, m1 * m2, atol=EPS)


def test_mul_rescale(ctx):
    params, enc, kg, ev = ctx
    m1, m2 = rand_msg(), rand_msg()
    c1 = ev.encrypt(enc.encode(m1))
    c2 = ev.encrypt(enc.encode(m2))
    prod = ev.rescale(ev.mul(c1, c2))
    assert prod.level == 3 and prod.sf_degree == 1
    out = enc.decode(ev.decrypt(prod))
    assert np.allclose(out, m1 * m2, atol=EPS)


def test_mul_chain_depth3(ctx):
    params, enc, kg, ev = ctx
    m = rand_msg() * 0.9
    c = ev.encrypt(enc.encode(m))
    acc, expect = c, m.copy()
    for _ in range(3):
        acc = ev.rescale(ev.mul(acc, acc))
        expect = expect * expect
    out = enc.decode(ev.decrypt(acc))
    assert np.allclose(out, expect, atol=5e-2)


@pytest.mark.parametrize("rot", [1, 2, 3, 7, -1, -3])
def test_rotate(ctx, rot):
    params, enc, kg, ev = ctx
    m = rand_msg()
    c = ev.encrypt(enc.encode(m))
    out = enc.decode(ev.decrypt(ev.rotate(c, rot)))
    assert np.allclose(out, np.roll(m, -rot), atol=EPS)


def test_conjugate(ctx):
    params, enc, kg, ev = ctx
    m = rand_msg()
    c = ev.encrypt(enc.encode(m))
    out = enc.decode(ev.decrypt(ev.conjugate(c)))
    assert np.allclose(out, np.conj(m), atol=EPS)


def test_mul_by_monomial(ctx):
    params, enc, kg, ev = ctx
    m = rand_msg()
    c = ev.encrypt(enc.encode(m))
    # x^(N/ (2*slots) * ... ) — multiplying by x^gap*k rotates-ish; just
    # check x^0 and x^N (= -1)
    out = enc.decode(ev.decrypt(ev.mul_by_monomial(c, 2 * 16)))
    assert np.allclose(out, m, atol=EPS)
    out = enc.decode(ev.decrypt(ev.mul_by_monomial(c, 16)))
    assert np.allclose(out, -m, atol=EPS)


def test_upscale_downscale(ctx):
    params, enc, kg, ev = ctx
    m = rand_msg()
    c = ev.encrypt(enc.encode(m))
    # note: encode's +0.5-before-llround bias (ckks_encoder.c:248-252)
    # makes tiny upscales lossy by design; use a realistic scale
    up = ev.upscale(c, 16)
    assert np.allclose(enc.decode(ev.decrypt(up)), m, atol=EPS)


def test_sparse_slots(ctx):
    params, enc, kg, ev = ctx
    m = rand_msg(4)
    pl = enc.encode(m, slots=4)
    ct = ev.encrypt(pl)
    out = enc.decode(ev.decrypt(ct))
    assert np.allclose(out[:4], m, atol=EPS)
