"""Key-switch optimization tests (the ut_ksw_opt.cxx analog):
extended-basis rotation + hoisted accumulation must match the plain
rotate/mul/add path within CKKS noise."""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ckks.encoder import Encoder
from ace_tpu.ckks.keygen import KeyGenerator
from ace_tpu.ckks.evaluator import Evaluator
from ace_tpu.compiler.packing import FheBackend

EPS = 5e-3
RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def ctx():
    params = CkksParams(degree=16, num_q=4, first_mod_size=33,
                        scaling_mod_size=30)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(77))
    ev = Evaluator(params, kg, enc)
    return params, enc, kg, ev


def test_rotate_ext_matches_rotate(ctx):
    params, enc, kg, ev = ctx
    m = RNG.uniform(-1, 1, 8) + 1j * RNG.uniform(-1, 1, 8)
    ct = ev.encrypt(enc.encode(m))
    ext = ev.rotate_ext(ct, 2)
    got = enc.decode(ev.decrypt(ev.mod_down_ciph(ext)))
    assert np.allclose(got, np.roll(m, -2), atol=EPS)


def test_to_ext_mod_down_roundtrip(ctx):
    params, enc, kg, ev = ctx
    m = RNG.uniform(-1, 1, 8) + 1j * RNG.uniform(-1, 1, 8)
    ct = ev.encrypt(enc.encode(m))
    got = enc.decode(ev.decrypt(ev.mod_down_ciph(ev.to_ext(ct))))
    assert np.allclose(got, m, atol=EPS)


def test_hoisted_ext_mac_groups(ctx):
    """sum_k rot(x, k) * w_k via one mod-up/mod-down == naive path
    (mod-down hoisting, ut_ksw_opt.cxx:349-375)."""
    params, enc, kg, ev = ctx
    be = FheBackend(ev, enc)
    m = RNG.uniform(-1, 1, 8)
    ct = ev.encrypt(enc.encode(m.astype(np.complex128)))
    rots = [0, 1, 3]
    weights = [RNG.uniform(-1, 1, 8) for _ in rots]
    got_ct = be.rot_ext_mac_groups(ct, rots, [weights])[0]
    got = enc.decode(ev.decrypt(got_ct)).real
    want = sum(np.roll(m, -r) * w for r, w in zip(rots, weights))
    # result carries sf_degree 2 -> decode handles the scale
    assert np.allclose(got, want, atol=5e-2), (got, want)


def test_rot_sum(ctx):
    params, enc, kg, ev = ctx
    be = FheBackend(ev, enc)
    m1 = RNG.uniform(-1, 1, 8)
    m2 = RNG.uniform(-1, 1, 8)
    c1 = ev.encrypt(enc.encode(m1.astype(np.complex128)))
    c2 = ev.encrypt(enc.encode(m2.astype(np.complex128)))
    got_ct = be.rot_sum([(c1, 0), (c2, 2)])
    got = enc.decode(ev.decrypt(got_ct)).real
    assert np.allclose(got, m1 + np.roll(m2, -2), atol=EPS)


def test_shared_digits_many_rotations(ctx):
    """Mod-up hoisting: one Switch_key_precompute reused across
    rotation indices gives the same results as fresh decompositions."""
    params, enc, kg, ev = ctx
    m = RNG.uniform(-1, 1, 8) + 1j * RNG.uniform(-1, 1, 8)
    ct = ev.encrypt(enc.encode(m))
    digits = ev.switch_key_precompute(ct.c1)
    for r in (1, 2, 5):
        got = enc.decode(ev.decrypt(
            ev.mod_down_ciph(ev.rotate_ext(ct, r, digits))))
        assert np.allclose(got, np.roll(m, -r), atol=EPS), r


def test_rot_key_lru_regeneration(ctx):
    """Evicted rotation keys regenerate with fresh randomness and still
    decrypt correctly (keys are independent encryptions of the rotated
    secret)."""
    from ace_tpu.ckks.keygen import KeyGenerator
    from ace_tpu.ckks.evaluator import Evaluator
    params, enc, kg0, _ = ctx
    kg = KeyGenerator(params, np.random.default_rng(5), max_rot_keys=2)
    ev = Evaluator(params, kg, enc)
    m = RNG.uniform(-1, 1, 8) + 1j * RNG.uniform(-1, 1, 8)
    ct = ev.encrypt(enc.encode(m))
    for r in (1, 2, 3, 1, 4, 2):   # forces evictions and regenerations
        got = enc.decode(ev.decrypt(ev.rotate(ct, r)))
        assert np.allclose(got, np.roll(m, -r), atol=EPS), r
    assert len(kg._rot_keys) <= 2
