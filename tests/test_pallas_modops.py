"""Pallas u32-plane kernels must be bit-exact vs the u64 jnp path.
(Runs in interpreter mode on the CPU backend.)"""

import numpy as np
import jax.numpy as jnp

from ace_tpu.ops import modops, pallas_modops
from ace_tpu.utils import number_theory as nt

RNG = np.random.default_rng(9)


def _ctx(qbits):
    q = nt.gen_first_prime(128, qbits)
    a = RNG.integers(0, q, size=(2, 256), dtype=np.uint64)
    b = RNG.integers(0, q, size=(2, 256), dtype=np.uint64)
    return q, a, b


def test_pallas_shoup_matches_u64():
    q, a, _ = _ctx(59)
    w = int(RNG.integers(1, q))
    wp = modops.precompute_shoup(w, q)
    qa = jnp.asarray(np.full((2, 1), q, np.uint64))
    wa = jnp.asarray(np.full((2, 1), w, np.uint64))
    wpa = jnp.asarray(modops.np_u64([[wp]] * 2))
    ref = modops.shoup_mul(jnp.asarray(a), wa, wpa, qa)
    got = pallas_modops.shoup_mul(jnp.asarray(a), wa, wpa, qa)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_barrett_matches_u64():
    for qbits in (30, 50, 59, 60):
        q, a, b = _ctx(qbits)
        mu_hi, mu_lo = modops.precompute_barrett128(q)
        qa = jnp.asarray(np.full((2, 1), q, np.uint64))
        mh = jnp.asarray(modops.np_u64([[mu_hi]] * 2))
        ml = jnp.asarray(modops.np_u64([[mu_lo]] * 2))
        ref = modops.barrett_mul(jnp.asarray(a), jnp.asarray(b), qa, mh, ml)
        got = pallas_modops.barrett_mul(jnp.asarray(a), jnp.asarray(b),
                                        qa, mh, ml)
        assert np.array_equal(np.asarray(got), np.asarray(ref)), qbits
