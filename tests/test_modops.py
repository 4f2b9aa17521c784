"""Bit-exactness tests for the uint64 modular arithmetic kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ace_tpu.ops import modops
from ace_tpu.utils import number_theory as nt

RNG = np.random.default_rng(0)

PRIMES = [
    nt.gen_first_prime(16, 59),     # ~59-bit q prime (tiny ring)
    nt.gen_first_prime(16, 30),     # ~30-bit
    nt.gen_first_prime(32768, 56),  # production-size scaling prime
    nt.gen_first_prime(32768, 60),  # production-size q0 prime
]


def rand_residues(q: int, n: int) -> np.ndarray:
    return (RNG.integers(0, 1 << 63, size=n, dtype=np.uint64) % np.uint64(q))


@pytest.mark.parametrize("q", PRIMES)
def test_add_sub_neg(q):
    a = rand_residues(q, 256)
    b = rand_residues(q, 256)
    qj = jnp.uint64(q)
    got_add = np.asarray(modops.add_mod(jnp.asarray(a), jnp.asarray(b), qj))
    got_sub = np.asarray(modops.sub_mod(jnp.asarray(a), jnp.asarray(b), qj))
    got_neg = np.asarray(modops.neg_mod(jnp.asarray(a), qj))
    for i in range(256):
        assert got_add[i] == (int(a[i]) + int(b[i])) % q
        assert got_sub[i] == (int(a[i]) - int(b[i])) % q
        assert got_neg[i] == (-int(a[i])) % q


def test_mul_hi64_exact():
    a = RNG.integers(0, 1 << 64, size=512, dtype=np.uint64)
    b = RNG.integers(0, 1 << 64, size=512, dtype=np.uint64)
    hi = np.asarray(modops.mul_hi64(jnp.asarray(a), jnp.asarray(b)))
    lo = np.asarray(modops.mul_lo64(jnp.asarray(a), jnp.asarray(b)))
    for i in range(512):
        p = int(a[i]) * int(b[i])
        assert int(hi[i]) == p >> 64
        assert int(lo[i]) == p & 0xFFFFFFFFFFFFFFFF


@pytest.mark.parametrize("q", PRIMES)
def test_shoup_mul(q):
    a = rand_residues(q, 256)
    w = int(rand_residues(q, 1)[0])
    w_prec = modops.precompute_shoup(w, q)
    got = np.asarray(modops.shoup_mul(
        jnp.asarray(a), jnp.uint64(w), jnp.uint64(w_prec & ((1 << 64) - 1)),
        jnp.uint64(q)))
    for i in range(256):
        assert int(got[i]) == int(a[i]) * w % q


@pytest.mark.parametrize("q", PRIMES)
def test_barrett_mul(q):
    a = rand_residues(q, 256)
    b = rand_residues(q, 256)
    mu_hi, mu_lo = modops.precompute_barrett128(q)
    got = np.asarray(modops.barrett_mul(
        jnp.asarray(a), jnp.asarray(b), jnp.uint64(q),
        jnp.uint64(mu_hi), jnp.uint64(mu_lo)))
    for i in range(256):
        assert int(got[i]) == int(a[i]) * int(b[i]) % q


@pytest.mark.parametrize("q", PRIMES)
def test_barrett_reduce_full_u64(q):
    a = RNG.integers(0, 1 << 64, size=256, dtype=np.uint64)
    mu_hi, mu_lo = modops.precompute_barrett128(q)
    got = np.asarray(modops.mod_u64(
        jnp.asarray(a), jnp.uint64(q), jnp.uint64(mu_hi), jnp.uint64(mu_lo)))
    for i in range(256):
        assert int(got[i]) == int(a[i]) % q


def test_jit_broadcast_limbs():
    qs = PRIMES[:3]
    L, N = len(qs), 64
    a = np.stack([rand_residues(q, N) for q in qs])
    b = np.stack([rand_residues(q, N) for q in qs])
    qarr = jnp.asarray(np.array(qs, dtype=np.uint64)[:, None])
    fn = jax.jit(modops.add_mod)
    got = np.asarray(fn(jnp.asarray(a), jnp.asarray(b), qarr))
    for l, q in enumerate(qs):
        for i in range(N):
            assert int(got[l, i]) == (int(a[l, i]) + int(b[l, i])) % q
