"""NTT bit-exactness: device kernels vs pure-Python golden model and
algebraic properties (roundtrip, negacyclic convolution theorem)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ace_tpu.ops import ntt as ntt_mod
from ace_tpu.utils import number_theory as nt
from tests.golden import GoldenNtt, negacyclic_mul

RNG = np.random.default_rng(1)


def make_primes(degree, sizes):
    return nt.generate_q_primes(len(sizes), sizes[0], sizes[-1], degree)


@pytest.mark.parametrize("degree", [16, 64, 256])
def test_fwd_matches_golden(degree):
    primes = nt.generate_q_primes(3, 33, 30, degree)
    tables = ntt_mod.make_ntt_tables(primes, degree)
    data = np.stack([
        RNG.integers(0, q, size=degree, dtype=np.uint64) for q in primes])
    got = np.asarray(jax.jit(ntt_mod.ntt_fwd)(jnp.asarray(data), tables))
    for l, q in enumerate(primes):
        gold = GoldenNtt(degree, q).fwd([int(x) for x in data[l]])
        assert [int(x) for x in got[l]] == gold


@pytest.mark.parametrize("degree", [16, 64, 256])
def test_inv_matches_golden(degree):
    primes = nt.generate_q_primes(2, 33, 30, degree)
    tables = ntt_mod.make_ntt_tables(primes, degree)
    data = np.stack([
        RNG.integers(0, q, size=degree, dtype=np.uint64) for q in primes])
    got = np.asarray(jax.jit(ntt_mod.ntt_inv)(jnp.asarray(data), tables))
    for l, q in enumerate(primes):
        gold = GoldenNtt(degree, q).inv([int(x) for x in data[l]])
        assert [int(x) for x in got[l]] == gold


@pytest.mark.parametrize("degree", [16, 128, 1024])
def test_roundtrip(degree):
    primes = nt.generate_q_primes(2, 59, 56, degree)
    tables = ntt_mod.make_ntt_tables(primes, degree)
    data = np.stack([
        RNG.integers(0, q, size=degree, dtype=np.uint64) for q in primes])
    x = jnp.asarray(data)
    back = np.asarray(ntt_mod.ntt_inv(ntt_mod.ntt_fwd(x, tables), tables))
    assert np.array_equal(back, data)


def test_convolution_theorem():
    degree = 32
    primes = nt.generate_q_primes(1, 59, 59, degree)
    q = primes[0]
    tables = ntt_mod.make_ntt_tables(primes, degree)
    a = RNG.integers(0, q, size=degree, dtype=np.uint64)
    b = RNG.integers(0, q, size=degree, dtype=np.uint64)
    fa = ntt_mod.ntt_fwd(jnp.asarray(a[None]), tables)
    fb = ntt_mod.ntt_fwd(jnp.asarray(b[None]), tables)
    from ace_tpu.ops import modops
    mu_hi, mu_lo = modops.precompute_barrett128(q)
    prod = modops.barrett_mul(fa, fb, jnp.uint64(q), jnp.uint64(mu_hi),
                              jnp.uint64(mu_lo))
    got = np.asarray(ntt_mod.ntt_inv(prod, tables))[0]
    expected = negacyclic_mul([int(x) for x in a], [int(x) for x in b], q)
    assert [int(x) for x in got] == expected


def test_rou_table_consistency():
    """The cached order-32 ROU entries must be primitive roots."""
    for (order, prime), rou in list(nt._ROU_TABLE.items())[:5]:
        assert pow(rou, order, prime) == 1
        assert pow(rou, order // 2, prime) == prime - 1
