"""Pallas 4-step NTT: bit-exact equivalence with the 1-step path.

The kernel runs in interpret mode on CPU; on TPU hardware the same
code lowers to Mosaic (verified on-device by bench.py / verify drives).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ace_tpu.ops import ntt, ntt4
from ace_tpu.utils import number_theory as nt

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("n", [1024, 4096])
def test_ntt4_matches_1step(n):
    primes = nt.generate_q_primes(3, 60, 56, n)
    t1 = ntt.make_ntt_tables(primes, n, four_step=False)
    t4 = ntt4.make_ntt4_tables(primes, n)
    x = jnp.asarray(np.stack(
        [RNG.integers(0, q, n, dtype=np.uint64) for q in primes]))
    a = ntt.ntt_fwd(x, t1)
    b = ntt4.ntt4_fwd(x, t4)
    assert (np.asarray(a) == np.asarray(b)).all()
    ai = ntt.ntt_inv(a, t1)
    bi = ntt4.ntt4_inv(b, t4)
    assert (np.asarray(ai) == np.asarray(bi)).all()
    assert (np.asarray(bi) == np.asarray(x)).all()


def test_ntt4_odd_log2():
    n = 2048  # R=64, C=32
    primes = nt.generate_q_primes(2, 45, 40, n)
    t1 = ntt.make_ntt_tables(primes, n, four_step=False)
    t4 = ntt4.make_ntt4_tables(primes, n)
    x = jnp.asarray(np.stack(
        [RNG.integers(0, q, n, dtype=np.uint64) for q in primes]))
    assert (np.asarray(ntt.ntt_fwd(x, t1))
            == np.asarray(ntt4.ntt4_fwd(x, t4))).all()


def test_ntt4_index_tables():
    n = 1024
    primes = nt.generate_q_primes(4, 60, 56, n)
    t1 = ntt.make_ntt_tables(primes, n, four_step=False)
    t4 = ntt4.make_ntt4_tables(primes, n)
    sub = ntt4.index_tables(t4, [1, 3])
    x = jnp.asarray(np.stack(
        [RNG.integers(0, primes[i], n, dtype=np.uint64) for i in (1, 3)]))
    t1s = ntt.gather_tables(t1, [1, 3])
    assert (np.asarray(ntt.ntt_fwd(x, t1s))
            == np.asarray(ntt4.ntt4_fwd(x, sub))).all()
