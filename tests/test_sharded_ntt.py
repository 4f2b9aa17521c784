"""Slot-sharded NTT over the virtual 8-device mesh: bit-exact with the
single-device path, collectives inserted by shard_map/all_to_all."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ace_tpu.ops import ntt
from ace_tpu.parallel import sharded_ntt as S
from ace_tpu.utils import number_theory as nt

RNG = np.random.default_rng(6)


@pytest.mark.parametrize("n,d", [(1024, 4), (4096, 8)])
def test_sharded_fwd_matches_single_device(n, d):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip("needs virtual device mesh")
    mesh = Mesh(np.array(devs[:d]), ("limb",))
    primes = nt.generate_q_primes(3, 60, 56, n)
    t1 = ntt.make_ntt_tables(primes, n, four_step=False)
    ts = S.make_sharded_ntt_tables(primes, n)
    x = jnp.asarray(np.stack(
        [RNG.integers(0, q, n, dtype=np.uint64) for q in primes]))
    want = np.asarray(ntt.ntt_fwd(x, t1))
    got = np.asarray(S.sharded_ntt_fwd(x, ts, mesh))
    assert (got == want).all()


@pytest.mark.parametrize("n,d", [(1024, 4), (4096, 8), (8192, 2)])
def test_sharded_inv_matches_single_device(n, d):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip("needs virtual device mesh")
    mesh = Mesh(np.array(devs[:d]), ("limb",))
    primes = nt.generate_q_primes(3, 60, 56, n)
    t1 = ntt.make_ntt_tables(primes, n, four_step=False)
    ts = S.make_sharded_ntt_tables(primes, n)
    x = jnp.asarray(np.stack(
        [RNG.integers(0, q, n, dtype=np.uint64) for q in primes]))
    want = np.asarray(ntt.ntt_inv(x, t1))
    got = np.asarray(S.sharded_ntt_inv(x, ts, mesh))
    assert (got == want).all()


@pytest.mark.parametrize("n,d", [(1024, 4), (4096, 8)])
def test_sharded_roundtrip(n, d):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip("needs virtual device mesh")
    mesh = Mesh(np.array(devs[:d]), ("limb",))
    primes = nt.generate_q_primes(4, 60, 56, n)
    ts = S.make_sharded_ntt_tables(primes, n)
    x = jnp.asarray(np.stack(
        [RNG.integers(0, q, n, dtype=np.uint64) for q in primes]))
    y = S.sharded_ntt_fwd(x, ts, mesh)
    back = np.asarray(S.sharded_ntt_inv(y, ts, mesh))
    assert (back == np.asarray(x)).all()
