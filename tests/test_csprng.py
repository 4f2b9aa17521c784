"""BLAKE2 CSPRNG sampling statistics + determinism (prng.c:13-40,
random_sample.c:39-173 posture)."""

import numpy as np

from ace_tpu.utils.csprng import Blake2Csprng


def test_integers_range_and_uniformity():
    r = Blake2Csprng(0)
    a = r.integers(0, 4, size=40000)
    assert a.min() >= 0 and a.max() <= 3
    counts = np.bincount(a, minlength=4)
    assert all(abs(c - 10000) < 1000 for c in counts)


def test_integers_signed_span():
    r = Blake2Csprng(1)
    b = r.integers(-1, 2, size=10000)
    assert set(np.unique(b)) == {-1, 0, 1}


def test_uniform_mod_prime():
    r = Blake2Csprng(2)
    q = (1 << 60) - 59
    u = r.integers(0, q, dtype=np.uint64, size=20000)
    assert int(u.max()) < q
    m = float(np.mean(u.astype(np.float64)))
    assert 0.48 * q < m < 0.52 * q


def test_choice_without_replacement():
    r = Blake2Csprng(3)
    pos = r.choice(32768, size=192, replace=False)
    assert len(set(pos.tolist())) == 192
    sg = r.choice(np.array([-1, 1]), size=192)
    assert set(np.unique(sg)) <= {-1, 1}


def test_determinism_and_seed_separation():
    a = Blake2Csprng(7).integers(0, 1 << 30, size=1000)
    b = Blake2Csprng(7).integers(0, 1 << 30, size=1000)
    c = Blake2Csprng(8).integers(0, 1 << 30, size=1000)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_keygen_roundtrip_with_csprng():
    """Keys from the CSPRNG encrypt/decrypt correctly."""
    import jax
    from ace_tpu.ckks.params import CkksParams
    from ace_tpu.runtime.context import FheContext

    params = CkksParams(degree=32, num_q=4, first_mod_size=33,
                        scaling_mod_size=30, hamming_weight=8,
                        num_q_parts=2)
    ctx = FheContext(params, seed=0)
    msg = np.linspace(-1, 1, 16)
    ctx.prepare_input(msg, "x")
    ct = ctx.get_input_data("x")
    ct = ctx.evaluator.rotate(ct, 3)
    ctx.set_output_data("y", ct)
    out = ctx.handle_output("y", 16)
    assert np.allclose(out, np.roll(msg, -3), atol=1e-2)
