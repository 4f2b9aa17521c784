"""RNS polynomial layer vs exact big-int oracles (ut_poly.cxx analog).

The fast base conversion is approximate-by-design (the hat-inv digit
sum can exceed the source modulus by small multiples), so the oracle
replicates the reference's exact integer algorithm
(polynomial.c:755-808), not plain CRT reconstruction.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ace_tpu.poly.rns import CrtContext
from ace_tpu.poly import poly as P
from ace_tpu.poly.poly import RnsPoly
from ace_tpu.utils import number_theory as nt
from tests.golden import GoldenNtt

DEGREE = 16
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def crt():
    return CrtContext(num_q=4, first_mod_size=33, scaling_mod_size=30,
                      degree=DEGREE, num_q_parts=2)


def rand_poly(crt, num_q, ntt=False):
    data = np.stack([RNG.integers(0, q, DEGREE, dtype=np.uint64)
                     for q in crt.q_primes[:num_q]])
    return RnsPoly(jnp.asarray(data), num_q, 0, ntt)


def golden_base_conv(old, old_qs, new_qs, hat_inv, hat_mod_new):
    """Fast_base_conv in exact big ints (polynomial.c:755-808)."""
    O, n = len(old_qs), len(old[0])
    out = []
    for nb, p in enumerate(new_qs):
        row = []
        for d in range(n):
            acc = 0
            for o in range(O):
                tmp = int(old[o][d]) * hat_inv[o] % old_qs[o]
                acc += tmp * hat_mod_new[nb][o]
            row.append(acc % p)
        out.append(row)
    return out


def test_mod_up_matches_golden(crt):
    """Decompose + raise digit 0 in coefficient form: the base-converted
    complement limbs must match the exact integer algorithm."""
    num_q = 4
    a = rand_poly(crt, num_q)
    part = P.decompose(a, crt, 0)
    raised = P.mod_up(part, crt, num_q, 0)
    assert raised.num_q == num_q and raised.num_p == crt.num_p

    level = num_q - 1
    sz = part.num_q
    part_qs = crt.parts[0][:sz]
    compl_idx = crt.compl_indices[level][0]
    compl_qs = [crt.all_primes[g] for g in compl_idx]
    hat_inv = crt.part_hat_inv_mod_q[0][sz - 1]
    mat = crt.part_hat_mod_compl[level][0]
    mat_t = [[mat[i][j] for i in range(sz)] for j in range(len(compl_qs))]
    want = golden_base_conv(np.asarray(part.data), part_qs, compl_qs,
                            hat_inv, mat_t)
    got = np.asarray(raised.data)
    # raised = [ext[:start]=nothing (part 0 starts at 0) -> original
    # digit limbs, then ext]
    for j, g in enumerate(compl_idx):
        row = got[sz + j] if g >= sz else got[g]
        assert list(row) == [v % crt.all_primes[g] for v in want[j]], j


def test_mod_down_matches_golden(crt):
    """Reduce Q ∪ P -> Q: new = (x_q - conv(x_p)) * P^-1 mod q
    (polynomial.c:928-966)."""
    num_q = 3
    n = DEGREE
    qs = crt.q_primes[:num_q]
    ps = crt.p_primes
    data = np.stack([RNG.integers(0, q, n, dtype=np.uint64)
                     for q in qs + ps])
    a = RnsPoly(jnp.asarray(data), num_q, crt.num_p, False)
    out = P.mod_down(a, crt)
    conv = golden_base_conv(
        data[num_q:], ps, qs, crt.p_hat_inv_mod_p,
        [row for row in crt.p_hat_mod_q[:num_q]])
    got = np.asarray(out.data)
    for i, q in enumerate(qs):
        pinv = crt.p_inv_mod_q[i]
        want = [((int(data[i][d]) - conv[i][d]) * pinv) % q
                for d in range(n)]
        assert list(got[i]) == want, i


def test_rescale_matches_golden(crt):
    """NTT-form rescale against the per-limb formula
    (polynomial.c:1097-1176) evaluated in exact big ints."""
    num_q = 3
    n = DEGREE
    qs = crt.q_primes[:num_q]
    a = rand_poly(crt, num_q)
    antt = P.to_ntt(a, crt)
    out = P.from_ntt(P.rescale(antt, crt), crt)
    got = np.asarray(out.data)

    last_q = qs[num_q - 1]
    k = num_q - 2
    coeffs = np.asarray(a.data)
    half = last_q >> 1
    for i in range(num_q - 1):
        q = qs[i]
        qlql = crt.ql_ql_inv_mod_ql_div_ql_mod_qi[k][i]
        ql_inv = crt.ql_inv_mod_qi[k][i]
        want = []
        for d in range(n):
            last = int(coeffs[num_q - 1][d])
            # Switch_modulus centered lift (fhe_utils.h:352-377)
            if last > half:
                sm = (last - last_q) % q
            else:
                sm = last % q
            corr = sm * qlql % q
            want.append((int(coeffs[i][d]) * ql_inv + corr) % q)
        assert list(got[i]) == want, i


def test_automorphism_ntt_form_is_permutation(crt):
    a = rand_poly(crt, 3, ntt=False)
    antt = P.to_ntt(a, crt)
    rot = P.automorphism(antt, 5, crt)
    srt = np.sort(np.asarray(rot.data), axis=1)
    srt2 = np.sort(np.asarray(antt.data), axis=1)
    assert (srt == srt2).all()


def test_decompose_extracts_digit_limbs(crt):
    a = rand_poly(crt, 4)
    d0 = P.decompose(a, crt, 0)
    d1 = P.decompose(a, crt, 1)
    per = crt.per_part_size
    assert (np.asarray(d0.data) == np.asarray(a.data)[:per]).all()
    assert (np.asarray(d1.data) == np.asarray(a.data)[per:4]).all()