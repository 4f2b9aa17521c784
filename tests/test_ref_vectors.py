"""Bit-exactness against REFERENCE-GENERATED vectors.

tests/vectors/ref_vectors.json is produced by scripts/refvec/
gen_vectors.sh, which compiles the UNMODIFIED reference rtlib
(fhe-cmplr/rtlib/ant) and dumps (input, output) pairs of its CKKS
algorithms at the ut_ckks_arithmetic fixture (degree 16, 8 primes,
33/30-bit — ut_ckks_arithmetic.cxx:26-31). Unlike tests/golden.py
(same-author python oracle), the provenance of these fixtures is the
reference binary itself, so agreement here pins our math to the
reference's, not to our own reading of it.

Keys and ciphertexts in the dump come from the reference's time-seeded
PRNG — not replayable — so the tests replay every DETERMINISTIC
transform on the dumped operands: NTT, encode, decrypt identity,
keyswitch digit decompose+raise, mul+relin, rescale, rotate.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from ace_tpu.ckks.cipher import Ciphertext
from ace_tpu.ckks.encoder import Encoder, Plaintext
from ace_tpu.ckks.evaluator import Evaluator
from ace_tpu.ckks.keygen import KeyGenerator, SwitchKey
from ace_tpu.ckks.params import CkksParams
from ace_tpu.poly import poly as P
from ace_tpu.poly.poly import RnsPoly

VEC = os.path.join(os.path.dirname(__file__), "vectors",
                   "ref_vectors.json")


@pytest.fixture(scope="module")
def vec():
    with open(VEC) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def params(vec):
    fx = vec["fixture"]
    p = CkksParams(degree=fx["degree"], num_q=fx["num_q"],
                   first_mod_size=fx["first_mod_size"],
                   scaling_mod_size=fx["scaling_mod_size"],
                   num_q_parts=fx["num_q_parts"])
    return p


def as_poly(obj) -> RnsPoly:
    """Reference POLYNOMIAL dump -> RnsPoly ([q limbs..., p limbs...],
    each `degree` residues, contiguous per limb)."""
    nq, np_, n = obj["num_q"], obj["num_p"], obj["degree"]
    data = np.asarray(obj["data"], dtype=np.uint64).reshape(nq + np_, n)
    return RnsPoly(jnp.asarray(data), nq, np_, bool(obj["is_ntt"]))


def as_ciph(obj) -> Ciphertext:
    return Ciphertext(as_poly(obj["c0"]), as_poly(obj["c1"]),
                      obj["scaling_factor"], obj["sf_degree"],
                      obj["slots"])


def as_swk(obj) -> SwitchKey:
    return SwitchKey([as_poly(p["b"]) for p in obj["parts"]],
                     [as_poly(p["a"]) for p in obj["parts"]])


def poly_eq(a: RnsPoly, b: RnsPoly) -> None:
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_prime_chains(vec, params):
    assert [int(q) for q in params.crt.q_primes] == vec["q_primes"]
    assert [int(p) for p in params.crt.p_primes] == vec["p_primes"]


def test_ntt_fwd_inv_bit_exact(vec, params):
    from ace_tpu.ops import ntt as NT
    fx = vec["fixture"]
    n = fx["degree"]
    for l, rec in enumerate(vec["ntt"]):
        q = rec["q"]
        tables = NT.make_ntt_tables([q], n, four_step=False)
        x = jnp.asarray(np.asarray(rec["input"], np.uint64)[None, :])
        fwd = np.asarray(NT.ntt_fwd(x, tables))[0]
        np.testing.assert_array_equal(
            fwd, np.asarray(rec["fwd"], np.uint64),
            err_msg=f"NTT fwd mismatch at prime {l}")
        inv = np.asarray(NT.ntt_inv(
            jnp.asarray(np.asarray(rec["fwd"], np.uint64)[None, :]),
            tables))[0]
        np.testing.assert_array_equal(
            inv, np.asarray(rec["inv_roundtrip"], np.uint64),
            err_msg=f"NTT inv mismatch at prime {l}")


def test_encode_bit_exact(vec, params):
    enc = Encoder(params)
    msg = np.asarray(vec["encode_msg_re"], np.float64)
    pt = enc.encode(msg, vec["encode_poly"]["num_q"],
                    params.degree // 2)
    poly_eq(pt.poly, as_poly(vec["encode_poly"]))


def test_decrypt_identity(vec, params):
    """decrypt(c) = c0 + c1*s over Q — deterministic given the dumped
    secret key and ciphertext (ckks_decryptor.c:18-57)."""
    crt = params.crt
    ct = as_ciph(vec["fresh_ciph"])
    sk_ntt = as_poly(vec["sk_ntt"])
    level = ct.c0.num_q
    sk = RnsPoly(sk_ntt.data[:level], level, 0, True)
    m = P.add(P.mul(ct.c1, sk, crt), ct.c0, crt)
    poly_eq(m, as_poly(vec["decrypt_poly"]))


def test_decode_float(vec, params):
    enc = Encoder(params)
    pt = Plaintext(as_poly(vec["decrypt_poly"]),
                   vec["fresh_ciph"]["scaling_factor"],
                   vec["fresh_ciph"]["sf_degree"],
                   vec["fresh_ciph"]["slots"])
    got = enc.decode(pt).real
    np.testing.assert_allclose(
        got[:len(vec["decode_re"])], np.asarray(vec["decode_re"]),
        rtol=0, atol=1e-9)


def test_ksw_digits_bit_exact(vec, params):
    """Switch_key_precompute = per-part decompose + raise
    (polynomial.c Decompose_modup)."""
    crt = params.crt
    ct = as_ciph(vec["fresh_ciph"])
    digits = []
    num = crt.num_decomp(ct.c1.num_q)
    for part in range(num):
        d = P.decompose(ct.c1, crt, part)
        digits.append(P.mod_up(d, crt, ct.c1.num_q, part))
    assert len(digits) == len(vec["ksw_digits"])
    for i, (got, want) in enumerate(zip(digits, vec["ksw_digits"])):
        poly_eq(got, as_poly(want["raised"]))


def _evaluator(params, vec) -> Evaluator:
    """Evaluator with keys INJECTED from the dump (keygen randomness is
    not replayable; the ops under test are deterministic given keys)."""
    kg = KeyGenerator.__new__(KeyGenerator)
    kg.params = params
    kg.crt = params.crt
    kg.relin_key = as_swk(vec["relin_key"])
    ev = Evaluator(params, kg, Encoder(params))
    return ev


def test_mul_relin_bit_exact(vec, params):
    ev = _evaluator(params, vec)
    ct = as_ciph(vec["fresh_ciph"])
    got = ev.mul(ct, ct)
    want = as_ciph(vec["mul_relin"])
    poly_eq(got.c0, want.c0)
    poly_eq(got.c1, want.c1)
    assert got.scaling_factor == want.scaling_factor


def test_rescale_bit_exact(vec, params):
    ev = _evaluator(params, vec)
    got = ev.rescale(as_ciph(vec["mul_relin"]))
    want = as_ciph(vec["rescale"])
    poly_eq(got.c0, want.c0)
    poly_eq(got.c1, want.c1)
    assert got.scaling_factor == want.scaling_factor


def test_rotate_bit_exact(vec, params):
    ev = _evaluator(params, vec)
    kg = ev.keygen
    auto_idx = vec["auto_idx"]
    key = as_swk(vec["rot_key"])
    kg.rot_key = lambda r: (auto_idx, key)
    got = ev.rotate(as_ciph(vec["fresh_ciph"]), vec["rot_idx"])
    want = as_ciph(vec["rotate"])
    poly_eq(got.c0, want.c0)
    poly_eq(got.c1, want.c1)
