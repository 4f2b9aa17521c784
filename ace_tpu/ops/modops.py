"""Exact modular arithmetic device kernels (uint64 residues).

All functions operate on jnp.uint64 arrays and return canonical residues
in [0, q). Broadcasting follows jnp rules, so per-limb modulus arrays of
shape [L, 1] apply across coefficient arrays of shape [L, N].

Numeric contracts match the reference CPU runtime's primitives
(fhe-cmplr/rtlib/ant/include/util/fhe_utils.h):
  add/sub:     fhe_utils.h:192-217  (single conditional correction)
  Shoup mul:   fhe_utils.h:311-324  (Fast_mul_const_with_mod)
  Barrett-128: fhe_utils.h:238-283  (Mod_barrett_128, SEAL-style 2-word mu)

On TPU, XLA emulates u64 over u32 pairs — results are bit-exact (verified
on hardware). The Pallas fast path re-implements the same contracts over
explicit 32-bit digits; both paths produce identical canonical residues.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_M32 = jnp.uint64(0xFFFFFFFF)
_U64 = jnp.uint64


def to_u64(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint64)


def add_mod(a, b, q):
    """(a + b) mod q for a, b in [0, q), q < 2^63."""
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    """(a - b) mod q for a, b in [0, q)."""
    return jnp.where(a >= b, a - b, a + q - b)


def neg_mod(a, q):
    """(-a) mod q, canonical (0 stays 0)."""
    return jnp.where(a == 0, a, q - a)


def mul_lo64(a, b):
    """Low 64 bits of a*b (wrapping)."""
    return a * b


def mul_hi64(a, b):
    """High 64 bits of the exact 128-bit product a*b."""
    a_lo = a & _M32
    a_hi = a >> _U64(32)
    b_lo = b & _M32
    b_hi = b >> _U64(32)
    lo = a_lo * b_lo
    m1 = a_hi * b_lo
    m2 = a_lo * b_hi
    hi = a_hi * b_hi
    # carry column: bits [32, 96) of the product
    t = (lo >> _U64(32)) + (m1 & _M32) + (m2 & _M32)
    return hi + (m1 >> _U64(32)) + (m2 >> _U64(32)) + (t >> _U64(32))


def mul_128(a, b):
    """Exact 128-bit product as (hi, lo) uint64 words."""
    return mul_hi64(a, b), a * b


def shoup_mul(x, w, w_prec, q):
    """x*w mod q with Shoup-precomputed w_prec = floor(w * 2^64 / q).

    Requires x in [0, q), w in [0, q). Matches Fast_mul_const_with_mod
    (fhe_utils.h:311): quotient estimate via mulhi, one correction.
    """
    qq = mul_hi64(x, w_prec)
    r = x * w - qq * q
    return jnp.where(r >= q, r - q, r)


def barrett_reduce_128(v_hi, v_lo, q, mu_hi, mu_lo):
    """Reduce the 128-bit value (v_hi:v_lo) mod q.

    mu = floor(2^128 / q) as two u64 words. SEAL-style word algorithm,
    mirroring Mod_barrett_128 (fhe_utils.h:238-283); the estimate is off
    by at most a few q, corrected by conditional subtractions.
    """
    left_h = mul_hi64(v_lo, mu_lo)
    mid_h, mid_l = mul_128(v_lo, mu_hi)
    tmp1 = mid_l + left_h
    carry = (tmp1 < left_h).astype(jnp.uint64)
    tmp2 = mid_h + carry
    mid2_h, mid2_l = mul_128(v_hi, mu_lo)
    carry2 = ((mid2_l + tmp1) < tmp1).astype(jnp.uint64)
    left2 = mid2_h + carry2
    quot = v_hi * mu_hi + tmp2 + left2
    r = v_lo - quot * q
    r = jnp.where(r >= q, r - q, r)
    r = jnp.where(r >= q, r - q, r)
    return r


def barrett_mul(a, b, q, mu_hi, mu_lo):
    """(a * b) mod q via 128-bit product + Barrett reduction.

    Works for any a, b in [0, q) with q < 2^63.
    """
    hi, lo = mul_128(a, b)
    return barrett_reduce_128(hi, lo, q, mu_hi, mu_lo)


def mod_u64(a, q, mu_hi, mu_lo):
    """a mod q for full-range uint64 a (via Barrett-128 with v_hi=0)."""
    return barrett_reduce_128(jnp.zeros_like(a), a, q, mu_hi, mu_lo)


# ---------------------------------------------------------------------------
# Dispatched fast paths: Pallas u32-plane kernels on TPU for big arrays,
# the exact-u64 jnp path elsewhere. Bit-identical outputs either way.
# ---------------------------------------------------------------------------

_PALLAS_MIN_ELEMS = 1 << 17


def _use_pallas(x) -> bool:
    """Default OFF: measured on v5e, XLA's fused u64 emulation beats the
    standalone DMA-loop kernel for single elementwise ops (0.95 vs
    1.4 ms at [24, 2^16]) — the Pallas win is VMEM residency across
    many stages (the NTT), not u32 planes per se. ACE_TPU_PALLAS_EW=on
    re-enables for experiments."""
    import os
    if os.environ.get("ACE_TPU_PALLAS_EW", "off") != "on":
        return False
    return x.ndim == 2 and x.size >= _PALLAS_MIN_ELEMS


def barrett_mul_d(a, b, q, mu_hi, mu_lo):
    """barrett_mul with Pallas dispatch for large device arrays."""
    if _use_pallas(a):
        from ace_tpu.ops import pallas_modops as pm
        return pm.barrett_mul(a, b, q, mu_hi, mu_lo)
    return barrett_mul(a, b, q, mu_hi, mu_lo)


def shoup_mul_d(x, w, w_prec, q):
    """shoup_mul with Pallas dispatch for large device arrays."""
    if _use_pallas(x):
        from ace_tpu.ops import pallas_modops as pm
        return pm.shoup_mul(x, w, w_prec, q)
    return shoup_mul(x, w, w_prec, q)


# ---------------------------------------------------------------------------
# Host-side precompute helpers (Python ints -> numpy u64)
# ---------------------------------------------------------------------------

def precompute_shoup(w: int, q: int) -> int:
    """floor(w * 2^64 / q); reference Precompute_const (fhe_utils.h:378)."""
    return (w << 64) // q


def precompute_barrett128(q: int) -> tuple[int, int]:
    """mu = floor(2^128/q) as (hi, lo) words; Precompute_const_128."""
    mu = (1 << 128) // q
    return mu >> 64, mu & 0xFFFFFFFFFFFFFFFF


def np_u64(vals) -> np.ndarray:
    """Python ints -> numpy uint64 array (values must fit in 64 bits)."""
    def conv(v):
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        return int(v) & 0xFFFFFFFFFFFFFFFF
    return np.array(conv(list(vals)), dtype=np.uint64)
