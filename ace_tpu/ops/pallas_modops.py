"""Pallas TPU kernels for modular arithmetic over u32-plane residues.

The jnp u64 path is bit-exact but XLA emulates every u64 op over u32
pairs with poor fusion (~8 ns/element/op measured). These kernels do
the digit arithmetic explicitly in 16/32-bit units the VPU natively
supports. A 64-bit value is carried as two uint32 planes (lo, hi);
all intermediate products use 16x16->32 exact multiplies.

Current coverage (the elementwise hot ops of the CKKS op stream):
  - shoup_mul_kernel:   x*w mod q with precomputed w_prec (twiddles,
                        per-limb constants)
  - barrett_mul_kernel: a*b mod q (ciphertext pointwise products,
                        key-switch digit MACs)
Same canonical-residue contracts as ops/modops.py; verified bit-exact
against the u64 path in tests.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32


def _mul32(a, b):
    """Exact 32x32 -> 64 product as (hi, lo) u32, via 16-bit digits."""
    a_lo = a & 0xFFFF
    a_hi = a >> 16
    b_lo = b & 0xFFFF
    b_hi = b >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # mid accumulation with carries
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    lo = (ll & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def _add64(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo + b_lo
    carry = (lo < b_lo).astype(U32)
    return a_hi + b_hi + carry, lo


def _mulhi64(a_hi, a_lo, b_hi, b_lo):
    """High 64 bits of the 128-bit product, as (hi, lo) u32 planes."""
    # partial products (each 64-bit as hi/lo u32):
    p0h, p0l = _mul32(a_lo, b_lo)          # weight 2^0
    p1h, p1l = _mul32(a_lo, b_hi)          # weight 2^32
    p2h, p2l = _mul32(a_hi, b_lo)          # weight 2^32
    p3h, p3l = _mul32(a_hi, b_hi)          # weight 2^64
    # column at 2^32: p0h + p1l + p2l  (carries into 2^64)
    c1 = p0h + p1l
    carry1 = (c1 < p1l).astype(U32)
    c1b = c1 + p2l
    carry1 += (c1b < p2l).astype(U32)
    # column at 2^64: p1h + p2h + p3l + carry1
    c2 = p1h + p2h
    carry2 = (c2 < p2h).astype(U32)
    c2b = c2 + p3l
    carry2 += (c2b < p3l).astype(U32)
    c2c = c2b + carry1
    carry2 += (c2c < carry1).astype(U32)
    # column at 2^96: p3h + carry2
    hi = p3h + carry2
    return hi, c2c


def _mullo64(a_hi, a_lo, b_hi, b_lo):
    """Low 64 bits of the product, as (hi, lo) u32 planes."""
    p0h, p0l = _mul32(a_lo, b_lo)
    w32 = p0h + a_lo * b_hi + a_hi * b_lo   # wrapping at 2^32 is fine
    return w32, p0l


def _sub64(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo - b_lo
    borrow = (a_lo < b_lo).astype(U32)
    return a_hi - b_hi - borrow, lo


def _geq64(a_hi, a_lo, b_hi, b_lo):
    return (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo >= b_lo))


def _cond_sub_q(r_hi, r_lo, q_hi, q_lo):
    ge = _geq64(r_hi, r_lo, q_hi, q_lo)
    s_hi, s_lo = _sub64(r_hi, r_lo, q_hi, q_lo)
    return jnp.where(ge, s_hi, r_hi), jnp.where(ge, s_lo, r_lo)


def _shoup_kernel(x_lo, x_hi, w_lo, w_hi, wp_lo, wp_hi, q_lo, q_hi,
                  o_lo, o_hi):
    xl, xh = x_lo[:], x_hi[:]
    wl = w_lo[:]
    wh = w_hi[:]
    # quotient estimate: high 64 bits of x * w_prec
    qh, ql = _mulhi64(xh, xl, wp_hi[:], wp_lo[:])
    # r = x*w - q_est*q  (low 64 bits)
    xw_h, xw_l = _mullo64(xh, xl, wh, wl)
    qq_h, qq_l = _mullo64(qh, ql, q_hi[:], q_lo[:])
    r_hi, r_lo = _sub64(xw_h, xw_l, qq_h, qq_l)
    r_hi, r_lo = _cond_sub_q(r_hi, r_lo, q_hi[:], q_lo[:])
    o_lo[:] = r_lo
    o_hi[:] = r_hi


def _barrett_kernel(a_lo, a_hi, b_lo, b_hi, mul_lo, mul_hi, muh_lo, muh_hi,
                    q_lo, q_hi, o_lo, o_hi):
    """(a*b) mod q with 2-word Barrett, mirroring Mod_barrett_128
    (fhe_utils.h:238-283). mu = floor(2^128/q); mul_* = u32 planes of
    mu's low 64-bit word, muh_* = planes of its high word."""
    al, ah = a_lo[:], a_hi[:]
    bl, bh = b_lo[:], b_hi[:]
    mull, mulh = mul_lo[:], mul_hi[:]
    muhl, muhh = muh_lo[:], muh_hi[:]
    # v = a*b as two 64-bit words
    v_hi_h, v_hi_l = _mulhi64(ah, al, bh, bl)
    v_lo_h, v_lo_l = _mullo64(ah, al, bh, bl)
    # left = mulhi64(v_lo, mu_lo)
    left_h, left_l = _mulhi64(v_lo_h, v_lo_l, mulh, mull)
    # mid = v_lo * mu_hi (128-bit: mid_h, mid_l)
    mid_h2, mid_l2 = _mulhi64(v_lo_h, v_lo_l, muhh, muhl)
    midlo_h, midlo_l = _mullo64(v_lo_h, v_lo_l, muhh, muhl)
    # tmp1 = mid_l + left; carry
    t1_h, t1_l = _add64(midlo_h, midlo_l, left_h, left_l)
    lt = (t1_h < left_h) | ((t1_h == left_h) & (t1_l < left_l))
    carry = lt.astype(U32)
    t2_h, t2_l = _add64(mid_h2, mid_l2, jnp.zeros_like(carry), carry)
    # mid2 = v_hi * mu_lo
    m2_h2, m2_l2 = _mulhi64(v_hi_h, v_hi_l, mulh, mull)
    m2lo_h, m2lo_l = _mullo64(v_hi_h, v_hi_l, mulh, mull)
    s_h, s_l = _add64(m2lo_h, m2lo_l, t1_h, t1_l)
    lt2 = (s_h < t1_h) | ((s_h == t1_h) & (s_l < t1_l))
    carry2 = lt2.astype(U32)
    l2_h, l2_l = _add64(m2_h2, m2_l2, jnp.zeros_like(carry2), carry2)
    # quot = lowword(v_hi * mu_hi) + tmp2 + left2
    vm_h, vm_l = _mullo64(v_hi_h, v_hi_l, muhh, muhl)
    quot_h, quot_l = _add64(vm_h, vm_l, t2_h, t2_l)
    quot_h, quot_l = _add64(quot_h, quot_l, l2_h, l2_l)
    # r = v_lo - quot*q (low 64)
    qq_h, qq_l = _mullo64(quot_h, quot_l, q_hi[:], q_lo[:])
    r_hi, r_lo = _sub64(v_lo_h, v_lo_l, qq_h, qq_l)
    r_hi, r_lo = _cond_sub_q(r_hi, r_lo, q_hi[:], q_lo[:])
    r_hi, r_lo = _cond_sub_q(r_hi, r_lo, q_hi[:], q_lo[:])
    o_lo[:] = r_lo
    o_hi[:] = r_hi


def _split(x64: jnp.ndarray):
    return (x64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), \
        (x64 >> jnp.uint64(32)).astype(jnp.uint32)


def _join(lo: jnp.ndarray, hi: jnp.ndarray):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _block_cols(L: int, N: int, n_arrays: int,
                budget: int = 4 << 20) -> int:
    blk = N
    while blk > 128 and L * blk * 4 * n_arrays > budget:
        blk //= 2
    return blk


def _elementwise_call(kernel, n_in: int, arrays):
    # GRIDLESS whole-array kernel: the axon remote-compile path cannot
    # legalize Pallas grid index maps, and elementwise kernels don't
    # need a grid — XLA/Mosaic pipelines whole VMEM arrays fine at the
    # sizes the CKKS op stream uses ([limbs, N] u32 planes).
    L, N = arrays[0].shape
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((L, N), jnp.uint32),
                 jax.ShapeDtypeStruct((L, N), jnp.uint32))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[spec] * n_in,
        out_specs=(spec, spec),
        interpret=jax.default_backend() == "cpu",
    )(*arrays)


@jax.jit
def shoup_mul(x, w, w_prec, q):
    """Drop-in for modops.shoup_mul on [L, N] u64 arrays via Pallas.
    w/w_prec/q broadcast per limb ([L, 1])."""
    xl, xh = _split(x)
    bshape = jnp.broadcast_to
    wl, wh = _split(bshape(w, x.shape))
    wpl, wph = _split(bshape(w_prec, x.shape))
    ql, qh = _split(bshape(q, x.shape))
    o_lo, o_hi = _elementwise_call(
        _shoup_kernel, 8, (xl, xh, wl, wh, wpl, wph, ql, qh))
    return _join(o_lo, o_hi)


@jax.jit
def barrett_mul(a, b, q, mu_hi, mu_lo):
    """Drop-in for modops.barrett_mul on [L, N] u64 arrays via Pallas."""
    al, ah = _split(a)
    bl, bh = _split(jnp.broadcast_to(b, a.shape))
    bshape = jnp.broadcast_to
    mul_l, mul_h = _split(bshape(mu_lo, a.shape))
    muh_l, muh_h = _split(bshape(mu_hi, a.shape))
    ql, qh = _split(bshape(q, a.shape))
    o_lo, o_hi = _elementwise_call(
        _barrett_kernel, 10,
        (al, ah, bl, bh, mul_l, mul_h, muh_l, muh_h, ql, qh))
    return _join(o_lo, o_hi)
