"""Pallas TPU kernels for modular arithmetic over u32-plane residues.

The jnp u64 path is bit-exact but XLA emulates every u64 op over u32
pairs with poor fusion. These kernels do the digit arithmetic
explicitly in 16/32-bit units the VPU natively supports. A 64-bit value
is carried as two uint32 planes (lo, hi); all intermediate products use
16x16->32 exact multiplies.

Kernel structure: GRIDLESS (the axon remote-compile path cannot
legalize Pallas grid index maps) — inputs stay in HBM/ANY and an
in-kernel fori_loop DMAs limb-row chunks into VMEM scratch, computes,
and DMAs results out (same pattern as ops/ntt4.py).

Coverage (the elementwise hot ops of the CKKS op stream):
  - shoup_mul:   x*w mod q with precomputed w_prec (twiddles, per-limb
                 constants)
  - barrett_mul: a*b mod q (ciphertext pointwise products, key-switch
                 digit MACs)
Same canonical-residue contracts as ops/modops.py; verified bit-exact
against the u64 path in tests and on TPU hardware.
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


# ---------------------------------------------------------------------------
# Value-level op bodies (shared by the DMA-loop kernels)
# ---------------------------------------------------------------------------

def _shoup_vals(xh, xl, wh, wl, wph, wpl, qh, ql):
    est_h, est_l = _mulhi64(xh, xl, wph, wpl)
    xw_h, xw_l = _mullo64(xh, xl, wh, wl)
    qq_h, qq_l = _mullo64(est_h, est_l, qh, ql)
    r_hi, r_lo = _sub64(xw_h, xw_l, qq_h, qq_l)
    return _cond_sub_q(r_hi, r_lo, qh, ql)


def _barrett_vals(ah, al, bh, bl, mulh, mull, muhh, muhl, qh, ql):
    """(a*b) mod q with 2-word Barrett, mirroring Mod_barrett_128
    (fhe_utils.h:238-283). mu = floor(2^128/q); mul_* = u32 planes of
    mu's low word, muh_* = planes of its high word."""
    v_hi_h, v_hi_l = _mulhi64(ah, al, bh, bl)
    v_lo_h, v_lo_l = _mullo64(ah, al, bh, bl)
    left_h, left_l = _mulhi64(v_lo_h, v_lo_l, mulh, mull)
    mid_h2, mid_l2 = _mulhi64(v_lo_h, v_lo_l, muhh, muhl)
    midlo_h, midlo_l = _mullo64(v_lo_h, v_lo_l, muhh, muhl)
    t1_h, t1_l = _add64(midlo_h, midlo_l, left_h, left_l)
    lt = (t1_h < left_h) | ((t1_h == left_h) & (t1_l < left_l))
    carry = lt.astype(U32)
    t2_h, t2_l = _add64(mid_h2, mid_l2, jnp.zeros_like(carry), carry)
    m2_h2, m2_l2 = _mulhi64(v_hi_h, v_hi_l, mulh, mull)
    m2lo_h, m2lo_l = _mullo64(v_hi_h, v_hi_l, mulh, mull)
    s_h, s_l = _add64(m2lo_h, m2lo_l, t1_h, t1_l)
    lt2 = (s_h < t1_h) | ((s_h == t1_h) & (s_l < t1_l))
    carry2 = lt2.astype(U32)
    l2_h, l2_l = _add64(m2_h2, m2_l2, jnp.zeros_like(carry2), carry2)
    vm_h, vm_l = _mullo64(v_hi_h, v_hi_l, muhh, muhl)
    quot_h, quot_l = _add64(vm_h, vm_l, t2_h, t2_l)
    quot_h, quot_l = _add64(quot_h, quot_l, l2_h, l2_l)
    qq_h, qq_l = _mullo64(quot_h, quot_l, qh, ql)
    r_hi, r_lo = _sub64(v_lo_h, v_lo_l, qq_h, qq_l)
    r_hi, r_lo = _cond_sub_q(r_hi, r_lo, qh, ql)
    r_hi, r_lo = _cond_sub_q(r_hi, r_lo, qh, ql)
    return r_hi, r_lo


# ---------------------------------------------------------------------------
# Gridless DMA-loop elementwise caller
# ---------------------------------------------------------------------------

def _split(x64: jnp.ndarray):
    return (x64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), \
        (x64 >> jnp.uint64(32)).astype(jnp.uint32)


def _join(lo: jnp.ndarray, hi: jnp.ndarray):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _make_ew_kernel(compute, n_in: int, steps: int):
    def kernel(*refs):
        ins = refs[:n_in]
        o_lo, o_hi = refs[n_in], refs[n_in + 1]
        scratch = refs[n_in + 2:]
        in_v = scratch[:n_in]
        ol_v, oh_v = scratch[n_in], scratch[n_in + 1]
        sems = scratch[n_in + 2]

        def body(l, carry):
            i32 = jnp.int32
            copies = [pltpu.make_async_copy(ins[k].at[l], in_v[k],
                                            sems.at[i32(k)])
                      for k in range(n_in)]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            rh, rl = compute(*(v[...] for v in in_v))
            ol_v[...] = rl
            oh_v[...] = rh
            outs = [pltpu.make_async_copy(ol_v, o_lo.at[l],
                                          sems.at[i32(0)]),
                    pltpu.make_async_copy(oh_v, o_hi.at[l],
                                          sems.at[i32(1)])]
            for cp in outs:
                cp.start()
            for cp in outs:
                cp.wait()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(steps), body, jnp.int32(0))

    return kernel


def _elementwise_call(compute, arrays):
    """arrays: u32 planes [L, N] (pre-broadcast). Runs compute on
    row-chunks resident in VMEM; returns (lo, hi) planes [L, N]."""
    n_in = len(arrays)
    L, N = arrays[0].shape
    # scratch + the barrett/shoup chains' live temporaries (~1.5x the
    # operand footprint) must fit the 16MB VMEM scoped limit
    budget = 2 << 20
    chunk = max(1, budget // ((n_in + 2) * N * 4))
    chunk = min(chunk, L)
    steps = -(-L // chunk)
    L2 = steps * chunk
    if L2 != L:
        pad = [(0, L2 - L), (0, 0)]
        arrays = [jnp.pad(a, pad) for a in arrays]
    arrays = [a.reshape(steps, chunk, N) for a in arrays]

    kernel = _make_ew_kernel(compute, n_in, steps)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [pltpu.VMEM((chunk, N), jnp.uint32) for _ in range(n_in + 2)]
    scratch.append(pltpu.SemaphoreType.DMA((max(n_in, 2),)))
    o_lo, o_hi = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((steps, chunk, N), jnp.uint32),
                   jax.ShapeDtypeStruct((steps, chunk, N), jnp.uint32)),
        in_specs=[any_spec] * n_in,
        out_specs=(any_spec, any_spec),
        scratch_shapes=scratch,
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*arrays)
    return (o_lo.reshape(L2, N)[:L], o_hi.reshape(L2, N)[:L])


def shoup_mul(x, w, w_prec, q):
    """Drop-in for modops.shoup_mul on [L, N] u64 arrays via Pallas.
    w/w_prec/q broadcast per limb ([L, 1])."""
    bshape = functools.partial(jnp.broadcast_to, shape=x.shape)
    xl, xh = _split(x)
    wl, wh = _split(bshape(w))
    wpl, wph = _split(bshape(w_prec))
    ql, qh = _split(bshape(q))

    def compute(xl, xh, wl, wh, wpl, wph, ql, qh):
        return _shoup_vals(xh, xl, wh, wl, wph, wpl, qh, ql)

    o_lo, o_hi = _elementwise_call(compute, (xl, xh, wl, wh, wpl, wph,
                                             ql, qh))
    return _join(o_lo, o_hi)


def barrett_mul(a, b, q, mu_hi, mu_lo):
    """Drop-in for modops.barrett_mul on [L, N] u64 arrays via Pallas."""
    bshape = functools.partial(jnp.broadcast_to, shape=a.shape)
    al, ah = _split(a)
    bl, bh = _split(bshape(b))
    mul_l, mul_h = _split(bshape(mu_lo))
    muh_l, muh_h = _split(bshape(mu_hi))
    ql, qh = _split(bshape(q))

    def compute(al, ah, bl, bh, mul_l, mul_h, muh_l, muh_h, ql, qh):
        return _barrett_vals(ah, al, bh, bl, mul_h, mul_l, muh_h, muh_l,
                             qh, ql)

    o_lo, o_hi = _elementwise_call(
        compute, (al, ah, bl, bh, mul_l, mul_h, muh_l, muh_h, ql, qh))
    return _join(o_lo, o_hi)
