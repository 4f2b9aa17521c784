"""Four-step negacyclic NTT as a single Pallas TPU kernel.

The 1-step NTT (ops/ntt.py) walks log2(N) full-array stages: 16 HBM
round-trips per transform at N=2^16, all in XLA-emulated uint64. This
kernel keeps one limb's coefficients resident in VMEM for the entire
transform and does the modular arithmetic natively in u32 planes.

Math (bit-exact, position-identical to ops/ntt.py ntt_fwd/ntt_inv):
with N = R*C, x viewed [R, C] row-major (i = a*C + b), psi the 2N-th
root used by the 1-step path, w = psi^2, psi_R = psi^C, psi_C = psi^R:

  fwd:  y = x * psi^b                          (P1, per-column diagonal)
        y = NegaCT_R(y)   per column           (rows a -> brev_R(u))
        y = y * psi^{(2u-R) b}                 (T2 twiddle, geometric rows)
        y = transpose(y)
        y = NegaCT_C(y)   per column           (rows b -> brev_C(v))
        out = transpose(y)                     flatten = brev_R(u)*C+brev_C(v)

NegaCT_R is the standard Harvey/OpenFHE negacyclic Cooley-Tukey ladder
(identical butterflies to ntt.c:190-264) over the 2R-th root psi_R; the
identity plainDFT_bitrev(x) = NegaCT(x * psi_R^{-a}) lets the 4-step
per-column DFTs reuse it, and the psi_R^{-a} premultiplications telescope
against the global negacyclic psi^i premul into the tables above. Output
position j = brev_N(k) holds eval at psi^{2*brev_N(j)+1} — exactly the
1-step path's "NTT form", so every consumer (automorphism orders,
pointwise ops, base-conversion splices) is unchanged.

Inverse mirrors it with the inverted diagonals and Gentleman-Sande
ladders (N^-1 = R^-1 * C^-1 folded into the two GS first stages, as in
ntt.c:281-317).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ace_tpu.ops.pallas_modops import (_mullo64, _mulhi64, _sub64, _add64,
                                       _cond_sub_q, _split, _join)
from ace_tpu.utils import number_theory as nt

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host-side table construction
# ---------------------------------------------------------------------------

class Ntt4Tables(NamedTuple):
    """Per-limb tables as u32 planes. Big arrays [L, R, C] (t2/d2i) or
    [L, 1, C] (p1/d1i): value lo/hi + Shoup-precompute lo/hi. Ladder
    tables [L, R|C, 1]. Scalars [L, 12]: q, ninvR(+prec), ninvC(+prec)
    as u32-plane pairs."""
    p1: tuple          # 4 x [L, 1, C]
    t2: tuple          # 4 x [L, R, C]
    d2i: tuple         # 4 x [L, R, C]
    d1i: tuple         # 4 x [L, 1, C]
    rr: tuple          # 4 x [L, R, 128]  fwd ladder planes (lane=stage)
    rri: tuple         # 4 x [L, R, 128]  inverse ladder
    rc: tuple          # 4 x [L, C, 128]
    rci: tuple         # 4 x [L, C, 128]
    scal: jnp.ndarray  # [L, 12] uint32

    @property
    def shape_rc(self):
        return self.t2[0].shape[1], self.t2[0].shape[2]


def _brev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _pow_table(base: int, q: int, n: int) -> np.ndarray:
    try:
        from ace_tpu import native
        return native.pow_table(base % q, q, n)
    except Exception:
        out = np.empty(n, dtype=np.uint64)
        acc = 1
        for i in range(n):
            out[i] = acc
            acc = acc * base % q
        return out


def _prec_table(w: np.ndarray, q: int) -> np.ndarray:
    try:
        from ace_tpu import native
        return native.shoup_prec(w, q)
    except Exception:
        return np.array([(int(v) << 64) // q for v in w.reshape(-1)],
                        dtype=np.uint64).reshape(w.shape)


def _ladder_tables(psi_r: int, q: int, r: int):
    """Per-stage expanded butterfly twiddles.

    Stage s (m = 2^s blocks, half = r/(2m)): the y-operand rows, read in
    order, need twiddle rou[m + b] repeated `half` times. Expanding on
    the host to [log2(r), r/2] lets the kernel broadcast along lanes
    only (Mosaic cannot broadcast a 1x1x1 vector across sublanes+lanes).
    rou[brev(i)] = psi_r^i exactly like make_ntt_tables.
    """
    rev = _brev_perm(r)
    pw = _pow_table(psi_r, q, r)
    pwi = _pow_table(nt.mod_inv(psi_r, q), q, r)
    rou = np.empty(r, dtype=np.uint64)
    roui = np.empty(r, dtype=np.uint64)
    rou[rev] = pw
    roui[rev] = pwi
    logr = r.bit_length() - 1
    # full-height expansion: v_s[row] = rou[m + block(row)] for ALL rows
    # (the roll/select butterfly multiplies every row by its block's
    # twiddle and masks afterwards)
    fwd = np.empty((logr, r), dtype=np.uint64)
    inv = np.empty((logr, r), dtype=np.uint64)
    for s in range(logr):
        m = 1 << s
        span = r // m
        fwd[s] = np.repeat(rou[m:2 * m], span)
        inv[s] = np.repeat(roui[m:2 * m], span)
    return fwd, _prec_table(fwd, q), inv, _prec_table(inv, q)


def _split_np(x: np.ndarray):
    return ((x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (x >> np.uint64(32)).astype(np.uint32))


def make_ntt4_tables(primes: list[int], degree: int) -> Ntt4Tables:
    n = degree
    logn = n.bit_length() - 1
    r = 1 << ((logn + 1) // 2)
    c = n // r
    rev_r = _brev_perm(r)

    p1_v, p1_p = [], []
    t2_v, t2_p = [], []
    d2i_v, d2i_p = [], []
    d1i_v, d1i_p = [], []
    rr_all, rri_all, rc_all, rci_all = [], [], [], []
    scal_all = []
    m = 2 * n
    for q in primes:
        psi = nt.root_of_unity(m, q)
        psi_inv = nt.mod_inv(psi, q)
        # P1[b] = psi^b ; D1i[b] = psi^-b
        p1 = _pow_table(psi, q, c)
        d1i = _pow_table(psi_inv, q, c)
        # T2 row brev(u) = powers of psi^(2u - R mod 2N);
        # D2i row brev(u) = powers of the inverse ratio
        t2 = np.empty((r, c), dtype=np.uint64)
        d2i = np.empty((r, c), dtype=np.uint64)
        for u in range(r):
            ratio = pow(psi, (2 * u - r) % m, q)
            t2[rev_r[u]] = _pow_table(ratio, q, c)
            d2i[rev_r[u]] = _pow_table(nt.mod_inv(ratio, q), q, c)
        # per-column ladders over psi_R = psi^C (order 2R), psi_C = psi^R
        rr = _ladder_tables(pow(psi, c, q), q, r)
        rc = _ladder_tables(pow(psi, r, q), q, c)

        def planes(v64: np.ndarray, shape):
            lo, hi = _split_np(v64.reshape(shape))
            plo, phi = _split_np(_prec_table(v64, q).reshape(shape))
            return lo, hi, plo, phi

        p1_planes = planes(p1, (1, c))
        d1i_planes = planes(d1i, (1, c))
        t2_lo, t2_hi = _split_np(t2)
        t2_plo, t2_phi = _split_np(_prec_table(t2, q))
        d2i_lo, d2i_hi = _split_np(d2i)
        d2i_plo, d2i_phi = _split_np(_prec_table(d2i, q))
        p1_v.append(p1_planes)
        d1i_v.append(d1i_planes)
        t2_v.append((t2_lo, t2_hi, t2_plo, t2_phi))
        d2i_v.append((d2i_lo, d2i_hi, d2i_plo, d2i_phi))

        def ladder_planes(tabs):
            # stored [X, 128]: sublane = row, lane s = stage (lane dim
            # padded to 128 so per-limb DMA slices are lane-aligned;
            # stage index is a static lane slice)
            out = []
            for t in tabs:
                logx, x_rows = t.shape
                padded = np.zeros((x_rows, 128), dtype=np.uint64)
                padded[:, :logx] = t.T
                lo, hi = _split_np(padded)
                out.extend([lo, hi])
            # order: w_lo, w_hi, wp_lo, wp_hi, wi_lo, wi_hi, wip_lo, wip_hi
            return out

        rr_all.append(ladder_planes(rr))
        rc_all.append(ladder_planes(rc))

        ninv_r = nt.mod_inv(r, q)
        ninv_c = nt.mod_inv(c, q)
        ninv_rp = (ninv_r << 64) // q
        ninv_cp = (ninv_c << 64) // q

        def w32(v, k):
            return (v >> (32 * k)) & 0xFFFFFFFF

        scal_all.append([w32(q, 0), w32(q, 1),
                         w32(ninv_r, 0), w32(ninv_r, 1),
                         w32(ninv_rp, 0), w32(ninv_rp, 1),
                         w32(ninv_c, 0), w32(ninv_c, 1),
                         w32(ninv_cp, 0), w32(ninv_cp, 1), 0, 0])

    def stack(groups, k):
        return tuple(jnp.asarray(np.stack([g[i] for g in groups]))
                     for i in range(k))

    return Ntt4Tables(
        p1=stack(p1_v, 4), t2=stack(t2_v, 4), d2i=stack(d2i_v, 4),
        d1i=stack(d1i_v, 4),
        rr=stack([g[:4] for g in rr_all], 4),
        rri=stack([g[4:] for g in rr_all], 4),
        rc=stack([g[:4] for g in rc_all], 4),
        rci=stack([g[4:] for g in rc_all], 4),
        scal=jnp.asarray(np.asarray(scal_all, dtype=np.uint32)),
    )


def index_tables(t: Ntt4Tables, idx) -> Ntt4Tables:
    """Tables for a subset of limbs (list of row indices or a slice)."""
    idx = np.asarray(idx)

    def g(x):
        return x[idx]

    return Ntt4Tables(
        p1=tuple(g(a) for a in t.p1), t2=tuple(g(a) for a in t.t2),
        d2i=tuple(g(a) for a in t.d2i), d1i=tuple(g(a) for a in t.d1i),
        rr=tuple(g(a) for a in t.rr), rri=tuple(g(a) for a in t.rri),
        rc=tuple(g(a) for a in t.rc), rci=tuple(g(a) for a in t.rci),
        scal=g(t.scal))


# ---------------------------------------------------------------------------
# In-kernel modular helpers on u32 planes
# ---------------------------------------------------------------------------

def _shoup(x_hi, x_lo, w_hi, w_lo, wp_hi, wp_lo, q_hi, q_lo):
    """x*w mod q, Shoup form; all args u32 planes (broadcastable)."""
    qh, ql = _mulhi64(x_hi, x_lo, wp_hi, wp_lo)
    xw_h, xw_l = _mullo64(x_hi, x_lo, w_hi, w_lo)
    qq_h, qq_l = _mullo64(qh, ql, q_hi, q_lo)
    r_hi, r_lo = _sub64(xw_h, xw_l, qq_h, qq_l)
    return _cond_sub_q(r_hi, r_lo, q_hi, q_lo)


def _addm(a_hi, a_lo, b_hi, b_lo, q_hi, q_lo):
    s_hi, s_lo = _add64(a_hi, a_lo, b_hi, b_lo)
    return _cond_sub_q(s_hi, s_lo, q_hi, q_lo)


def _subm(a_hi, a_lo, b_hi, b_lo, q_hi, q_lo):
    ge = (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo >= b_lo))
    d_hi, d_lo = _sub64(a_hi, a_lo, b_hi, b_lo)
    aq_hi, aq_lo = _add64(a_hi, a_lo, q_hi, q_lo)
    d2_hi, d2_lo = _sub64(aq_hi, aq_lo, b_hi, b_lo)
    return jnp.where(ge, d_hi, d2_hi), jnp.where(ge, d_lo, d2_lo)


def _is_y_mask(R: int, half: int):
    """[R, 1] bool: rows whose butterfly role is y (bit `half` set)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    return (rows & half) != 0


def _roll_pair(d_hi, d_lo, half: int, is_y):
    """Partner values: x-rows read +half, y-rows read -half (the
    butterfly exchange r <-> r^half via two sublane rolls + select)."""
    R = d_hi.shape[0]
    up = np.int32(R - half)  # i32: tpu.dynamic_rotate rejects i64 shifts
    dn = np.int32(half)
    up_hi = pltpu.roll(d_hi, up, 0)  # [r] <- d[r+half]
    up_lo = pltpu.roll(d_lo, up, 0)
    dn_hi = pltpu.roll(d_hi, dn, 0)  # [r] <- d[r-half]
    dn_lo = pltpu.roll(d_lo, dn, 0)
    return (jnp.where(is_y, dn_hi, up_hi), jnp.where(is_y, dn_lo, up_lo))


def _negact_cols(x_hi, x_lo, w_hi, w_lo, wp_hi, wp_lo, q_hi, q_lo):
    """Negacyclic CT ladder down the sublane axis of [R, C] planes.

    Uniform-shape formulation: every stage works on the full [R, C]
    view with roll/select butterflies (no reshapes — keeps the Mosaic
    program small and vector ops full-width). Same math as the
    reference's Harvey butterflies (ntt.c:190-264): for block twiddle w,
    out_x = x + w*y, out_y = x - w*y. Ladder tables hold the block
    twiddle per ROW at lane s = stage."""
    R, C = x_lo.shape
    m = 1
    s = 0
    d_hi, d_lo = x_hi, x_lo
    while m < R:
        half = R // (2 * m)
        is_y = _is_y_mask(R, half)
        om_hi = w_hi[:, s:s + 1]
        om_lo = w_lo[:, s:s + 1]
        omp_hi = wp_hi[:, s:s + 1]
        omp_lo = wp_lo[:, s:s + 1]
        p_hi, p_lo = _roll_pair(d_hi, d_lo, half, is_y)
        # y-value at every row: own value on y rows, partner on x rows
        yv_hi = jnp.where(is_y, d_hi, p_hi)
        yv_lo = jnp.where(is_y, d_lo, p_lo)
        xv_hi = jnp.where(is_y, p_hi, d_hi)
        xv_lo = jnp.where(is_y, p_lo, d_lo)
        wy_hi, wy_lo = _shoup(yv_hi, yv_lo, om_hi, om_lo, omp_hi, omp_lo,
                              q_hi, q_lo)
        a_hi, a_lo = _addm(xv_hi, xv_lo, wy_hi, wy_lo, q_hi, q_lo)
        b_hi, b_lo = _subm(xv_hi, xv_lo, wy_hi, wy_lo, q_hi, q_lo)
        d_hi = jnp.where(is_y, b_hi, a_hi)
        d_lo = jnp.where(is_y, b_lo, a_lo)
        m *= 2
        s += 1
    return d_hi, d_lo


def _negags_cols(x_hi, x_lo, w_hi, w_lo, wp_hi, wp_lo, q_hi, q_lo,
                 ninv_hi, ninv_lo, ninvp_hi, ninvp_lo):
    """Inverse (Gentleman-Sande) ladder, roll/select form; R^-1 folded
    into the first (pairwise) stage (ntt.c:281-317):
    out_x = x + y, out_y = (x - y) * w."""
    R, C = x_lo.shape
    m = R // 2
    d_hi, d_lo = x_hi, x_lo
    first = True
    while m >= 1:
        s = m.bit_length() - 1
        half = R // (2 * m)
        is_y = _is_y_mask(R, half)
        om_hi = w_hi[:, s:s + 1]
        om_lo = w_lo[:, s:s + 1]
        omp_hi = wp_hi[:, s:s + 1]
        omp_lo = wp_lo[:, s:s + 1]
        p_hi, p_lo = _roll_pair(d_hi, d_lo, half, is_y)
        xv_hi = jnp.where(is_y, p_hi, d_hi)
        xv_lo = jnp.where(is_y, p_lo, d_lo)
        yv_hi = jnp.where(is_y, d_hi, p_hi)
        yv_lo = jnp.where(is_y, d_lo, p_lo)
        a_hi, a_lo = _addm(xv_hi, xv_lo, yv_hi, yv_lo, q_hi, q_lo)
        b_hi, b_lo = _subm(xv_hi, xv_lo, yv_hi, yv_lo, q_hi, q_lo)
        b_hi, b_lo = _shoup(b_hi, b_lo, om_hi, om_lo, omp_hi, omp_lo,
                            q_hi, q_lo)
        if first:
            a_hi, a_lo = _shoup(a_hi, a_lo, ninv_hi, ninv_lo,
                                ninvp_hi, ninvp_lo, q_hi, q_lo)
            b_hi, b_lo = _shoup(b_hi, b_lo, ninv_hi, ninv_lo,
                                ninvp_hi, ninvp_lo, q_hi, q_lo)
            first = False
        d_hi = jnp.where(is_y, b_hi, a_hi)
        d_lo = jnp.where(is_y, b_lo, a_lo)
        m //= 2
    return d_hi, d_lo


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

# NOTE on kernel structure: Pallas grids could express the per-limb
# loop, but the axon remote-compile path cannot legalize grid index-map
# functions ("failed to legalize func.return"); kernels are therefore
# GRIDLESS — inputs stay in HBM/ANY, and an in-kernel fori_loop DMAs one
# limb's planes+tables into VMEM scratch, computes, and DMAs the result
# out (the guide's pipeline pattern, serialized: the transform is
# compute-bound at ~20 u32 ops/element vs 1 byte/element of DMA).


def _fwd_compute(xh, xl, tabs, q_hi, q_lo, scal_row):
    (p1_lo, p1_hi, p1p_lo, p1p_hi,
     t2_lo, t2_hi, t2p_lo, t2p_hi,
     rr_lo, rr_hi, rrp_lo, rrp_hi,
     rc_lo, rc_hi, rcp_lo, rcp_hi) = tabs
    rr = (rr_hi, rr_lo, rrp_hi, rrp_lo)
    rc = (rc_hi, rc_lo, rcp_hi, rcp_lo)
    # P1 diagonal (psi^b per column)
    xh, xl = _shoup(xh, xl, p1_hi, p1_lo, p1p_hi, p1p_lo, q_hi, q_lo)
    xh, xl = _negact_cols(xh, xl, *rr, q_hi, q_lo)
    xh, xl = _shoup(xh, xl, t2_hi, t2_lo, t2p_hi, t2p_lo, q_hi, q_lo)
    xh, xl = xh.T, xl.T
    xh, xl = _negact_cols(xh, xl, *rc, q_hi, q_lo)
    return xh.T, xl.T


def _inv_compute(xh, xl, tabs, q_hi, q_lo, scal_row):
    (d2i_lo, d2i_hi, d2ip_lo, d2ip_hi,
     d1i_lo, d1i_hi, d1ip_lo, d1ip_hi,
     rri_lo, rri_hi, rrip_lo, rrip_hi,
     rci_lo, rci_hi, rcip_lo, rcip_hi) = tabs
    rri = (rri_hi, rri_lo, rrip_hi, rrip_lo)
    rci = (rci_hi, rci_lo, rcip_hi, rcip_lo)
    ninvr = (scal_row[3], scal_row[2], scal_row[5], scal_row[4])
    ninvc = (scal_row[7], scal_row[6], scal_row[9], scal_row[8])
    xh, xl = xh.T, xl.T
    xh, xl = _negags_cols(xh, xl, *rci, q_hi, q_lo, *ninvc)
    xh, xl = xh.T, xl.T
    xh, xl = _shoup(xh, xl, d2i_hi, d2i_lo, d2ip_hi, d2ip_lo, q_hi, q_lo)
    xh, xl = _negags_cols(xh, xl, *rri, q_hi, q_lo, *ninvr)
    xh, xl = _shoup(xh, xl, d1i_hi, d1i_lo, d1ip_hi, d1ip_lo, q_hi, q_lo)
    return xh, xl


def _make_kernel(compute, n_tabs: int, L: int):
    """Gridless kernel: fori_loop over limbs, DMA per limb."""

    def kernel(*refs):
        scal = refs[0]
        x_lo, x_hi = refs[1], refs[2]
        tab_refs = refs[3:3 + n_tabs]
        o_lo, o_hi = refs[3 + n_tabs], refs[4 + n_tabs]
        scratch = refs[5 + n_tabs:]
        xl_v, xh_v, ol_v, oh_v = scratch[:4]
        tab_v = scratch[4:4 + n_tabs]
        sems = scratch[4 + n_tabs]

        def body(l, carry):
            i32 = jnp.int32
            copies = [
                pltpu.make_async_copy(x_lo.at[l], xl_v, sems.at[i32(0)]),
                pltpu.make_async_copy(x_hi.at[l], xh_v, sems.at[i32(1)])]
            for k in range(n_tabs):
                copies.append(pltpu.make_async_copy(
                    tab_refs[k].at[l], tab_v[k], sems.at[i32(2 + k)]))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            q_lo = scal[l, 0]
            q_hi = scal[l, 1]
            # SMEM only supports scalar loads — pass the row element-wise
            scal_row = tuple(scal[l, k] for k in range(10))
            rh, rl = compute(xh_v[...], xl_v[...],
                             tuple(tv[...] for tv in tab_v),
                             q_hi, q_lo, scal_row)
            ol_v[...] = rl
            oh_v[...] = rh
            outs = [
                pltpu.make_async_copy(ol_v, o_lo.at[l], sems.at[i32(0)]),
                pltpu.make_async_copy(oh_v, o_hi.at[l], sems.at[i32(1)])]
            for cp in outs:
                cp.start()
            for cp in outs:
                cp.wait()
            return carry

        # i32 bounds keep the induction variable i32 (tpu.memref_slice
        # rejects i64 indices under jax x64 mode)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(L), body,
                          jnp.int32(0))

    return kernel


def _call(kernel_compute, t: Ntt4Tables, big4, small_r4, small_c4,
          x: jnp.ndarray):
    import sys
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)  # the unrolled ladder jaxpr is deep
    L, n = x.shape
    R, C = t.shape_rc
    xl, xh = _split(x)
    xl = xl.reshape(L, R, C)
    xh = xh.reshape(L, R, C)

    tabs = list(big4[0]) + list(big4[1]) + list(small_r4) + list(small_c4)
    n_tabs = len(tabs)
    kernel = _make_kernel(kernel_compute, n_tabs, L)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((R, C), jnp.uint32),   # xl_v
        pltpu.VMEM((R, C), jnp.uint32),   # xh_v
        pltpu.VMEM((R, C), jnp.uint32),   # ol_v
        pltpu.VMEM((R, C), jnp.uint32),   # oh_v
    ]
    for arr in tabs:
        scratch.append(pltpu.VMEM(arr.shape[1:], jnp.uint32))
    scratch.append(pltpu.SemaphoreType.DMA((2 + n_tabs,)))

    o_lo, o_hi = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((L, R, C), jnp.uint32),
                   jax.ShapeDtypeStruct((L, R, C), jnp.uint32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [any_spec] * (2 + n_tabs),
        out_specs=(any_spec, any_spec),
        scratch_shapes=scratch,
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=40 * L * n * (n.bit_length() - 1), transcendentals=0,
            bytes_accessed=L * n * 8 * 4),
    )(t.scal, xl, xh, *tabs)
    return _join(o_lo, o_hi).reshape(L, n)


def ntt4_fwd(x: jnp.ndarray, t: Ntt4Tables) -> jnp.ndarray:
    """Forward negacyclic NTT, [L, N] u64 natural order -> NTT form."""
    return _call(_fwd_compute, t, (t.p1, t.t2), t.rr, t.rc, x)


def ntt4_inv(x: jnp.ndarray, t: Ntt4Tables) -> jnp.ndarray:
    """Inverse negacyclic NTT, [L, N] NTT form -> natural order."""
    return _call(_inv_compute, t, (t.d2i, t.d1i), t.rri, t.rci, x)
