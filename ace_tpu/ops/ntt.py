"""Negacyclic NTT/iNTT over stacked RNS limbs.

Transform layout matches the reference (OpenFHE-style, harvested from
fhe-cmplr/rtlib/ant/src/util/ntt.c):
  - twiddle table rou[bitrev(i)] = psi^i where psi is a primitive 2N-th
    root of unity (ntt.c:80-127, Precompute_ntt)
  - forward: Cooley-Tukey butterflies, natural-order input ->
    bit-reversed "NTT form" output (ntt.c:190-264, Forward_transform)
  - inverse: Gentleman-Sande, bit-reversed input -> natural output, with
    N^-1 folded into the first (pairwise) stage (ntt.c:268-353,
    Inverse_transform)

All butterflies use Shoup multiplication with precomputed twiddles; data
is [num_limbs, N] uint64, tables are stacked per limb. Stage loops are
static Python loops (log2 N stages), fully fused by XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ace_tpu.ops import modops
from ace_tpu.utils import number_theory as nt


class NttTables(NamedTuple):
    """Per-limb NTT twiddle tables for a fixed set of primes (device arrays).

    Shapes: rou/rou_prec/rou_inv/rou_inv_prec [L, N]; q/n_inv/n_inv_prec
    [L, 1]; barrett mu words [L, 1]. `four_step` optionally carries the
    Pallas 4-step kernel tables (ops/ntt4.py) used on TPU for large N.
    """
    q: jnp.ndarray
    rou: jnp.ndarray
    rou_prec: jnp.ndarray
    rou_inv: jnp.ndarray
    rou_inv_prec: jnp.ndarray
    n_inv: jnp.ndarray
    n_inv_prec: jnp.ndarray
    mu_hi: jnp.ndarray
    mu_lo: jnp.ndarray
    four_step: object = None

    @property
    def degree(self) -> int:
        return self.rou.shape[-1]


# minimum degree for the Pallas 4-step path: C = N/R must be >= 128 so
# per-limb DMA slices are lane-aligned (Mosaic tiling (., 128)); smaller
# rings fit one XLA fusion anyway. Override with ACE_TPU_NTT4=off|on.
NTT4_MIN_DEGREE = 16384


def _ntt4_mode() -> str:
    import os
    return os.environ.get("ACE_TPU_NTT4", "auto")


def _use_ntt4(t: "NttTables") -> bool:
    if t.four_step is None:
        return False
    mode = _ntt4_mode()
    if mode == "off":
        return False
    if mode == "on":
        return True
    import jax
    return jax.default_backend() != "cpu"


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def make_ntt_tables(primes: list[int], degree: int,
                    four_step: bool | None = None) -> NttTables:
    """Host precompute of all twiddle tables for the given prime chain.

    four_step: build the Pallas 4-step tables too (default: when the
    ring is large enough and the mode isn't forced off)."""
    n = degree
    rev = _bit_reverse_indices(n)
    rou_all, rou_prec_all = [], []
    roui_all, roui_prec_all = [], []
    n_inv_all, n_inv_prec_all = [], []
    mu_hi_all, mu_lo_all = [], []
    try:
        from ace_tpu import native as _native
    except Exception:
        _native = None
    for q in primes:
        psi = nt.root_of_unity(2 * n, q)
        psi_inv = nt.mod_inv(psi, q)
        # powers psi^i stored at bit-reversed positions
        if _native is not None:
            pw_tab = _native.pow_table(psi, q, n)
            pwi_tab = _native.pow_table(psi_inv, q, n)
            rou = np.empty(n, dtype=np.uint64)
            roui = np.empty(n, dtype=np.uint64)
            rou[rev] = pw_tab
            roui[rev] = pwi_tab
            rou_prec_all.append(_native.shoup_prec(rou, q))
            roui_prec_all.append(_native.shoup_prec(roui, q))
        else:
            pw, pwi = 1, 1
            rou = [0] * n
            roui = [0] * n
            for i in range(n):
                rou[rev[i]] = pw
                roui[rev[i]] = pwi
                pw = (pw * psi) % q
                pwi = (pwi * psi_inv) % q
            rou_prec_all.append(
                [modops.precompute_shoup(w, q) for w in rou])
            roui_prec_all.append(
                [modops.precompute_shoup(w, q) for w in roui])
        rou_all.append(rou)
        roui_all.append(roui)
        ninv = nt.mod_inv(n, q)
        n_inv_all.append([ninv])
        n_inv_prec_all.append([modops.precompute_shoup(ninv, q)])
        hi, lo = modops.precompute_barrett128(q)
        mu_hi_all.append([hi])
        mu_lo_all.append([lo])
    u64 = modops.np_u64
    if four_step is None:
        four_step = n >= NTT4_MIN_DEGREE and _ntt4_mode() != "off"
    ntt4_tables = None
    if four_step:
        from ace_tpu.ops import ntt4
        ntt4_tables = ntt4.make_ntt4_tables(primes, n)
    def rows(vals):
        return jnp.asarray(np.stack([
            v if isinstance(v, np.ndarray) else u64(v) for v in vals]))

    return NttTables(
        q=jnp.asarray(u64([[q] for q in primes])),
        rou=rows(rou_all),
        rou_prec=rows(rou_prec_all),
        rou_inv=rows(roui_all),
        rou_inv_prec=rows(roui_prec_all),
        n_inv=jnp.asarray(u64(n_inv_all)),
        n_inv_prec=jnp.asarray(u64(n_inv_prec_all)),
        mu_hi=jnp.asarray(u64(mu_hi_all)),
        mu_lo=jnp.asarray(u64(mu_lo_all)),
        four_step=ntt4_tables,
    )


# jitted entry points: one XLA program per (shape, table-structure) —
# eager per-stage dispatch dominates keygen/startup otherwise
ntt_fwd_jit = None
ntt_inv_jit = None


def _jitted():
    global ntt_fwd_jit, ntt_inv_jit
    if ntt_fwd_jit is None:
        import jax
        ntt_fwd_jit = jax.jit(ntt_fwd)
        ntt_inv_jit = jax.jit(ntt_inv)
    return ntt_fwd_jit, ntt_inv_jit


def fwd(coeffs, t: "NttTables"):
    """Jitted forward NTT (use in op pipelines)."""
    return _jitted()[0](coeffs, t)


def inv(values, t: "NttTables"):
    """Jitted inverse NTT (use in op pipelines)."""
    return _jitted()[1](values, t)


def slice_tables(tables: NttTables, start: int, count: int) -> NttTables:
    """Tables for limbs [start, start+count) of the full chain."""
    return gather_tables(tables, range(start, start + count))


def gather_tables(tables: NttTables, idx) -> NttTables:
    """Tables for an arbitrary static list of limb indices."""
    idx = np.asarray(idx)
    fs = tables.four_step
    if fs is not None:
        from ace_tpu.ops import ntt4
        fs = ntt4.index_tables(fs, idx)
    return NttTables(*(t[idx] for t in tables[:-1]), four_step=fs)


def ntt_fwd(coeffs: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Forward negacyclic NTT. coeffs [L, N] natural order -> NTT form."""
    if _use_ntt4(t):
        from ace_tpu.ops import ntt4
        return ntt4.ntt4_fwd(coeffs, t.four_step)
    L, n = coeffs.shape
    q = t.q[:, :, None]  # [L,1,1] for [L,m,t] stage views
    d = coeffs
    m = 1
    while m < n:
        half = n // (2 * m)
        d = d.reshape(L, m, 2, half)
        omega = t.rou[:, m:2 * m, None]
        omega_prec = t.rou_prec[:, m:2 * m, None]
        x = d[:, :, 0, :]
        y = modops.shoup_mul(d[:, :, 1, :], omega, omega_prec, q)
        d = jnp.stack(
            [modops.add_mod(x, y, q), modops.sub_mod(x, y, q)], axis=2)
        m *= 2
    return d.reshape(L, n)


def ntt_inv(values: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Inverse negacyclic NTT. values [L, N] NTT form -> natural order."""
    if _use_ntt4(t):
        from ace_tpu.ops import ntt4
        return ntt4.ntt4_inv(values, t.four_step)
    L, n = values.shape
    q = t.q[:, :, None]
    d = values
    m = n // 2
    first = True
    while m >= 1:
        half = n // (2 * m)
        d = d.reshape(L, m, 2, half)
        omega = t.rou_inv[:, m:2 * m, None]
        omega_prec = t.rou_inv_prec[:, m:2 * m, None]
        lo = d[:, :, 0, :]
        hi = d[:, :, 1, :]
        s = modops.add_mod(lo, hi, q)
        df = modops.shoup_mul(modops.sub_mod(lo, hi, q), omega, omega_prec, q)
        if first:
            # N^-1 folded into the pairwise stage (ntt.c:281-317)
            ninv = t.n_inv[:, :, None]
            ninv_prec = t.n_inv_prec[:, :, None]
            s = modops.shoup_mul(s, ninv, ninv_prec, q)
            df = modops.shoup_mul(df, ninv, ninv_prec, q)
            first = False
        d = jnp.stack([s, df], axis=2)
        m //= 2
    return d.reshape(L, n)
