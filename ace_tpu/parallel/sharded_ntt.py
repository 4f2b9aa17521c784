"""Slot-sharded negacyclic NTT over a device mesh.

The multi-chip half of the 4-step design (SURVEY.md §5.8): view the
ring as [R, C] with the C (column) axis sharded across the mesh's
'slot' axis. Each of the two column transforms is shard-local (full R
or C rows live on every shard); the inter-stage transposes become
all_to_all exchanges over ICI. Same math and output ordering as
ops/ntt4.py (and therefore ops/ntt.py):

  fwd:  x*psi^b -> NegaCT_R (local) -> *T2 (local) -> all_to_all
        transpose -> NegaCT_C (local) -> all_to_all transpose back

Exact u64 arithmetic (jnp path — on hardware each shard-local ladder
can lower to the Pallas kernel; the collective structure is identical).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ace_tpu.ops import modops
from ace_tpu.utils import number_theory as nt


class ShardedNttTables(NamedTuple):
    """u64 tables, one row set per limb. p1/t2 are sharded with the
    data; ladder tables are replicated (small)."""
    q: jnp.ndarray            # [L, 1, 1]
    p1: jnp.ndarray           # [L, 1, C]  psi^b
    p1_prec: jnp.ndarray
    t2: jnp.ndarray           # [L, R, C]
    t2_prec: jnp.ndarray
    rr: jnp.ndarray           # [L, logR, R]  per-stage row twiddles
    rr_prec: jnp.ndarray
    rc: jnp.ndarray           # [L, logC, C]
    rc_prec: jnp.ndarray
    d2i: jnp.ndarray          # [L, R, C]  t2^-1
    d2i_prec: jnp.ndarray
    fin: jnp.ndarray          # [L, 1, C]  p1^-1 * n^-1 (final scale)
    fin_prec: jnp.ndarray
    rri: jnp.ndarray          # [L, logR, R]  inverse ladder twiddles
    rri_prec: jnp.ndarray
    rci: jnp.ndarray          # [L, logC, C]
    rci_prec: jnp.ndarray

    @property
    def shape_rc(self):
        return self.t2.shape[1], self.t2.shape[2]


def _pow_table(base, q, n):
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


def _prec(w, q):
    try:
        from ace_tpu import native
        return native.shoup_prec(np.ascontiguousarray(w, np.uint64), q)
    except Exception:
        return np.array([(int(v) << 64) // q for v in np.ravel(w)],
                        dtype=np.uint64).reshape(np.shape(w))


def _brev(n):
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _ladder(psi_r, q, r):
    rev = _brev(r)
    rou = np.empty(r, dtype=np.uint64)
    rou[rev] = _pow_table(psi_r, q, r)
    logr = r.bit_length() - 1
    out = np.empty((logr, r), dtype=np.uint64)
    for s in range(logr):
        m = 1 << s
        out[s] = np.repeat(rou[m:2 * m], r // m)
    return out


def make_sharded_ntt_tables(primes, degree: int) -> ShardedNttTables:
    n = degree
    logn = n.bit_length() - 1
    r = 1 << ((logn + 1) // 2)
    c = n // r
    rev_r = _brev(r)
    m = 2 * n
    p1s, t2s, rrs, rcs = [], [], [], []
    d2is, fins, rris, rcis = [], [], [], []

    def _inv_tab(tab, q):
        flat = [nt.mod_inv(int(v), q) for v in np.ravel(tab)]
        return np.asarray(flat, dtype=np.uint64).reshape(np.shape(tab))

    for q in primes:
        psi = nt.root_of_unity(m, q)
        p1 = _pow_table(psi, q, c)[None, :]
        p1s.append(p1)
        t2 = np.empty((r, c), dtype=np.uint64)
        for u in range(r):
            t2[rev_r[u]] = _pow_table(pow(psi, (2 * u - r) % m, q), q, c)
        t2s.append(t2)
        rr = _ladder(pow(psi, c, q), q, r)
        rc = _ladder(pow(psi, r, q), q, c)
        rrs.append(rr)
        rcs.append(rc)
        # inverse network: elementwise twiddle inverses; the per-stage
        # 1/2 factors accumulate to n^-1, folded into the final scale
        d2is.append(_inv_tab(t2, q))
        ninv = nt.mod_inv(n, q)
        fins.append((_inv_tab(p1, q).astype(object) * ninv % q)
                    .astype(np.uint64))
        rris.append(_inv_tab(rr, q))
        rcis.append(_inv_tab(rc, q))
    u64 = modops.np_u64
    stack = lambda xs: jnp.asarray(np.stack(xs))

    def pack(xs):
        return (stack(xs),
                stack([_prec(x, q) for x, q in zip(xs, primes)]))

    p1_, p1p = pack(p1s)
    t2_, t2p = pack(t2s)
    rr_, rrp = pack(rrs)
    rc_, rcp = pack(rcs)
    d2i_, d2ip = pack(d2is)
    fin_, finp = pack(fins)
    rri_, rrip = pack(rris)
    rci_, rcip = pack(rcis)
    return ShardedNttTables(
        q=jnp.asarray(u64([[[q]] for q in primes])),
        p1=p1_, p1_prec=p1p, t2=t2_, t2_prec=t2p,
        rr=rr_, rr_prec=rrp, rc=rc_, rc_prec=rcp,
        d2i=d2i_, d2i_prec=d2ip, fin=fin_, fin_prec=finp,
        rri=rri_, rri_prec=rrip, rci=rci_, rci_prec=rcip,
    )


def _negact_local(x, w, w_prec, q):
    """CT ladder over axis -2 of [L, R, Cl] (roll/select form)."""
    L, R, Cl = x.shape
    rows = jnp.arange(R)[None, :, None]
    d = x
    for s in range(R.bit_length() - 1):
        m = 1 << s
        half = R // (2 * m)
        is_y = (rows & half) != 0
        up = jnp.roll(d, -half, axis=1)
        dn = jnp.roll(d, half, axis=1)
        partner = jnp.where(is_y, dn, up)
        xv = jnp.where(is_y, partner, d)
        yv = jnp.where(is_y, d, partner)
        om = w[:, s, :, None]
        omp = w_prec[:, s, :, None]
        wy = modops.shoup_mul(yv, om, omp, q)
        d = jnp.where(is_y, modops.sub_mod(xv, wy, q),
                      modops.add_mod(xv, wy, q))
    return d


def _negact_inv_local(x, wi, wi_prec, q):
    """Inverse of _negact_local: GS butterflies, reversed stages,
    inverse twiddles. The per-stage 1/2 factors are NOT applied here —
    the caller folds n^-1 into the final scale table."""
    L, R, Cl = x.shape
    rows = jnp.arange(R)[None, :, None]
    d = x
    for s in reversed(range(R.bit_length() - 1)):
        m = 1 << s
        half = R // (2 * m)
        is_y = (rows & half) != 0
        up = jnp.roll(d, -half, axis=1)
        dn = jnp.roll(d, half, axis=1)
        partner = jnp.where(is_y, dn, up)
        xv = jnp.where(is_y, partner, d)
        yv = jnp.where(is_y, d, partner)
        om = wi[:, s, :, None]
        omp = wi_prec[:, s, :, None]
        nx = modops.add_mod(xv, yv, q)
        ny = modops.shoup_mul(modops.sub_mod(xv, yv, q), om, omp, q)
        d = jnp.where(is_y, ny, nx)
    return d


def _xpose(y, axis_size, axis_name):
    """[L, A, B/d] -> [L, B, A/d] over the mesh axis (one all_to_all)."""
    L, A, Bl = y.shape
    d = axis_size
    y = y.reshape(L, d, A // d, Bl)
    y = jax.lax.all_to_all(y, axis_name, split_axis=1, concat_axis=2,
                           tiled=False)              # [L, A/d, d, Bl]
    y = y.reshape(L, A // d, d * Bl).transpose(0, 2, 1)
    return y


def ntt_fwd_local(xl, t_local, d, axis):
    """Shard-local forward 4-step body ([L, R, C/d] block in, same
    layout out) — callable from inside an enclosing shard_map (the
    spmd keyswitch reuses it)."""
    (q, p1, p1p, t2, t2p, rr, rrp, rc, rcp) = t_local
    y = modops.shoup_mul(xl, p1, p1p, q)
    y = _negact_local(y, rr, rrp, q)
    y = modops.shoup_mul(y, t2, t2p, q)
    y = _xpose(y, d, axis)
    y = _negact_local(y, rc, rcp, q)
    y = _xpose(y, d, axis)
    return y


def ntt_inv_local(xl, t_local, d, axis):
    """Shard-local inverse 4-step body (exact mirror network)."""
    (q, d2i, d2ip, fin, finp, rri, rrip, rci, rcip) = t_local
    y = _xpose(xl, d, axis)
    y = _negact_inv_local(y, rci, rcip, q)
    y = _xpose(y, d, axis)
    y = modops.shoup_mul(y, d2i, d2ip, q)
    y = _negact_inv_local(y, rri, rrip, q)
    y = modops.shoup_mul(y, fin, finp, q)
    return y


def sharded_ntt_fwd(x: jnp.ndarray, t: ShardedNttTables, mesh: Mesh,
                    axis: str = "limb") -> jnp.ndarray:
    """Forward NTT of [L, N] u64, coefficient columns sharded over
    `axis`. Two all_to_all transposes ride the interconnect; all
    butterflies are shard-local."""
    from jax import shard_map

    L, n = x.shape
    R, C = t.shape_rc
    d = mesh.shape[axis]
    xm = x.reshape(L, R, C)

    def body(xl, q, p1, p1p, t2, t2p, rr, rrp, rc, rcp):
        return ntt_fwd_local(
            xl, (q, p1, p1p, t2, t2p, rr, rrp, rc, rcp), d, axis)

    spec_data = P(None, None, axis)
    spec_row = P(None, None, None)
    out = shard_map(
        body, mesh=mesh,
        in_specs=(spec_data, spec_row, spec_data, spec_data,
                  spec_data, spec_data, spec_row, spec_row,
                  spec_row, spec_row),
        out_specs=spec_data,
    )(xm, t.q, t.p1, t.p1_prec, t.t2, t.t2_prec, t.rr, t.rr_prec,
      t.rc, t.rc_prec)
    return out.reshape(L, n)


def sharded_ntt_inv(x: jnp.ndarray, t: ShardedNttTables, mesh: Mesh,
                    axis: str = "limb") -> jnp.ndarray:
    """Inverse of sharded_ntt_fwd (same all_to_all structure, GS
    butterflies with inverse twiddles, n^-1 folded into the final
    scale). Bit-exact inverse: fwd -> inv round-trips exactly."""
    from jax import shard_map

    L, n = x.shape
    R, C = t.shape_rc
    d = mesh.shape[axis]
    xm = x.reshape(L, R, C)

    def body(xl, q, d2i, d2ip, fin, finp, rri, rrip, rci, rcip):
        return ntt_inv_local(
            xl, (q, d2i, d2ip, fin, finp, rri, rrip, rci, rcip), d, axis)

    spec_data = P(None, None, axis)
    spec_row = P(None, None, None)
    out = shard_map(
        body, mesh=mesh,
        in_specs=(spec_data, spec_row, spec_data, spec_data,
                  spec_data, spec_data, spec_row, spec_row,
                  spec_row, spec_row),
        out_specs=spec_data,
    )(xm, t.q, t.d2i, t.d2i_prec, t.fin, t.fin_prec, t.rri, t.rri_prec,
      t.rci, t.rci_prec)
    return out.reshape(L, n)
