"""SPMD hybrid key-switching over a ('digit', 'slot') device mesh.

The multi-chip execution design of SURVEY.md §5.8, realized with
shard_map + explicit XLA collectives (no NCCL-analog plumbing):

  - 'digit' axis: the hybrid-KSW digit MACs are independent until the
    final accumulation. Each digit row of the mesh holds ONLY its key
    digit (1/D of the ~34.5 GB rotation-key residency that motivates
    multi-chip in the reference, rtlib context.c:100-107), computes its
    digit's decompose -> mod-up -> MAC locally, and the extended-basis
    accumulation is ONE psum over the axis.
  - 'slot' axis: polynomial coefficients are sharded across chips; all
    elementwise limb math is local and the NTTs inside mod-up/mod-down
    are the slot-sharded 4-step (parallel/sharded_ntt) whose two
    transposes are all_to_all over ICI.

Bit-exactness contract: SpmdKeySwitch.rotate == Evaluator.rotate on
the same keys (tests/test_spmd_ksw.py).

Exact-semantics sources: Fast_switch_key_ext ckks_evaluator.c:404-461,
mod-up polynomial.c:877-926, mod-down :928-966. The own-part rows of
the base conversion use the identity conv(x)_j == x_j (q_j | Q_part),
so every digit extends to the full QP basis with one uniform matrix
instead of the reference's splice — same values, SPMD-friendly shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P_

from ace_tpu.ops import modops
from ace_tpu.parallel import sharded_ntt as SN
from ace_tpu.poly.poly import RnsPoly, _base_conv_data


def make_digit_slot_mesh(num_digits: int, num_slot: int,
                         devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = num_digits * num_slot
    assert len(devices) >= need
    dev = np.asarray(devices[:need]).reshape(num_digits, num_slot)
    return Mesh(dev, ("digit", "slot"))


# table array order inside the shard_map argument list
_COL_TABS = ("p1", "p1_prec", "t2", "t2_prec",
             "d2i", "d2i_prec", "fin", "fin_prec")     # last dim C -> 'slot'
_ROW_TABS = ("q", "rr", "rr_prec", "rc", "rc_prec",
             "rri", "rri_prec", "rci", "rci_prec")     # replicated
_TAB_ORDER = _COL_TABS + _ROW_TABS


def _tab_list(t):
    return [getattr(t, name) for name in _TAB_ORDER]


def _packs(tabs: dict, rows):
    """(fwd_pack, inv_pack) row-sliced table tuples for ntt_*_local."""
    g = lambda name: tabs[name][rows]
    fwd = (g("q"), g("p1"), g("p1_prec"), g("t2"), g("t2_prec"),
           g("rr"), g("rr_prec"), g("rc"), g("rc_prec"))
    inv = (g("q"), g("d2i"), g("d2i_prec"), g("fin"), g("fin_prec"),
           g("rri"), g("rri_prec"), g("rci"), g("rci_prec"))
    return fwd, inv


def _dyn_rows(x, start, count):
    zeros = (jnp.int32(0),) * (x.ndim - 1)
    return jax.lax.dynamic_slice(
        x, (start,) + zeros, (count,) + x.shape[1:])


class SpmdKeySwitch:
    """Precomputed SPMD rotate at one (level, mesh)."""

    def __init__(self, params, level: int, mesh: Mesh):
        crt = params.crt
        self.params = params
        self.crt = crt
        self.level = level
        self.mesh = mesh
        self.n = params.degree
        self.num_digits = crt.num_decomp(level)
        assert mesh.shape["digit"] == self.num_digits, \
            "mesh digit axis must equal the live q-part count"
        self.s = mesh.shape["slot"]
        per = crt.per_part_size
        qp_primes = list(crt.q_primes[:level]) + list(crt.p_primes)
        QP = len(qp_primes)
        self.QP, self.per = QP, per
        assert level >= per, "level must cover one full digit"
        self.tabs = SN.make_sharded_ntt_tables(qp_primes, self.n)
        R, C = self.tabs.shape_rc
        self.R, self.C = R, C

        # per-digit constants in WINDOW coordinates: the part iNTT reads
        # rows [start, start+per) of the chain with start = min(d*per,
        # level-per) (dynamic_slice clamping); the digit's own limbs sit
        # at window positions [d*per - start, ... + sz)
        hat_inv = np.zeros((self.num_digits, per), dtype=np.uint64)
        hat_prec = np.zeros((self.num_digits, per), dtype=np.uint64)
        mat = np.zeros((self.num_digits, QP, per), dtype=np.uint64)
        for d in range(self.num_digits):
            part_qs = [int(q) for q in crt.parts[d]][
                :max(0, level - per * d)]
            sz = len(part_qs)
            start = min(d * per, level - per)
            off = d * per - start
            hi = crt.part_hat_inv_mod_q[d][sz - 1]
            for i in range(sz):
                v = int(hi[i])
                hat_inv[d, off + i] = v
                hat_prec[d, off + i] = (v << 64) // part_qs[i]
            compl_idx = list(crt.compl_indices[level - 1][d])
            m = crt.part_hat_mod_compl[level - 1][d]
            for i in range(sz):
                for j, g in enumerate(compl_idx):
                    # compl_indices are in all-primes coordinates; P
                    # limbs sit at [level, level+K) in the live basis
                    gl = g if g < level else level + (g - crt.num_q)
                    mat[d, gl, off + i] = int(m[i][j])
            qpart = 1
            for q in part_qs:
                qpart *= q
            for i, q in enumerate(part_qs):
                # own-part rows: exact diagonal (u*Q_part == 0 mod q)
                mat[d, d * per + i, off + i] = (qpart // q) % q
        self.hat_inv = jnp.asarray(hat_inv)
        self.hat_prec = jnp.asarray(hat_prec)
        self.mat = jnp.asarray(mat)
        # window moduli per digit (the actual chain primes in-window)
        part_q = np.zeros((self.num_digits, per, 1, 1), dtype=np.uint64)
        for d in range(self.num_digits):
            start = min(d * per, level - per)
            part_q[d, :, 0, 0] = qp_primes[start:start + per]
        self.part_q = jnp.asarray(part_q)

        # mod-down constants (poly.mod_down)
        self.num_p = crt.num_p
        self.p_hat_inv = [int(v) for v in crt.p_hat_inv_mod_p]
        self.p_hat_mod_q = [[int(v) for v in row]
                            for row in crt.p_hat_mod_q[:level]]
        p_inv = [int(v) for v in crt.p_inv_mod_q[:level]]
        self.p_inv = jnp.asarray(modops.np_u64([[v] for v in p_inv]))
        self.p_inv_prec = jnp.asarray(modops.np_u64(
            [[modops.precompute_shoup(v, q)]
             for v, q in zip(p_inv, crt.q_primes[:level])]))
        self.q_arr, _, _ = crt.mod_arrays(range(level))
        self.qp_arr = jnp.asarray(modops.np_u64([[q] for q in qp_primes]))
        mus = [modops.precompute_barrett128(q) for q in qp_primes]
        self.qp_mu_hi = jnp.asarray(modops.np_u64([[m[0]] for m in mus]))
        self.qp_mu_lo = jnp.asarray(modops.np_u64([[m[1]] for m in mus]))
        self._jit_cache = {}
        self._resident = {}  # id(SwitchKey) -> digit-sharded stacks

    def _auto_maps(self, auto_idx: int):
        """Per-shard column gather maps [s, R, C/s] of flat-N indices."""
        order = np.asarray(self.crt.auto_order(auto_idx))
        R, C, s = self.R, self.C, self.s
        Cl = C // s
        flat = order.reshape(R, C)
        maps = np.stack([flat[:, k * Cl:(k + 1) * Cl] for k in range(s)])
        return jnp.asarray(maps.astype(np.int32))

    def _build(self, with_auto: bool = True):
        """shard_map body for one hybrid key-switch.

        with_auto=True: rotate semantics — switch-key c1, add c0, apply
        the automorphism to both outputs (Fast_rotate).
        with_auto=False: relinearize semantics — switch-key the target
        poly (c2), add (c0, c1) to the two outputs (Relinearize_ciph3,
        ckks_evaluator.c:258-270)."""
        level, per, QP = self.level, self.per, self.QP
        R, C, s, n = self.R, self.C, self.s, self.n
        num_p = self.num_p
        crt = self.crt
        D = self.num_digits
        q3 = self.q_arr[:, :, None]
        qp3 = self.qp_arr[:, :, None]
        mu_hi3 = self.qp_mu_hi[:, :, None]
        mu_lo3 = self.qp_mu_lo[:, :, None]

        def body(c0, c1, tgt, kb, ka, hat_inv, hat_prec, mat, part_q,
                 amap, *tab_arrays):
            tabs = dict(zip(_TAB_ORDER, tab_arrays))
            Cl = c0.shape[2]

            def mod_down_local(e):
                _, inv_p = _packs(tabs, slice(level, QP))
                fwd_q, _ = _packs(tabs, slice(0, level))
                p_rows = SN.ntt_inv_local(e[level:], inv_p, s, "slot")
                conv = _base_conv_data(
                    p_rows.reshape(num_p, R * Cl),
                    list(crt.p_primes), list(crt.q_primes[:level]),
                    self.p_hat_inv, self.p_hat_mod_q
                ).reshape(level, R, Cl)
                conv = SN.ntt_fwd_local(conv, fwd_q, s, "slot")
                diff = modops.sub_mod(e[:level], conv, q3)
                return modops.shoup_mul(diff, self.p_inv[:, :, None],
                                        self.p_inv_prec[:, :, None], q3)

            d = jax.lax.axis_index("digit")
            start = jnp.minimum(d * per, level - per).astype(jnp.int32)
            zero = jnp.int32(0)
            part = jax.lax.dynamic_slice(tgt, (start, zero, zero),
                                         (per, R, Cl))
            _, inv_full = _packs(tabs, slice(0, QP))
            inv_part = tuple(_dyn_rows(x, start, per) for x in inv_full)
            part = SN.ntt_inv_local(part, inv_part, s, "slot")
            # base conversion to the full QP basis (own rows exact)
            hi = hat_inv[0]
            hip = hat_prec[0]
            m_ = mat[0]
            pq = part_q[0]
            tmp = modops.shoup_mul(part, hi[:, None, None],
                                   hip[:, None, None], pq)
            acc_hi = jnp.zeros((QP, R, Cl), dtype=jnp.uint64)
            acc_lo = jnp.zeros_like(acc_hi)
            for o in range(per):
                w = m_[:, o][:, None, None]
                ph, pl = modops.mul_128(tmp[o][None], w)
                nl = acc_lo + pl
                carry = (nl < pl).astype(jnp.uint64)
                acc_hi = acc_hi + ph + carry
                acc_lo = nl
            ext = modops.barrett_reduce_128(acc_hi, acc_lo, qp3,
                                            mu_hi3, mu_lo3)
            fwd_full, _ = _packs(tabs, slice(0, QP))
            ext = SN.ntt_fwd_local(ext, fwd_full, s, "slot")
            # digit MAC against the local key digit, then ONE psum
            e0 = modops.barrett_mul_d(ext, kb[0], qp3, mu_hi3, mu_lo3)
            e1 = modops.barrett_mul_d(ext, ka[0], qp3, mu_hi3, mu_lo3)
            e0 = jax.lax.psum(e0, "digit")
            e1 = jax.lax.psum(e1, "digit")
            # D canonical terms: at most D-1 conditional subtracts
            for _ in range(D - 1):
                e0 = jnp.where(e0 >= qp3, e0 - qp3, e0)
                e1 = jnp.where(e1 >= qp3, e1 - qp3, e1)
            s0 = mod_down_local(e0)
            s1 = mod_down_local(e1)
            t0 = modops.add_mod(s0, c0, q3)
            if not with_auto:
                t1 = modops.add_mod(s1, c1, q3)
                return t0, t1

            def auto(x):
                full = jax.lax.all_gather(x, "slot", axis=2, tiled=True)
                return full.reshape(level, n)[:, amap[0]]

            return auto(t0), auto(s1)

        spec_ct = P_(None, None, "slot")
        spec_key = P_("digit", None, None, "slot")
        tab_specs = tuple(
            P_(None, None, "slot") if name in _COL_TABS
            else P_(*([None] * getattr(self.tabs, name).ndim))
            for name in _TAB_ORDER)
        out_spec = spec_ct
        return shard_map(
            body, mesh=self.mesh,
            in_specs=(spec_ct, spec_ct, spec_ct, spec_key, spec_key,
                      P_("digit", None), P_("digit", None),
                      P_("digit", None, None),
                      P_("digit", None, None, None),
                      P_("slot", None, None)) + tab_specs,
            out_specs=(out_spec, out_spec),
            check_vma=False,
        )

    # -- per-digit key residency -------------------------------------------

    def _key_stack(self, key):
        """[D, QP, R, C] digit stack of one switching key, device-put
        with the 'digit'-sharded layout: each digit row of the mesh
        holds ONLY its own digit (1/D of the key bytes — the multi-chip
        key-residency motivation, rtlib context.c:100-107). Cached per
        key object so repeated ops reuse resident shards."""
        kid = id(key)
        hit = self._resident.get(kid)
        if hit is not None:
            return hit
        from jax.sharding import NamedSharding
        level = self.level
        R, C = self.R, self.C

        def stack(kparts):
            rows = []
            for kp in kparts:
                data = jnp.concatenate(
                    [kp.data[:level], kp.data[self.crt.num_q:]], axis=0)
                rows.append(data.reshape(self.QP, R, C))
            sh = NamedSharding(self.mesh, P_("digit", None, None, "slot"))
            return jax.device_put(jnp.stack(rows), sh)

        out = (stack(key.b), stack(key.a))
        self._resident[kid] = out
        return out

    def key_memory_resident_bytes(self) -> int:
        """Per-device key bytes (total / D / s): the residency report."""
        total = 0
        for kb, ka in self._resident.values():
            total += kb.size * kb.dtype.itemsize
            total += ka.size * ka.dtype.itemsize
        return total // (self.num_digits * self.s)

    # -- ops -----------------------------------------------------------------

    def rotate(self, ct, rotation: int, keygen):
        """SPMD rotate: bit-exact vs Evaluator.rotate."""
        auto_idx, key = keygen.rot_key(rotation)
        level = self.level
        assert ct.level == level
        R, C = self.R, self.C
        if "rot" not in self._jit_cache:
            self._jit_cache["rot"] = jax.jit(self._build(with_auto=True))
        kb, ka = self._key_stack(key)
        d0, d1 = self._jit_cache["rot"](
            ct.c0.data.reshape(level, R, C),
            ct.c1.data.reshape(level, R, C),
            ct.c1.data.reshape(level, R, C),
            kb, ka,
            self.hat_inv, self.hat_prec, self.mat, self.part_q,
            self._auto_maps(auto_idx), *_tab_list(self.tabs))
        from ace_tpu.ckks.cipher import Ciphertext
        return Ciphertext(
            RnsPoly(d0.reshape(level, self.n), level, 0, True),
            RnsPoly(d1.reshape(level, self.n), level, 0, True),
            ct.scaling_factor, ct.sf_degree, ct.slots)

    def relinearize(self, c3, keygen):
        """SPMD relinearize of a 3-term ciphertext: switch-key c2
        against the relin key, add into (c0, c1). Bit-exact vs
        Evaluator.relinearize (same digit MACs + mod-down)."""
        level = self.level
        assert c3.c2.num_q == level
        R, C = self.R, self.C
        if "relin" not in self._jit_cache:
            self._jit_cache["relin"] = jax.jit(
                self._build(with_auto=False))
        kb, ka = self._key_stack(keygen.relin_key)
        d0, d1 = self._jit_cache["relin"](
            c3.c0.data.reshape(level, R, C),
            c3.c1.data.reshape(level, R, C),
            c3.c2.data.reshape(level, R, C),
            kb, ka,
            self.hat_inv, self.hat_prec, self.mat, self.part_q,
            self._auto_maps(1), *_tab_list(self.tabs))
        from ace_tpu.ckks.cipher import Ciphertext
        return Ciphertext(
            RnsPoly(d0.reshape(level, self.n), level, 0, True),
            RnsPoly(d1.reshape(level, self.n), level, 0, True),
            c3.scaling_factor, c3.sf_degree, c3.slots)
