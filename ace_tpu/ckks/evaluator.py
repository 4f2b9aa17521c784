"""CKKS homomorphic evaluator: the TPU-native scheme-op layer.

Functional re-design of the reference CKKS_EVALUATOR
(fhe-cmplr/rtlib/ant/src/util/ckks_evaluator.c). Every op takes/returns
Ciphertext pytrees of RnsPoly device arrays and is fully traceable under
jit; levels/scales are static metadata so each level compiles its own
fused program.

Exact-semantics sources (file:line in the reference):
  encrypt/decrypt:   ckks_encryptor.c:20-75, ckks_decryptor.c:18-57
  add/sub/plain ops: ckks_evaluator.c:37-215
  mul (ciph3):       ckks_evaluator.c:181-226 (c0c0', c0c1'+c1c0', c1c1')
  relinearize:       ckks_evaluator.c:258-270 (switch-key on c2 + add)
  rescale:           ckks_evaluator.c:309-329 (+ scale bookkeeping)
  hybrid keyswitch:  ckks_evaluator.c:391-461 (digit MACs in QP basis,
                     then mod-down); digits via Decompose/Raise
  rotate:            ckks_evaluator.c:507-545 (keyswitch c1, add c0,
                     then automorphism of both outputs)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ace_tpu.ckks.cipher import Ciphertext, Ciphertext3
from ace_tpu.ops import modops
from ace_tpu.ckks.encoder import Encoder, Plaintext
from ace_tpu.ckks.keygen import KeyGenerator, SwitchKey
from ace_tpu.ckks.params import CkksParams
from ace_tpu.poly import poly as P
from ace_tpu.poly.poly import RnsPoly
from ace_tpu.utils import number_theory as nt


class Evaluator:
    def __init__(self, params: CkksParams, keygen: KeyGenerator,
                 encoder: Encoder):
        self.params = params
        self.crt = params.crt
        self.keygen = keygen
        self.encoder = encoder
        # jitted op bundles, keyed by static structure (op, level,
        # rotation indices, ...). Bundling a whole key-switch into one
        # XLA program removes both per-sub-op dispatch latency and
        # dozens of tiny executables per op class.
        self._jit_cache: dict = {}

    # -- encrypt / decrypt ----------------------------------------------

    def encrypt(self, plain: Plaintext) -> Ciphertext:
        kg = self.keygen
        crt = self.crt
        level = plain.poly.num_q
        v = kg._small_qp_poly(kg._sample_triangle())
        e0 = kg._small_qp_poly(kg._sample_triangle())
        e1 = kg._small_qp_poly(kg._sample_triangle())

        def at_level(p: RnsPoly) -> RnsPoly:
            return RnsPoly(p.data[:level], level, 0, p.is_ntt)

        pk_b, pk_a = at_level(kg.pk.b), at_level(kg.pk.a)
        c0 = P.add(P.add(P.mul(pk_b, at_level(v), crt), at_level(e0), crt),
                   plain.poly, crt)
        c1 = P.add(P.mul(pk_a, at_level(v), crt), at_level(e1), crt)
        return Ciphertext(c0, c1, plain.scaling_factor, plain.sf_degree,
                          plain.slots)

    def decrypt(self, ciph: Ciphertext) -> Plaintext:
        crt = self.crt
        level = ciph.level
        sk = RnsPoly(self.keygen.sk.ntt_sk.data[:level], level, 0, True)
        m = P.add(P.mul(ciph.c1, sk, crt), ciph.c0, crt)
        return Plaintext(m, ciph.scaling_factor, ciph.sf_degree, ciph.slots)

    # -- linear ops ------------------------------------------------------

    def _adjust(self, c1: Ciphertext, c2: Ciphertext):
        """Drop limbs of the higher-level operand (Adjust_level)."""
        lv = min(c1.level, c2.level)

        def cut(c: Ciphertext) -> Ciphertext:
            if c.level == lv:
                return c
            return Ciphertext(RnsPoly(c.c0.data[:lv], lv, 0, c.c0.is_ntt),
                              RnsPoly(c.c1.data[:lv], lv, 0, c.c1.is_ntt),
                              c.scaling_factor, c.sf_degree, c.slots)
        return cut(c1), cut(c2)

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._adjust(a, b)
        return Ciphertext(P.add(a.c0, b.c0, self.crt),
                          P.add(a.c1, b.c1, self.crt),
                          a.scaling_factor, a.sf_degree, a.slots)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._adjust(a, b)
        return Ciphertext(P.sub(a.c0, b.c0, self.crt),
                          P.sub(a.c1, b.c1, self.crt),
                          a.scaling_factor, a.sf_degree, a.slots)

    def negate(self, a: Ciphertext) -> Ciphertext:
        return Ciphertext(P.neg(a.c0, self.crt), P.neg(a.c1, self.crt),
                          a.scaling_factor, a.sf_degree, a.slots)

    def add_plain(self, a: Ciphertext, plain: Plaintext) -> Ciphertext:
        return Ciphertext(P.add(a.c0, plain.poly, self.crt), a.c1,
                          a.scaling_factor, a.sf_degree, a.slots)

    def sub_plain(self, a: Ciphertext, plain: Plaintext) -> Ciphertext:
        return Ciphertext(P.sub(a.c0, plain.poly, self.crt), a.c1,
                          a.scaling_factor, a.sf_degree, a.slots)

    def _const_int(self, val: float, sf_degree: int) -> int:
        """llround(val * Delta) * Delta^(sf_degree-1) as an exact int —
        the same value encode() produces for a broadcast scalar (the
        scale-then-power structure of Encode_impl's sf_degree>1 path),
        without the embedding round-trip: the canonical embedding of a
        constant vector is the constant polynomial. Applies the same
        +0.5 pre-bias as encode() (ckks_encoder.c:248) so both paths
        produce the identical integer."""
        delta = self.params.scaling_factor
        m = val * delta + 0.5
        m = int(np.floor(m + 0.5)) if m >= 0 else -int(np.floor(-m + 0.5))
        return m * int(delta) ** (sf_degree - 1)

    def add_const(self, a: Ciphertext, val: float) -> Ciphertext:
        """Add a broadcast scalar: constant-polynomial fast path — in
        NTT form the constant c contributes c to every slot of c0."""
        c = self._const_int(val, a.sf_degree)
        level = a.level
        qs = self.crt.q_primes[:level]
        res = modops.np_u64([[c % q] for q in qs])
        fn = self._get_jit(("addc", level), self._mk_add_scalar, level)
        d0 = fn(a.c0.data, jnp.asarray(res))
        return Ciphertext(RnsPoly(d0, level, 0, True), a.c1,
                          a.scaling_factor, a.sf_degree, a.slots)

    def _mk_add_scalar(self, level: int):
        q, _, _ = self.crt.mod_arrays(range(level))

        def impl(c0, res):
            return modops.add_mod(c0, res, q)

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    def mul_plain(self, a: Ciphertext, plain: Plaintext) -> Ciphertext:
        level = a.level
        num_p = a.c0.num_p
        fn = self._get_jit(("mp", level, num_p), self._mk_mul_plain,
                           level, num_p)
        d0, d1 = fn(a.c0.data, a.c1.data, plain.poly.data)
        return Ciphertext(RnsPoly(d0, level, num_p, True),
                          RnsPoly(d1, level, num_p, True),
                          a.scaling_factor * plain.scaling_factor,
                          a.sf_degree + plain.sf_degree, a.slots)

    def _mk_mul_plain(self, level: int, num_p: int):
        crt = self.crt

        def impl(c0, c1, pl):
            p = RnsPoly(pl, level, num_p, True)
            return (P.mul(RnsPoly(c0, level, num_p, True), p, crt).data,
                    P.mul(RnsPoly(c1, level, num_p, True), p, crt).data)

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    def mul_const(self, a: Ciphertext, val: float) -> Ciphertext:
        """Multiply by a broadcast scalar: per-limb Shoup scalar multiply
        (constant-polynomial fast path; scale grows by Delta)."""
        c = self._const_int(val, 1)
        out = Ciphertext(
            P.mul_scalars(a.c0, [c] * a.level, self.crt),
            P.mul_scalars(a.c1, [c] * a.level, self.crt),
            a.scaling_factor * self.params.scaling_factor,
            a.sf_degree + 1, a.slots)
        return out

    def mul_integer(self, a: Ciphertext, k: int) -> Ciphertext:
        idx = list(range(a.level))
        scalars = [k % q for q in self.crt.q_primes[:a.level]]
        return Ciphertext(P.mul_scalars(a.c0, scalars, self.crt),
                          P.mul_scalars(a.c1, scalars, self.crt),
                          a.scaling_factor, a.sf_degree, a.slots)

    def mul_by_monomial(self, a: Ciphertext, power: int) -> Ciphertext:
        """Multiply by x^power (ckks_evaluator.c:228-256)."""
        crt = self.crt
        n = a.c0.degree
        power_reduced = power % (2 * n)
        index = power % n
        coeffs = np.zeros((a.level, n), dtype=np.uint64)
        for l, q in enumerate(crt.q_primes[:a.level]):
            coeffs[l, index] = 1 if power_reduced < n else q - 1
        mono = P.to_ntt(RnsPoly(jnp.asarray(coeffs), a.level, 0, False), crt)
        return Ciphertext(P.mul(a.c0, mono, crt), P.mul(a.c1, mono, crt),
                          a.scaling_factor, a.sf_degree, a.slots)

    # -- multiplication / relinearization -------------------------------

    def mul3(self, a: Ciphertext, b: Ciphertext) -> Ciphertext3:
        a, b = self._adjust(a, b)
        crt = self.crt
        c0 = P.mul(a.c0, b.c0, crt)
        c1 = P.add(P.mul(a.c0, b.c1, crt), P.mul(a.c1, b.c0, crt), crt)
        c2 = P.mul(a.c1, b.c1, crt)
        return Ciphertext3(c0, c1, c2,
                           a.scaling_factor * b.scaling_factor,
                           a.sf_degree + b.sf_degree, a.slots)

    def _switch_key_digits(self, poly: RnsPoly) -> list[RnsPoly]:
        """Decompose + raise every digit (Switch_key_precompute)."""
        crt = self.crt
        num = crt.num_decomp(poly.num_q)
        out = []
        for part in range(num):
            digit = P.decompose(poly, crt, part)
            out.append(P.mod_up(digit, crt, poly.num_q, part))
        return out

    def _switch_key_ext(self, key: SwitchKey, digits: list[RnsPoly],
                        level: int) -> tuple[RnsPoly, RnsPoly]:
        """Digit MACs against the key in the extended QP basis
        (Fast_switch_key_ext, ckks_evaluator.c:404-461)."""
        crt = self.crt
        acc0 = acc1 = None
        for part, raised in enumerate(digits):
            def key_at_level(kp: RnsPoly) -> RnsPoly:
                data = jnp.concatenate(
                    [kp.data[:level], kp.data[crt.num_q:]], axis=0)
                return RnsPoly(data, level, crt.num_p, True)
            k0 = key_at_level(key.b[part])
            k1 = key_at_level(key.a[part])
            t0 = P.mul(k0, raised, crt)
            t1 = P.mul(k1, raised, crt)
            acc0 = t0 if acc0 is None else P.add(acc0, t0, crt)
            acc1 = t1 if acc1 is None else P.add(acc1, t1, crt)
        return acc0, acc1

    def _switch_key(self, key: SwitchKey, poly: RnsPoly
                    ) -> tuple[RnsPoly, RnsPoly]:
        """Full hybrid key switch of `poly`: returns (s0, s1) over Q_level."""
        digits = self._switch_key_digits(poly)
        e0, e1 = self._switch_key_ext(key, digits, poly.num_q)
        return P.mod_down(e0, self.crt), P.mod_down(e1, self.crt)

    def relinearize(self, c3: Ciphertext3) -> Ciphertext:
        s0, s1 = self._switch_key(self.keygen.relin_key, c3.c2)
        crt = self.crt
        return Ciphertext(P.add(s0, c3.c0, crt), P.add(s1, c3.c1, crt),
                          c3.scaling_factor, c3.sf_degree, c3.slots)

    def mul(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._adjust(a, b)
        level = a.level
        fn = self._get_jit(("mulrl", level), self._mk_mul_relin, level)
        kb, ka = self._key_raw(self.keygen.relin_key, level)
        d0, d1 = fn(a.c0.data, a.c1.data, b.c0.data, b.c1.data, kb, ka)
        return Ciphertext(RnsPoly(d0, level, 0, True),
                          RnsPoly(d1, level, 0, True),
                          a.scaling_factor * b.scaling_factor,
                          a.sf_degree + b.sf_degree, a.slots)

    def square(self, a: Ciphertext) -> Ciphertext:
        return self.mul(a, a)

    # -- rescale / scale management -------------------------------------

    def rescale(self, a: Ciphertext) -> Ciphertext:
        assert a.level > 1
        new_factor = a.scaling_factor / self.params.scaling_factor
        fn = self._get_jit(("rs", a.level), self._mk_rescale, a.level)
        d0, d1 = fn(a.c0.data, a.c1.data)
        return Ciphertext(RnsPoly(d0, a.level - 1, 0, True),
                          RnsPoly(d1, a.level - 1, 0, True),
                          new_factor, a.sf_degree - 1, a.slots)

    def upscale(self, a: Ciphertext, mod_size: int) -> Ciphertext:
        """Multiply by an encoding of 1.0 at scale 2^mod_size
        (ckks_evaluator.c:331-345) — a constant polynomial with
        coefficient exactly 2^mod_size, so a per-limb scalar multiply."""
        up = 1 << mod_size
        return Ciphertext(
            P.mul_scalars(a.c0, [up] * a.level, self.crt),
            P.mul_scalars(a.c1, [up] * a.level, self.crt),
            a.scaling_factor * float(up), a.sf_degree + 1, a.slots)

    def downscale(self, a: Ciphertext, waterline: int) -> Ciphertext:
        """Normalize scale back to one Delta (ckks_evaluator.c:347-366)."""
        sf_bits = self.params.scaling_mod_size
        ciph_bits = int(np.log2(a.scaling_factor))
        up_bits = waterline + sf_bits - ciph_bits
        up = self.upscale(a, up_bits)
        up = Ciphertext(up.c0, up.c1, up.scaling_factor, a.sf_degree + 1,
                        up.slots)
        return self.rescale(up)

    def mod_switch(self, a: Ciphertext) -> Ciphertext:
        """Drop the last limb without scaling (Mod_down_q_primes)."""
        lv = a.level - 1
        return Ciphertext(RnsPoly(a.c0.data[:lv], lv, 0, a.c0.is_ntt),
                          RnsPoly(a.c1.data[:lv], lv, 0, a.c1.is_ntt),
                          a.scaling_factor, a.sf_degree, a.slots)

    # -- rotation / conjugation -----------------------------------------

    def rotate(self, a: Ciphertext, rotation: int) -> Ciphertext:
        """Slot rotation: keyswitch c1, add c0, then automorphism
        (Fast_rotate, ckks_evaluator.c:507-545). One jitted program
        per (automorphism index, level)."""
        if rotation == 0:
            return a
        auto_idx, key = self.keygen.rot_key(rotation)
        level = a.level
        fn = self._get_jit(("rot", auto_idx, level), self._mk_rotate,
                           auto_idx, level)
        kb, ka = self._key_raw(key, level)
        d0, d1 = fn(a.c0.data, a.c1.data, kb, ka)
        return Ciphertext(RnsPoly(d0, level, 0, True),
                          RnsPoly(d1, level, 0, True),
                          a.scaling_factor, a.sf_degree, a.slots)

    def rotations_hoisted(self, a: Ciphertext,
                          rotations: list[int]) -> list[Ciphertext]:
        """Many rotations of one ciphertext sharing a single digit
        decompose/mod-up (the reference's mod-up hoisting,
        ut_ksw_opt.cxx:349-375 / Fast_rotate with shared precomputed)."""
        crt = self.crt
        digits = None
        out = []
        for r in rotations:
            if r == 0:
                out.append(a)
                continue
            if digits is None:
                digits = self._switch_key_digits(a.c1)
            auto_idx, key = self.keygen.rot_key(r)
            e0, e1 = self._switch_key_ext(key, digits, a.c1.num_q)
            s0 = P.mod_down(e0, crt)
            s1 = P.mod_down(e1, crt)
            t0 = P.add(s0, a.c0, crt)
            out.append(Ciphertext(P.automorphism(t0, auto_idx, crt),
                                  P.automorphism(s1, auto_idx, crt),
                                  a.scaling_factor, a.sf_degree, a.slots))
        return out

    # -- extended-basis (QP) rotation accumulation ------------------------
    # The reference's mod-up + mod-down hoisting (ut_ksw_opt.cxx:349-375,
    # Fast_rotate_ext ckks_evaluator.c:539-575, and the bootstrap BSGS
    # loops ckks_bootstrap_context.c:1288-1365): many rotations of one
    # ciphertext share a single digit decompose/mod-up, accumulate in the
    # extended QP basis, and pay ONE mod-down at the end.

    def _p_scale(self, poly: RnsPoly, ext: bool = False) -> RnsPoly:
        """x -> x*P over Q limbs (+ zero P limbs if ext): the embedding
        of a Q-basis poly into the QP basis (Switch_key_ext's
        Scalars_integer_multiply_poly by Get_pmodq)."""
        crt = self.crt
        scal = [crt.big_p % q for q in crt.q_primes[:poly.num_q]]
        out = P.mul_scalars(poly, scal, crt)
        if ext:
            zeros = jnp.zeros((crt.num_p, poly.degree), dtype=jnp.uint64)
            out = RnsPoly(jnp.concatenate([out.data, zeros], axis=0),
                          poly.num_q, crt.num_p, poly.is_ntt)
        return out

    def to_ext(self, a: Ciphertext) -> Ciphertext:
        """Embed a Q-basis ciphertext into the QP basis (x*P, zero P
        rows); mod_down_ciph inverts it exactly."""
        return Ciphertext(self._p_scale(a.c0, True), self._p_scale(a.c1, True),
                          a.scaling_factor, a.sf_degree, a.slots)

    def rotate_ext(self, a: Ciphertext, rotation: int, digits=None,
                   add_first: bool = True) -> Ciphertext:
        """Rotation in the extended basis (Fast_rotate_ext). `digits`
        are shared switch-key digits from switch_key_precompute(a.c1)."""
        if digits is None:
            digits = self._switch_key_digits(a.c1)
        auto_idx, key = self.keygen.rot_key(rotation)
        crt = self.crt
        e0, e1 = self._switch_key_ext(key, digits, a.c1.num_q)
        if add_first:
            c0p = self._p_scale(a.c0)
            level = a.c0.num_q
            q, _, _ = crt.mod_arrays(range(level))
            top = modops.add_mod(e0.data[:level], c0p.data, q)
            e0 = RnsPoly(jnp.concatenate([top, e0.data[level:]], axis=0),
                         e0.num_q, e0.num_p, e0.is_ntt)
        return Ciphertext(P.automorphism(e0, auto_idx, crt),
                          P.automorphism(e1, auto_idx, crt),
                          a.scaling_factor, a.sf_degree, a.slots)

    def mod_down_ciph(self, a: Ciphertext) -> Ciphertext:
        """QP -> Q: one Reduce_rns_base per component."""
        return Ciphertext(P.mod_down(a.c0, self.crt),
                          P.mod_down(a.c1, self.crt),
                          a.scaling_factor, a.sf_degree, a.slots)

    def switch_key_precompute(self, poly: RnsPoly) -> list:
        """Shared digit decompose + mod-up (Switch_key_precompute)."""
        return self._switch_key_digits(poly)

    # -- jitted op bundles -------------------------------------------------

    def _get_jit(self, key, builder, *args):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder(*args)
        return self._jit_cache[key]

    def _mk_rotate(self, auto_idx: int, level: int):
        crt = self.crt
        num_p = crt.num_p

        def impl(c0, c1, kb, ka):
            a0 = RnsPoly(c0, level, 0, True)
            a1 = RnsPoly(c1, level, 0, True)
            key = SwitchKey(
                [RnsPoly(d, crt.num_q, num_p, True) for d in kb],
                [RnsPoly(d, crt.num_q, num_p, True) for d in ka])
            digits = self._switch_key_digits(a1)
            e0, e1 = self._switch_key_ext(key, digits, level)
            s0 = P.mod_down(e0, crt)
            s1 = P.mod_down(e1, crt)
            t0 = P.add(s0, a0, crt)
            return (P.automorphism(t0, auto_idx, crt).data,
                    P.automorphism(s1, auto_idx, crt).data)

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    def _mk_mul_relin(self, level: int):
        crt = self.crt
        num_p = crt.num_p

        def impl(a0, a1, b0, b1, kb, ka):
            pa0 = RnsPoly(a0, level, 0, True)
            pa1 = RnsPoly(a1, level, 0, True)
            pb0 = RnsPoly(b0, level, 0, True)
            pb1 = RnsPoly(b1, level, 0, True)
            c0 = P.mul(pa0, pb0, crt)
            c1 = P.add(P.mul(pa0, pb1, crt), P.mul(pa1, pb0, crt), crt)
            c2 = P.mul(pa1, pb1, crt)
            key = SwitchKey(
                [RnsPoly(d, crt.num_q, num_p, True) for d in kb],
                [RnsPoly(d, crt.num_q, num_p, True) for d in ka])
            digits = self._switch_key_digits(c2)
            e0, e1 = self._switch_key_ext(key, digits, level)
            s0 = P.mod_down(e0, crt)
            s1 = P.mod_down(e1, crt)
            return (P.add(s0, c0, crt).data, P.add(s1, c1, crt).data)

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    def _mk_rescale(self, level: int):
        crt = self.crt

        def impl(c0, c1):
            return (P.rescale(RnsPoly(c0, level, 0, True), crt).data,
                    P.rescale(RnsPoly(c1, level, 0, True), crt).data)

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    # -- jitted hoisted rotation-MAC bundles ------------------------------

    def _key_raw(self, key: SwitchKey, level: int = 0):
        """Full key digit planes as raw arrays (jit args; the traced
        _switch_key_ext does the per-level slicing)."""
        return ([kb.data for kb in key.b], [ka.data for ka in key.a])

    def _mk_rot_mac_groups(self, auto_idxs: tuple, pattern: tuple,
                           level: int):
        """Build the traced impl for rot_ext_mac_groups_jit.

        auto_idxs[i]: automorphism index per rotation (1 = identity /
        no key switch). pattern[g][i]: whether group g uses rotation i.
        """
        crt = self.crt
        num_p = crt.num_p

        def impl(c0, c1, keys_b, keys_a, pls):
            cin0 = RnsPoly(c0, level, 0, True)
            cin1 = RnsPoly(c1, level, 0, True)
            digits = None
            exts = []
            ki = 0
            for ai in auto_idxs:
                if ai == 1:
                    exts.append((self._p_scale(cin0, True),
                                 self._p_scale(cin1, True)))
                    continue
                if digits is None:
                    digits = self._switch_key_digits(cin1)
                key = SwitchKey(
                    [RnsPoly(d, crt.num_q, num_p, True)
                     for d in keys_b[ki]],
                    [RnsPoly(d, crt.num_q, num_p, True)
                     for d in keys_a[ki]])
                ki += 1
                e0, e1 = self._switch_key_ext(key, digits, level)
                c0p = self._p_scale(cin0)
                q, _, _ = crt.mod_arrays(range(level))
                top = modops.add_mod(e0.data[:level], c0p.data, q)
                e0 = RnsPoly(jnp.concatenate([top, e0.data[level:]], axis=0),
                             level, num_p, True)
                exts.append((P.automorphism(e0, ai, crt),
                             P.automorphism(e1, ai, crt)))
            outs = []
            pi = 0
            for g, uses in enumerate(pattern):
                acc0 = acc1 = None
                for i, used in enumerate(uses):
                    if not used:
                        continue
                    pl = RnsPoly(pls[pi], level, num_p, True)
                    pi += 1
                    t0 = P.mul(exts[i][0], pl, crt)
                    t1 = P.mul(exts[i][1], pl, crt)
                    acc0 = t0 if acc0 is None else P.add(acc0, t0, crt)
                    acc1 = t1 if acc1 is None else P.add(acc1, t1, crt)
                outs.append((P.mod_down(acc0, crt).data,
                             P.mod_down(acc1, crt).data))
            return outs

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    def _mk_rot_sum(self, auto_idxs: tuple, level: int):
        crt = self.crt
        num_p = crt.num_p

        def impl(cs, keys_b, keys_a):
            acc0 = acc1 = None
            ki = 0
            for i, ai in enumerate(auto_idxs):
                c0 = RnsPoly(cs[i][0], level, 0, True)
                c1 = RnsPoly(cs[i][1], level, 0, True)
                if ai == 1:
                    e0 = self._p_scale(c0, True)
                    e1 = self._p_scale(c1, True)
                else:
                    key = SwitchKey(
                        [RnsPoly(d, crt.num_q, num_p, True)
                         for d in keys_b[ki]],
                        [RnsPoly(d, crt.num_q, num_p, True)
                         for d in keys_a[ki]])
                    ki += 1
                    digits = self._switch_key_digits(c1)
                    e0, e1 = self._switch_key_ext(key, digits, level)
                    c0p = self._p_scale(c0)
                    q, _, _ = crt.mod_arrays(range(level))
                    top = modops.add_mod(e0.data[:level], c0p.data, q)
                    e0 = RnsPoly(
                        jnp.concatenate([top, e0.data[level:]], axis=0),
                        level, num_p, True)
                    e0 = P.automorphism(e0, ai, crt)
                    e1 = P.automorphism(e1, ai, crt)
                acc0 = e0 if acc0 is None else P.add(acc0, e0, crt)
                acc1 = e1 if acc1 is None else P.add(acc1, e1, crt)
            return (P.mod_down(acc0, crt).data, P.mod_down(acc1, crt).data)

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    def rot_sum_jit(self, items: list) -> Ciphertext:
        """sum_i rot(ct_i, r_i) with one trailing mod-down, as a single
        jitted program (mod-down hoisting across different inputs —
        the Add_ciphertext-in-QP pattern of ut_ksw_opt.cxx:349-375).
        Chunked like rot_ext_mac_groups_jit to bound program size."""
        import os
        max_bundle = int(os.environ.get("ACE_TPU_MAX_BUNDLE", "5"))
        if len(items) > max_bundle:
            acc = None
            for s in range(0, len(items), max_bundle):
                part = self.rot_sum_jit(items[s:s + max_bundle])
                acc = part if acc is None else self.add(acc, part)
            return acc
        level = items[0][0].level
        auto_idxs = []
        keys_b, keys_a = [], []
        for ct, r in items:
            assert ct.level == level, "rot_sum inputs must share a level"
            if r == 0:
                auto_idxs.append(1)
                continue
            ai, key = self.keygen.rot_key(r)
            auto_idxs.append(ai)
            kb, ka = self._key_raw(key)
            keys_b.append(kb)
            keys_a.append(ka)
        fn = self._get_jit(("rsum", tuple(auto_idxs), level),
                           self._mk_rot_sum, tuple(auto_idxs), level)
        cs = [(ct.c0.data, ct.c1.data) for ct, _ in items]
        d0, d1 = fn(cs, keys_b, keys_a)
        ct0 = items[0][0]
        return Ciphertext(RnsPoly(d0, level, 0, True),
                          RnsPoly(d1, level, 0, True),
                          ct0.scaling_factor, ct0.sf_degree, ct0.slots)

    def rot_ext_mac_groups_jit(self, ct: Ciphertext, rots: list,
                               plain_groups: list,
                               _bundle: int = 0) -> list:
        """[sum_i rot(ct, rots[i]) * plain_groups[g][i] for g] — one
        jitted XLA program per (rotation set, usage pattern, level).
        plain_groups entries are extended-basis Plaintexts or None.

        Rotation sets larger than ACE_TPU_MAX_BUNDLE (default 5) are
        chunked into separate programs whose mod-downed partials are
        summed — the remote AOT compiler cannot digest a 9-rotation
        keyswitch bundle at deep L in reasonable time. If the remote
        compiler still dies on a bundle (OOM SIGKILL on a few
        many-group programs), the except path re-dispatches it split
        in half — smaller programs always compile."""
        import os
        if not plain_groups or all(all(p is None for p in grp)
                                   for grp in plain_groups):
            raise ValueError(
                "rot_ext_mac_groups_jit: plain_groups must contain at "
                "least one non-None plaintext")
        dead = [g for g, grp in enumerate(plain_groups)
                if all(p is None for p in grp)]
        if dead:
            # run the live groups, fill dead ones with matching zeros
            live = [g for g in range(len(plain_groups)) if g not in dead]
            parts = self.rot_ext_mac_groups_jit(
                ct, rots, [plain_groups[g] for g in live])
            total = [None] * len(plain_groups)
            for g, part in zip(live, parts):
                total[g] = part
            zero = self.sub(parts[0], parts[0])
            for g in dead:
                total[g] = zero
            return total
        max_bundle = _bundle or int(os.environ.get("ACE_TPU_MAX_BUNDLE",
                                                   "5"))
        if len(rots) > max_bundle:
            total = [None] * len(plain_groups)
            for s in range(0, len(rots), max_bundle):
                sub_rots = rots[s:s + max_bundle]
                sub_groups = [grp[s:s + max_bundle]
                              for grp in plain_groups]
                live_idx = [g for g, grp in enumerate(sub_groups)
                            if any(p is not None for p in grp)]
                if not live_idx:
                    continue
                parts = self.rot_ext_mac_groups_jit(
                    ct, sub_rots, [sub_groups[g] for g in live_idx])
                for g, part in zip(live_idx, parts):
                    total[g] = part if total[g] is None \
                        else self.add(total[g], part)
            # all-zero groups: a zero ciphertext at the right scale
            for g, v in enumerate(total):
                if v is None:
                    ref = next(x for x in total if x is not None)
                    total[g] = self.sub(ref, ref)
            return total
        level = ct.level
        auto_idxs = []
        keys_b, keys_a = [], []
        for r in rots:
            if r == 0:
                auto_idxs.append(1)
                continue
            ai, key = self.keygen.rot_key(r)
            auto_idxs.append(ai)
            kb, ka = self._key_raw(key, level)
            keys_b.append(kb)
            keys_a.append(ka)
        pattern = tuple(tuple(p is not None for p in grp)
                        for grp in plain_groups)
        fn = self._get_jit(("rmg", tuple(auto_idxs), pattern, level),
                           self._mk_rot_mac_groups,
                           tuple(auto_idxs), pattern, level)
        pls = [p.poly.data for grp in plain_groups for p in grp
               if p is not None]
        try:
            raw = fn(ct.c0.data, ct.c1.data, keys_b, keys_a, pls)
        except Exception as e:  # remote compiler OOM on huge programs
            if len(rots) > 1 and ("remote_compile" in str(e)
                                  or "RESOURCE_EXHAUSTED" in str(e)):
                return self.rot_ext_mac_groups_jit(
                    ct, rots, plain_groups,
                    _bundle=max(1, (len(rots) + 1) // 2))
            raise
        outs = []
        for g, (d0, d1) in enumerate(raw):
            pl_scale = next((p.scaling_factor for p in plain_groups[g]
                             if p is not None), self.params.scaling_factor)
            outs.append(Ciphertext(
                RnsPoly(d0, level, 0, True), RnsPoly(d1, level, 0, True),
                ct.scaling_factor * pl_scale, ct.sf_degree + 1, ct.slots))
        return outs

    def _mk_rot_mac_groups_msgs(self, auto_idxs: tuple, level: int):
        """Scan-over-groups bundle for rot_mac_groups_msgs_jit.

        Program size is O(R) in rotations and O(1) in groups: the
        per-group work (plaintext RNS lift + NTT + MAC + mod-down) is
        one lax.scan body, so a 64-group layer-3 conv compiles the same
        module as a 4-group one. This replaced the unrolled
        _mk_rot_mac_groups whose 2*G mod-downs (each iNTT+NTT) made XLA
        chew 15-25 min per layer-3 program and OOM the remote compile
        helper (round-4 logs).

        The plaintext lift reproduces encoder.encode bit-exactly:
        _signed_to_rns (canonical residues of the int64 message) and the
        same gathered NTT tables, now traced on device.
        """
        import jax
        from ace_tpu.ops import ntt
        crt = self.crt
        num_p = crt.num_p
        idx = list(range(level)) + [crt.num_q + j for j in range(num_p)]

        def impl(c0, c1, keys_b, keys_a, msgs):
            cin0 = RnsPoly(c0, level, 0, True)
            cin1 = RnsPoly(c1, level, 0, True)
            q_live, _, _ = crt.mod_arrays(range(level))
            digits = None
            ki = 0
            e0s, e1s = [], []
            for ai in auto_idxs:
                if ai == 1:
                    e0 = self._p_scale(cin0, True)
                    e1 = self._p_scale(cin1, True)
                else:
                    if digits is None:
                        digits = self._switch_key_digits(cin1)
                    key = SwitchKey(
                        [RnsPoly(d, crt.num_q, num_p, True)
                         for d in keys_b[ki]],
                        [RnsPoly(d, crt.num_q, num_p, True)
                         for d in keys_a[ki]])
                    ki += 1
                    ee0, ee1 = self._switch_key_ext(key, digits, level)
                    c0p = self._p_scale(cin0)
                    top = modops.add_mod(ee0.data[:level], c0p.data, q_live)
                    ee0 = RnsPoly(
                        jnp.concatenate([top, ee0.data[level:]], axis=0),
                        level, num_p, True)
                    e0 = P.automorphism(ee0, ai, crt)
                    e1 = P.automorphism(ee1, ai, crt)
                e0s.append(e0.data)
                e1s.append(e1.data)
            ext0 = jnp.stack(e0s)  # [R, level+K, N]
            ext1 = jnp.stack(e1s)
            qk, muh, mulo = crt.mod_arrays(idx)
            t_live = ntt.gather_tables(crt.ntt_tables, idx)
            R = len(auto_idxs)

            def body(carry, msg_g):  # msg_g [R, N] int64
                neg = msg_g < 0
                mag = jnp.where(neg, -msg_g, msg_g).astype(jnp.uint64)
                acc0 = acc1 = None
                for i in range(R):
                    r = modops.mod_u64(mag[i][None, :], qk, muh, mulo)
                    r = jnp.where(neg[i][None, :] & (r != jnp.uint64(0)),
                                  qk - r, r)
                    pn = ntt.fwd(r, t_live)
                    t0 = modops.barrett_mul_d(pn, ext0[i], qk, muh, mulo)
                    t1 = modops.barrett_mul_d(pn, ext1[i], qk, muh, mulo)
                    acc0 = t0 if acc0 is None else \
                        modops.add_mod(acc0, t0, qk)
                    acc1 = t1 if acc1 is None else \
                        modops.add_mod(acc1, t1, qk)
                o0 = P.mod_down(RnsPoly(acc0, level, num_p, True), crt)
                o1 = P.mod_down(RnsPoly(acc1, level, num_p, True), crt)
                return carry, (o0.data, o1.data)

            _, (out0, out1) = jax.lax.scan(body, None, msgs)
            return out0, out1

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    def rot_mac_groups_msgs_jit(self, ct: Ciphertext, rots: list,
                                msgs) -> list:
        """[sum_i rot(ct, rots[i]) * encode(msgs[g,i]) for g] with the
        plaintexts given as level-independent int64 messages [G, R, N]
        (dense; zero rows contribute exact zeros). One digit
        decompose/mod-up for all rotations, one mod-down per group, as
        a single jitted program per (rotation set, level, G).

        Rotation sets beyond ACE_TPU_MAX_BUNDLE_MSG (default 12) are
        chunked into separate programs whose mod-downed partials are
        summed — bounding transient HBM (R keyswitch exts live at once)
        and remote-compiler appetite at deep levels."""
        import os
        max_bundle = int(os.environ.get("ACE_TPU_MAX_BUNDLE_MSG", "12"))
        if len(rots) > max_bundle:
            outs = None
            for s in range(0, len(rots), max_bundle):
                part = self.rot_mac_groups_msgs_jit(
                    ct, rots[s:s + max_bundle], msgs[:, s:s + max_bundle])
                outs = part if outs is None else \
                    [self.add(a, b) for a, b in zip(outs, part)]
            return outs
        level = ct.level
        auto_idxs = []
        keys_b, keys_a = [], []
        for r in rots:
            if r == 0:
                auto_idxs.append(1)
                continue
            ai, key = self.keygen.rot_key(r)
            auto_idxs.append(ai)
            kb, ka = self._key_raw(key, level)
            keys_b.append(kb)
            keys_a.append(ka)
        G = int(msgs.shape[0])
        fn = self._get_jit(("rmgm", tuple(auto_idxs), G, level),
                           self._mk_rot_mac_groups_msgs,
                           tuple(auto_idxs), level)
        out0, out1 = fn(ct.c0.data, ct.c1.data, keys_b, keys_a, msgs)
        pl_scale = self.params.scaling_factor
        return [Ciphertext(
            RnsPoly(out0[g], level, 0, True),
            RnsPoly(out1[g], level, 0, True),
            ct.scaling_factor * pl_scale, ct.sf_degree + 1, ct.slots)
            for g in range(G)]

    def _lift_msgs(self, msg, idx):
        """int64 messages [..., N] -> canonical residues [..., LK, N] at
        the live limbs `idx` (in-trace; bit-exact _signed_to_rns)."""
        qk, muh, mulo = self.crt.mod_arrays(idx)
        neg = msg < 0
        mag = jnp.where(neg, -msg, msg).astype(jnp.uint64)
        r = modops.mod_u64(mag[..., None, :], qk, muh, mulo)
        return jnp.where(neg[..., None, :] & (r != jnp.uint64(0)),
                         qk - r, r)

    def _mk_bsgs_iter(self, baby_idxs: tuple, giant_idxs: tuple,
                      level: int):
        """One collapsed-FFT BSGS level as a single program, mirroring
        the reference's Rotate_iteration (ckks_bootstrap_context.c:
        1237-1383) EXACTLY — including its c0 bookkeeping: inner ext
        MACs keep c0 in the extended basis (the `first` accumulator);
        only each group's c1 is mod-downed before the giant rotation;
        ONE final mod-down per component. Bit-exact against the
        reference-binary bootstrap stage vectors (test_ref_bootstrap).

        baby_idxs[j]: automorphism index per baby rotation (1 = ext
        embed, Switch_key_ext). giant_idxs[i]: per giant step (1 = no
        rotation). msgs [b, g, N] int64; row g*i+j == num_rot is zero.

        Program size: the baby key-switch exts are a lax.scan over
        stacked keys + automorphism permutations, and the inner MACs a
        nested scan over (group, rotation) — so the module is O(D + b)
        regardless of g. The fully unrolled first cut (g=16 exts + 64
        plaintext lifts inline at bootstrap levels) sat in the remote
        compiler >11 min; this compiles like the conv bundles.
        """
        import jax
        from ace_tpu.ops import ntt
        crt = self.crt
        num_p = crt.num_p
        idx = list(range(level)) + [crt.num_q + j for j in range(num_p)]
        nb_pos = [j for j, ai in enumerate(baby_idxs) if ai != 1]
        perms_h = np.stack([crt.auto_order(baby_idxs[j])
                            for j in nb_pos]) if nb_pos else None

        def impl(c0, c1, baby_kb, baby_ka, giant_kb, giant_ka, msgs):
            cin0 = RnsPoly(c0, level, 0, True)
            cin1 = RnsPoly(c1, level, 0, True)
            q_live, _, _ = crt.mod_arrays(range(level))
            qk, muh, mulo = crt.mod_arrays(idx)
            t_live = ntt.gather_tables(crt.ntt_tables, idx)
            g = len(baby_idxs)
            lk = len(idx)
            n = cin0.degree
            ident0 = self._p_scale(cin0, True).data
            ident1 = self._p_scale(cin1, True).data
            ne0 = ne1 = None
            if nb_pos:
                digits = self._switch_key_digits(cin1)
                dig = jnp.stack([d.data for d in digits])  # [D, LK, N]
                D = dig.shape[0]
                c0p = self._p_scale(cin0).data

                def baby_body(carry, xs):
                    kb, ka, perm = xs  # [D, LKfull, N] x2, [N]
                    kbl = jnp.concatenate(
                        [kb[:, :level], kb[:, crt.num_q:]], axis=1)
                    kal = jnp.concatenate(
                        [ka[:, :level], ka[:, crt.num_q:]], axis=1)
                    e0 = e1 = None
                    for d in range(D):
                        t0 = modops.barrett_mul_d(dig[d], kbl[d],
                                                  qk, muh, mulo)
                        t1 = modops.barrett_mul_d(dig[d], kal[d],
                                                  qk, muh, mulo)
                        e0 = t0 if e0 is None else \
                            modops.add_mod(e0, t0, qk)
                        e1 = t1 if e1 is None else \
                            modops.add_mod(e1, t1, qk)
                    top = modops.add_mod(e0[:level], c0p, q_live)
                    e0 = jnp.concatenate([top, e0[level:]], axis=0)
                    return carry, (e0[:, perm], e1[:, perm])

                _, (ne0, ne1) = jax.lax.scan(
                    baby_body, None,
                    (baby_kb, baby_ka, jnp.asarray(perms_h)))
            ext0_rows, ext1_rows = [], []
            k = 0
            for ai in baby_idxs:
                if ai == 1:
                    ext0_rows.append(ident0)
                    ext1_rows.append(ident1)
                else:
                    ext0_rows.append(ne0[k])
                    ext1_rows.append(ne1[k])
                    k += 1
            ext0 = jnp.stack(ext0_rows)  # [g, LK, N]
            ext1 = jnp.stack(ext1_rows)

            def group_body(carry, msg_i):  # msg_i [g, N] int64
                def rot_body(acc, xs):
                    msg_j, e0j, e1j = xs
                    pn = ntt.fwd(self._lift_msgs(msg_j, idx), t_live)
                    a0 = modops.add_mod(
                        acc[0], modops.barrett_mul_d(pn, e0j, qk, muh,
                                                     mulo), qk)
                    a1 = modops.add_mod(
                        acc[1], modops.barrett_mul_d(pn, e1j, qk, muh,
                                                     mulo), qk)
                    return (a0, a1), None

                z = jnp.zeros((lk, n), dtype=jnp.uint64)
                (a0, a1), _ = jax.lax.scan(rot_body, (z, z),
                                           (msg_i, ext0, ext1))
                return carry, (a0, a1)

            _, (accs0, accs1) = jax.lax.scan(group_body, None, msgs)

            first = None      # ext c0 accumulator (never keyswitched)
            out0 = out1 = None
            gi = 0
            for i, gai in enumerate(giant_idxs):
                acc0 = RnsPoly(accs0[i], level, num_p, True)
                acc1 = RnsPoly(accs1[i], level, num_p, True)
                if i == 0:
                    first = acc0
                    out1 = acc1
                elif gai != 1:
                    c1q = P.mod_down(acc1, crt)
                    first = P.add(first,
                                  P.automorphism(acc0, gai, crt), crt)
                    gkey = SwitchKey(
                        [RnsPoly(d, crt.num_q, num_p, True)
                         for d in giant_kb[gi]],
                        [RnsPoly(d, crt.num_q, num_p, True)
                         for d in giant_ka[gi]])
                    gi += 1
                    dig_i = self._switch_key_digits(c1q)
                    e0, e1 = self._switch_key_ext(gkey, dig_i, level)
                    a0 = P.automorphism(e0, gai, crt)
                    a1 = P.automorphism(e1, gai, crt)
                    out0 = a0 if out0 is None else P.add(out0, a0, crt)
                    out1 = P.add(out1, a1, crt)
                else:
                    first = P.add(first, acc0, crt)
                    out1 = P.add(out1, acc1, crt)
            out0 = first if out0 is None else P.add(out0, first, crt)
            return (P.mod_down(out0, crt).data,
                    P.mod_down(out1, crt).data)

        from ace_tpu.utils.liftjit import lift_jit
        return lift_jit(impl)

    def bsgs_iter_jit(self, ct: Ciphertext, baby_rots: list,
                      giant_rots: list, msgs) -> Ciphertext:
        """Rotate_iteration as one jitted program (see _mk_bsgs_iter).
        msgs: [len(giant_rots), len(baby_rots), N] int64 messages."""
        level = ct.level
        n = self.params.degree
        baby_idxs, baby_kb, baby_ka = [], [], []
        for r in baby_rots:
            if r == 0:
                baby_idxs.append(1)
                continue
            ai, key = self.keygen.rot_key(r)
            baby_idxs.append(ai)
            kb, ka = self._key_raw(key, level)
            baby_kb.append(jnp.stack(kb))  # [D, LKfull, N]
            baby_ka.append(jnp.stack(ka))
        # baby keys ride the lax.scan as one stacked operand
        zero = jnp.zeros((0,), dtype=jnp.uint64)
        baby_kb = jnp.stack(baby_kb) if baby_kb else zero
        baby_ka = jnp.stack(baby_ka) if len(baby_ka) else zero
        giant_idxs, giant_kb, giant_ka = [], [], []
        for r in giant_rots:
            if r == 0:
                giant_idxs.append(1)
                continue
            ai, key = self.keygen.rot_key(r)
            giant_idxs.append(ai)
            kb, ka = self._key_raw(key, level)
            giant_kb.append(kb)
            giant_ka.append(ka)
        fn = self._get_jit(("bsgs", tuple(baby_idxs), tuple(giant_idxs),
                            level),
                           self._mk_bsgs_iter, tuple(baby_idxs),
                           tuple(giant_idxs), level)
        d0, d1 = fn(ct.c0.data, ct.c1.data, baby_kb, baby_ka,
                    giant_kb, giant_ka, msgs)
        return Ciphertext(RnsPoly(d0, level, 0, True),
                          RnsPoly(d1, level, 0, True),
                          ct.scaling_factor * self.params.scaling_factor,
                          ct.sf_degree + 1, ct.slots)

    def conjugate(self, a: Ciphertext) -> Ciphertext:
        """Conjugation = keyswitch + automorphism 2N-1: reuses the
        rotate jit bundle (one XLA program, not eager dispatch)."""
        auto_idx, key = self.keygen.conj_key()
        level = a.level
        fn = self._get_jit(("rot", auto_idx, level), self._mk_rotate,
                           auto_idx, level)
        kb, ka = self._key_raw(key, level)
        d0, d1 = fn(a.c0.data, a.c1.data, kb, ka)
        return Ciphertext(RnsPoly(d0, level, 0, True),
                          RnsPoly(d1, level, 0, True),
                          a.scaling_factor, a.sf_degree, a.slots)
