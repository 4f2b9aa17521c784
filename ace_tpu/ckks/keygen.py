"""CKKS key generation: secret/public/relin/rotation/conjugation keys.

Structure replicates the reference (fhe-cmplr/rtlib/ant/src/util/
ckks_key_generator.c): ternary secret with optional exact hamming weight,
pk = (-(a s)+e, a), and hybrid key-switching keys with one (b, a) pair
per digit: b = -a*old_key + P*Q~_part*new_key + e over the Q ∪ P basis
(Generate_switching_key, ckks_key_generator.c:127-197; rotation keys use
the inverse automorphism of the NTT secret and swap old/new for
rotate-after-keyswitch, :238-268).

Randomness: BLAKE2b counter-mode CSPRNG by default (the reference's
prng.c:13-40 posture; utils/csprng.py), deterministic when seeded;
tests may pass a seeded numpy Generator instead.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ops import modops
from ace_tpu.poly import poly as P
from ace_tpu.poly.poly import RnsPoly
from ace_tpu.utils import number_theory as nt


@dataclasses.dataclass
class SecretKey:
    coeffs: np.ndarray          # signed ternary, length N (host)
    ntt_sk: RnsPoly             # NTT form over Q ∪ P


@dataclasses.dataclass
class PublicKey:
    b: RnsPoly                  # pk0 = -(a s) + e
    a: RnsPoly                  # pk1


@dataclasses.dataclass
class SwitchKey:
    """One (b, a) pair per KSW digit, each over the full Q ∪ P basis."""
    b: list
    a: list

    @property
    def nbytes(self) -> int:
        """Actual device bytes held by this key (all digit pairs)."""
        return sum(int(p.data.size) * p.data.dtype.itemsize
                   for pair in (self.b, self.a) for p in pair)


def switch_key_nbytes(params: CkksParams) -> int:
    """Bytes of one hybrid switching key at these parameters, derived
    from the key structure (num_q_parts digits x (b, a) x (Q ∪ P) limbs
    x N u64) — the sizing input for the rotation-key LRU budget."""
    num_qp = params.num_q + params.crt.num_p
    return params.num_q_parts * 2 * num_qp * params.degree * 8


def _signed_to_rns(samples: np.ndarray, primes: list[int]) -> np.ndarray:
    """Small signed ints -> canonical residue rows per prime."""
    out = []
    for q in primes:
        v = samples.astype(np.int64).copy()
        v[v < 0] += q
        out.append(v.astype(np.uint64))
    return np.stack(out)


class KeyGenerator:
    def __init__(self, params: CkksParams, rng: np.random.Generator = None,
                 max_rot_keys: int = 0, mesh=None):
        """max_rot_keys: LRU capacity for rotation keys (0 = unbounded).
        A full ResNet needs ~227 rotation keys (ace_pre.log:28) at
        ~170 MB each at N=2^16 — beyond one chip's HBM. Evicted keys
        are regenerated on demand with fresh randomness (each switching
        key is an independent encryption of the rotated secret, so
        regeneration is semantically free)."""
        self.params = params
        self.crt = params.crt
        if rng is None:
            # default to the CSPRNG (prng.c:13-40); ACE_TPU_CSPRNG=0
            # falls back to numpy PCG64 for speed in throwaway contexts
            import os
            from ace_tpu.utils.csprng import Blake2Csprng
            rng = (np.random.default_rng()
                   if os.environ.get("ACE_TPU_CSPRNG") == "0"
                   else Blake2Csprng())
        self.rng = rng
        self.max_rot_keys = max_rot_keys
        self.mesh = mesh  # limb-sharded key residency when set
        self.sk = self._gen_secret_key()
        self.pk = self._gen_public_key()
        self.relin_key = self._gen_relin_key()
        self._rot_keys: dict[int, SwitchKey] = {}

    # -- sampling (random_sample.c:39-173) -------------------------------

    def _sample_ternary(self) -> np.ndarray:
        n = self.params.degree
        hw = self.params.hamming_weight
        if hw:
            s = np.zeros(n, dtype=np.int64)
            pos = self.rng.choice(n, size=hw, replace=False)
            s[pos] = self.rng.choice(np.array([-1, 1]), size=hw)
            return s
        return self.rng.integers(-1, 2, size=n).astype(np.int64)

    def _sample_triangle(self) -> np.ndarray:
        r = self.rng.integers(0, 4, size=self.params.degree)
        return np.where(r == 0, -1, np.where(r == 1, 1, 0)).astype(np.int64)

    def _sample_uniform_qp(self) -> RnsPoly:
        crt = self.crt
        rows = [self.rng.integers(0, q, dtype=np.uint64,
                                  size=self.params.degree)
                for q in crt.q_primes + crt.p_primes]
        # fresh uniform values interpreted directly as NTT form
        # (ckks_key_generator.c:159 "skip ntt convert")
        from ace_tpu.parallel.mesh import put_limb
        return RnsPoly(put_limb(np.stack(rows), self.mesh),
                       crt.num_q, crt.num_p, True)

    def _small_qp_poly(self, samples: np.ndarray, ntt: bool = True) -> RnsPoly:
        crt = self.crt
        from ace_tpu.parallel.mesh import put_limb
        data = _signed_to_rns(samples, crt.q_primes + crt.p_primes)
        p = RnsPoly(put_limb(data, self.mesh), crt.num_q, crt.num_p, False)
        return P.to_ntt(p, crt) if ntt else p

    # -- keys ------------------------------------------------------------

    def _gen_secret_key(self) -> SecretKey:
        s = self._sample_ternary()
        return SecretKey(s, self._small_qp_poly(s))

    def _gen_public_key(self) -> PublicKey:
        crt = self.crt
        a_full = self._sample_uniform_qp()
        # public key lives over Q only (ckks_key_generator.c:100)
        a = RnsPoly(a_full.data[:crt.num_q], crt.num_q, 0, True)
        sk_q = RnsPoly(self.sk.ntt_sk.data[:crt.num_q], crt.num_q, 0, True)
        e = self._small_qp_poly(self._sample_triangle())
        e_q = RnsPoly(e.data[:crt.num_q], crt.num_q, 0, True)
        b = P.add(P.neg(P.mul(a, sk_q, crt), crt), e_q, crt)
        return PublicKey(b, a)

    def _part_scalars(self, part: int) -> list:
        """P mod q_i inside the part, 0 on other q limbs and on P limbs
        (Scalars_integer_multiply_poly_qpart)."""
        crt = self.crt
        per = crt.per_part_size
        scalars = []
        for i, q in enumerate(crt.q_primes):
            in_part = per * part <= i < min(per * (part + 1), crt.num_q)
            scalars.append(crt.big_p % q if in_part else 0)
        scalars.extend(0 for _ in crt.p_primes)
        return scalars

    def _scaled_new_key(self, new_key: RnsPoly):
        """[parts, L+K, N] stack of P*Q~_part * new_key — constant
        across every rotation key (new_key is always the secret key),
        so computed once and cached by object identity."""
        cache = getattr(self, "_pk_new_cache", None)
        if cache is not None and cache[0] is new_key.data:
            return cache[1]
        import jax.numpy as jnp
        stack = jnp.stack([
            P.mul_scalars(new_key, self._part_scalars(p), self.crt).data
            for p in range(self.crt.num_q_parts)])
        self._pk_new_cache = (new_key.data, stack)
        return stack

    def _swk_fn(self):
        """One jitted XLA program for ALL switching-key math: sample
        the uniform component `a` ON DEVICE (threefry bits, 128-bit
        Barrett reduction per residue — bias <= 2^-77; `a` is a PUBLIC
        key component, so a PRF-seeded expansion is sound, cf. the
        seeded-`a` convention of RLWE schemes), then
        b[part] = NTT(e[part]) - a[part] * old + pk_new[part] over the
        full Q ∪ P basis.

        Device-side sampling is load-bearing on the tunnel backend:
        every host->device transfer leaks its host staging copy
        (measured ~size-of-array per transfer), and the former host
        path shipped ~70 MB per key — 1036 LRU regens OOM-killed the
        round-5 run at 123 GB host RSS. Only the secret error `e`
        ships from host now (int8 [parts, N], ~100 KB)."""
        fn = getattr(self, "_swk_fn_cache", None)
        if fn is None:
            crt = self.crt
            parts = crt.num_q_parts
            lk = crt.num_q + crt.num_p
            n = self.params.degree
            from ace_tpu.ops import ntt as ntt_ops
            from ace_tpu.ops import modops
            from ace_tpu.utils.liftjit import lift_jit
            import jax
            import jax.numpy as jnp
            tables = ntt_ops.gather_tables(crt.ntt_tables, range(lk))
            q, mu_hi, mu_lo = crt.mod_arrays(range(lk))

            def impl(rk, e_signed, old, pk_new):
                # rk: threefry key; e_signed: [parts, N] int8 in
                # {-1,0,1}; old: [L+K, N]; pk_new: [parts, L+K, N]
                bits = jax.random.bits(rk, (4, parts, lk, n),
                                       dtype=jnp.uint32)
                b64 = bits.astype(jnp.uint64)
                hi = (b64[0] << jnp.uint64(32)) | b64[1]
                lo = (b64[2] << jnp.uint64(32)) | b64[3]
                a = modops.barrett_reduce_128(
                    hi, lo, q[None], mu_hi[None], mu_lo[None])
                e = jnp.where(e_signed[:, None, :] == -1,
                              q[None] - jnp.uint64(1),
                              e_signed[:, None, :].astype(jnp.uint64))
                e = jnp.broadcast_to(e, (parts, lk, e.shape[-1]))
                e_ntt = jnp.stack([ntt_ops.fwd(e[i], tables)
                                   for i in range(parts)])
                t = modops.barrett_mul_d(a, old[None], q[None],
                                         mu_hi[None], mu_lo[None])
                b = modops.add_mod(modops.sub_mod(e_ntt, t, q[None]),
                                   pk_new, q[None])
                return b, a

            fn = lift_jit(impl)
            self._swk_fn_cache = fn
        return fn

    def _next_a_key(self):
        """Per-key threefry seed, derived deterministically from the
        CSPRNG seed stream at construction + a call counter."""
        import jax
        base = getattr(self, "_a_key_base", None)
        if base is None:
            seed = int(self.rng.integers(0, 2**31 - 1))
            base = jax.random.PRNGKey(seed)
            self._a_key_base = base
            self._a_ctr = 0
        self._a_ctr += 1
        return jax.random.fold_in(base, self._a_ctr)

    def _gen_switching_key(self, new_key: RnsPoly,
                           old_key: RnsPoly) -> SwitchKey:
        """b_part = -a*old_key + P*Q~_part*new_key + e (NTT over Q ∪ P)."""
        crt = self.crt
        import jax.numpy as jnp
        parts = crt.num_q_parts
        e_h = np.stack([self._sample_triangle() for _ in range(parts)])
        b, a = self._swk_fn()(self._next_a_key(),
                              jnp.asarray(e_h.astype(np.int8)),
                              old_key.data, self._scaled_new_key(new_key))
        if self.mesh is not None:
            # limb-sharded residency: reshard the computed key parts
            # (device-to-device; no host round-trip)
            from ace_tpu.parallel.mesh import put_limb
            b = put_limb(b, self.mesh)
            a = put_limb(a, self.mesh)
        bs = [RnsPoly(b[i], crt.num_q, crt.num_p, True)
              for i in range(parts)]
        As = [RnsPoly(a[i], crt.num_q, crt.num_p, True)
              for i in range(parts)]
        return SwitchKey(bs, As)

    def _gen_relin_key(self) -> SwitchKey:
        sk2 = P.mul(self.sk.ntt_sk, self.sk.ntt_sk, self.crt)
        return self._gen_switching_key(sk2, self.sk.ntt_sk)

    def rot_key(self, rotation: int) -> tuple[int, SwitchKey]:
        """Rotation key for slot-rotation `rotation`; returns (auto_idx,
        key). Key maps sigma_{k^-1}(s) -> s so rotation is applied after
        key-switching (ckks_key_generator.c:238-268, is_fast path).
        LRU-evicts + regenerates beyond max_rot_keys."""
        n = self.params.degree
        auto_idx = nt.find_automorphism_index(rotation, 2 * n)
        key = self._rot_keys.pop(auto_idx, None)
        if key is None:
            from ace_tpu.runtime.timing import TIMING
            from ace_tpu.utils import liftjit as _lj
            import time as _t
            _t0 = _t.perf_counter()
            with TIMING.tm("RTM_ROT_KEY_REGEN"):
                gen_idx = nt.mod_inv(auto_idx, 2 * n)
                rotated = P.automorphism(self.sk.ntt_sk, gen_idx, self.crt)
                key = self._gen_switching_key(self.sk.ntt_sk, rotated)
            if _lj._TRACE:
                _lj._tr(f"rot_key regen rot={rotation} "
                        f"({_t.perf_counter() - _t0:.2f}s, "
                        f"held={len(self._rot_keys)})")
            if self.max_rot_keys and len(self._rot_keys) >= self.max_rot_keys:
                evict = next(iter(self._rot_keys))
                del self._rot_keys[evict]
        self._rot_keys[auto_idx] = key  # (re)insert as most recent
        return auto_idx, key

    def all_keys(self) -> list[SwitchKey]:
        """Every evaluation key held (for the key-memory report,
        context.c:100-107)."""
        return [self.relin_key] + list(self._rot_keys.values())

    def conj_key(self) -> tuple[int, SwitchKey]:
        """Conjugation key (auto index 2N-1), held in the same LRU as
        rotation keys (touch on use, honor max_rot_keys)."""
        n = self.params.degree
        auto_idx = 2 * n - 1
        key = self._rot_keys.pop(auto_idx, None)
        if key is None:
            from ace_tpu.runtime.timing import TIMING
            with TIMING.tm("RTM_ROT_KEY_REGEN"):
                # 2N-1 is self-inverse mod 2N, so gen_idx == auto_idx
                rotated = P.automorphism(self.sk.ntt_sk, auto_idx, self.crt)
                key = self._gen_switching_key(self.sk.ntt_sk, rotated)
            if self.max_rot_keys and len(self._rot_keys) >= self.max_rot_keys:
                evict = next(iter(self._rot_keys))
                del self._rot_keys[evict]
        self._rot_keys[auto_idx] = key
        return auto_idx, key
