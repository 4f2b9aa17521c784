"""Device RNS polynomial ops on [num_limbs, N] uint64 arrays.

TPU-native re-design of the reference POLYNOMIAL layer
(fhe-cmplr/rtlib/ant/src/util/polynomial.c). A polynomial is a pytree
`RnsPoly` whose data rows are RNS limbs (q_0..q_{level-1}[, p_0..p_{K-1}]);
level / num_p / is_ntt are static so every distinct level compiles its own
fused XLA program (the FHE op stream has static shapes throughout).

Exact-semantics sources:
  add/sub/mul:        polynomial.c (elementwise per limb, canonical mod q)
  automorphism:       polynomial.c:299-360, number_theory.c:201-226
  fast base conv:     polynomial.c:755-846 (Shoup premul, 128-bit
                      accumulation, Barrett-128 reduction)
  decompose/mod-up:   polynomial.c:848-926 (digit extract + raise to
                      complement basis, NTT splice)
  mod-down:           polynomial.c:928-966 (P->Q conv, (x - conv) * P^-1)
  rescale:            polynomial.c:1097-1196 (NTT path: switch-modulus of
                      the dropped limb + per-limb correction)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ace_tpu.ops import modops, ntt
from ace_tpu.poly.rns import CrtContext


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RnsPoly:
    """RNS polynomial: data [num_q + num_p, N] uint64 canonical residues."""
    data: jnp.ndarray
    num_q: int
    num_p: int
    is_ntt: bool

    def tree_flatten(self):
        return (self.data,), (self.num_q, self.num_p, self.is_ntt)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def degree(self) -> int:
        return self.data.shape[-1]


def _limb_indices(p: RnsPoly, ctx: CrtContext) -> list[int]:
    return list(range(p.num_q)) + [ctx.num_q + j for j in range(p.num_p)]


def _mods(p: RnsPoly, ctx: CrtContext):
    return ctx.mod_arrays(_limb_indices(p, ctx))


def zeros_like(p: RnsPoly) -> RnsPoly:
    return RnsPoly(jnp.zeros_like(p.data), p.num_q, p.num_p, p.is_ntt)


def add(a: RnsPoly, b: RnsPoly, ctx: CrtContext) -> RnsPoly:
    assert a.num_q == b.num_q and a.num_p == b.num_p and a.is_ntt == b.is_ntt
    q, _, _ = _mods(a, ctx)
    return RnsPoly(modops.add_mod(a.data, b.data, q), a.num_q, a.num_p,
                   a.is_ntt)


def sub(a: RnsPoly, b: RnsPoly, ctx: CrtContext) -> RnsPoly:
    assert a.num_q == b.num_q and a.num_p == b.num_p and a.is_ntt == b.is_ntt
    q, _, _ = _mods(a, ctx)
    return RnsPoly(modops.sub_mod(a.data, b.data, q), a.num_q, a.num_p,
                   a.is_ntt)


def neg(a: RnsPoly, ctx: CrtContext) -> RnsPoly:
    q, _, _ = _mods(a, ctx)
    return RnsPoly(modops.neg_mod(a.data, q), a.num_q, a.num_p, a.is_ntt)


def mul(a: RnsPoly, b: RnsPoly, ctx: CrtContext) -> RnsPoly:
    """Pointwise product (NTT form = negacyclic polynomial product)."""
    assert a.is_ntt and b.is_ntt
    assert a.num_q == b.num_q and a.num_p == b.num_p
    q, mu_hi, mu_lo = _mods(a, ctx)
    return RnsPoly(modops.barrett_mul_d(a.data, b.data, q, mu_hi, mu_lo),
                   a.num_q, a.num_p, a.is_ntt)


def mac(acc: RnsPoly, a: RnsPoly, b: RnsPoly, ctx: CrtContext) -> RnsPoly:
    """acc + a*b (pointwise, NTT form)."""
    return add(acc, mul(a, b, ctx), ctx)


def mul_scalars(a: RnsPoly, scalars: list[int], ctx: CrtContext) -> RnsPoly:
    """Per-limb constant multiply with Shoup precompute."""
    idx = _limb_indices(a, ctx)
    qs = [ctx.all_primes[i] for i in idx]
    w = modops.np_u64([[s % q] for s, q in zip(scalars, qs)])
    w_prec = modops.np_u64(
        [[modops.precompute_shoup(s % q, q)] for s, q in zip(scalars, qs)])
    q, _, _ = _mods(a, ctx)
    return RnsPoly(modops.shoup_mul_d(a.data, jnp.asarray(w),
                                      jnp.asarray(w_prec), q),
                   a.num_q, a.num_p, a.is_ntt)


# ---------------------------------------------------------------------------
# NTT conversions
# ---------------------------------------------------------------------------

def to_ntt(a: RnsPoly, ctx: CrtContext) -> RnsPoly:
    assert not a.is_ntt
    t = ntt.gather_tables(ctx.ntt_tables, _limb_indices(a, ctx))
    return RnsPoly(ntt.fwd(a.data, t), a.num_q, a.num_p, True)


def from_ntt(a: RnsPoly, ctx: CrtContext) -> RnsPoly:
    assert a.is_ntt
    t = ntt.gather_tables(ctx.ntt_tables, _limb_indices(a, ctx))
    return RnsPoly(ntt.inv(a.data, t), a.num_q, a.num_p, False)


# ---------------------------------------------------------------------------
# Automorphism (rotation / conjugation)
# ---------------------------------------------------------------------------

def automorphism(a: RnsPoly, auto_idx: int, ctx: CrtContext) -> RnsPoly:
    """Galois automorphism x -> x^auto_idx.

    NTT form: pure slot permutation (number_theory.c:207-214). Coeff
    form: index permutation with sign flip, canonical residues
    (number_theory.c:216-224; we canonicalize -0 to 0 where the
    reference stores q, which never feeds decode in the cipher path).
    """
    n = a.degree
    if a.is_ntt:
        order = ctx.auto_order(auto_idx)
        return RnsPoly(a.data[:, order], a.num_q, a.num_p, True)
    m = 2 * n
    shift = (np.arange(n, dtype=np.int64) * auto_idx) % m
    dest = np.where(shift < n, shift, shift - n)
    negate_dest = shift >= n
    # build gather map: res[dest[j]] = ±a[j]
    gather = np.zeros(n, dtype=np.int64)
    gather[dest] = np.arange(n)
    negate = np.zeros(n, dtype=bool)
    negate[dest] = negate_dest
    q, _, _ = _mods(a, ctx)
    vals = a.data[:, gather]
    return RnsPoly(jnp.where(jnp.asarray(negate)[None, :],
                             modops.neg_mod(vals, q), vals),
                   a.num_q, a.num_p, False)


# ---------------------------------------------------------------------------
# Fast base conversion (the matrix-contraction core)
# ---------------------------------------------------------------------------

def _base_conv_data(old_data, old_qs: list[int], new_qs: list[int],
                    hat_inv: list[int], hat_mod_new):
    """Core of Fast_base_conv (polynomial.c:755-808), coefficient form.

    old_data: [O, N]; hat_inv[o] = (M/q_o)^-1 mod q_o;
    hat_mod_new[n][o] = (M/q_o) mod p_n.
    Returns [len(new_qs), N] canonical residues.
    """
    O = len(old_qs)
    old_q = jnp.asarray(modops.np_u64([[q] for q in old_qs]))
    inv = jnp.asarray(modops.np_u64([[v] for v in hat_inv]))
    inv_prec = jnp.asarray(modops.np_u64(
        [[modops.precompute_shoup(v, q)] for v, q in zip(hat_inv, old_qs)]))
    tmp = modops.shoup_mul(old_data, inv, inv_prec, old_q)  # [O, N]

    mat = modops.np_u64(hat_mod_new)  # [new, O]
    acc_hi = jnp.zeros((len(new_qs), old_data.shape[-1]), dtype=jnp.uint64)
    acc_lo = jnp.zeros_like(acc_hi)
    for o in range(O):
        w = jnp.asarray(mat[:, o][:, None])
        p_hi, p_lo = modops.mul_128(tmp[o][None, :], w)
        new_lo = acc_lo + p_lo
        carry = (new_lo < p_lo).astype(jnp.uint64)
        acc_hi = acc_hi + p_hi + carry
        acc_lo = new_lo
    new_q = jnp.asarray(modops.np_u64([[q] for q in new_qs]))
    mus = [modops.precompute_barrett128(q) for q in new_qs]
    mu_hi = jnp.asarray(modops.np_u64([[m[0]] for m in mus]))
    mu_lo = jnp.asarray(modops.np_u64([[m[1]] for m in mus]))
    return modops.barrett_reduce_128(acc_hi, acc_lo, new_q, mu_hi, mu_lo)


# ---------------------------------------------------------------------------
# Hybrid key-switching support: decompose, mod-up, mod-down
# ---------------------------------------------------------------------------

def decompose(a: RnsPoly, ctx: CrtContext, part_idx: int) -> RnsPoly:
    """Extract KSW digit `part_idx` (polynomial.c:848-884)."""
    num_decomp = ctx.num_decomp(a.num_q)
    per = ctx.per_part_size
    start = per * part_idx
    if part_idx == num_decomp - 1:
        length = a.num_q - start
    else:
        length = len(ctx.parts[part_idx])
    return RnsPoly(a.data[start:start + length], length, 0, a.is_ntt)


def mod_up(part: RnsPoly, ctx: CrtContext, num_q_live: int,
           part_idx: int) -> RnsPoly:
    """Raise digit to the full Q_level ∪ P basis (polynomial.c:877-926).

    part: the decomposed digit (level = digit size, num_p = 0).
    Result: [num_q_live + K, N] in the same NTT-ness as the input.
    """
    level = num_q_live - 1
    per = ctx.per_part_size
    start = per * part_idx
    sz = part.num_q
    part_qs = ctx.parts[part_idx][:sz]
    compl_idx = ctx.compl_indices[level][part_idx]
    compl_qs = [ctx.all_primes[g] for g in compl_idx]
    hat_inv = ctx.part_hat_inv_mod_q[part_idx][sz - 1]
    # part_hat_mod_compl[level][part][i][j] -> transpose to [compl][part_i]
    mat = ctx.part_hat_mod_compl[level][part_idx]
    mat_t = [[mat[i][j] for i in range(sz)] for j in range(len(compl_qs))]

    if part.is_ntt:
        part_tables = ntt.gather_tables(
            ctx.ntt_tables, [start + i for i in range(sz)])
        coeff_data = ntt.inv(part.data, part_tables)
    else:
        coeff_data = part.data
    ext = _base_conv_data(coeff_data, part_qs, compl_qs, hat_inv, mat_t)
    if part.is_ntt:
        compl_tables = ntt.gather_tables(ctx.ntt_tables, compl_idx)
        ext = ntt.fwd(ext, compl_tables)

    # splice: [ext[:start], original digit, ext[start:]]
    # (polynomial.c:916-922 — the digit's own limbs stay untouched)
    data = jnp.concatenate([ext[:start], part.data, ext[start:]], axis=0)
    return RnsPoly(data, num_q_live, ctx.num_p, part.is_ntt)


def mod_down(a: RnsPoly, ctx: CrtContext) -> RnsPoly:
    """Scale down by P: Q_level ∪ P -> Q_level (polynomial.c:928-966)."""
    assert a.num_p == ctx.num_p
    level = a.num_q
    n = a.degree
    p_part = a.data[level:]
    p_idx = [ctx.num_q + j for j in range(ctx.num_p)]
    if a.is_ntt:
        p_tables = ntt.gather_tables(ctx.ntt_tables, p_idx)
        p_part = ntt.inv(p_part, p_tables)
    q_list = ctx.q_primes[:level]
    conv = _base_conv_data(
        p_part, ctx.p_primes, q_list, ctx.p_hat_inv_mod_p,
        [row for row in ctx.p_hat_mod_q[:level]])
    if a.is_ntt:
        q_tables = ntt.gather_tables(ctx.ntt_tables, list(range(level)))
        conv = ntt.fwd(conv, q_tables)
    q, mu_hi, mu_lo = ctx.mod_arrays(range(level))
    diff = modops.sub_mod(a.data[:level], conv, q)
    p_inv = jnp.asarray(modops.np_u64(
        [[v] for v in ctx.p_inv_mod_q[:level]]))
    out = modops.barrett_mul_d(diff, p_inv, q, mu_hi, mu_lo)
    return RnsPoly(out, level, 0, a.is_ntt)


def switch_modulus_data(data, old_q: int, new_qs: list[int]):
    """Centered base switch of [1, N] residues mod old_q to each new
    modulus (fhe_utils.h:352-377 Switch_modulus), vectorized over the
    target limb axis. Returns [len(new_qs), N]."""
    half = jnp.uint64(old_q >> 1)
    diffs = []
    for qi in new_qs:
        if qi > old_q:
            diffs.append(qi - old_q)
        else:
            diffs.append(qi - (old_q % qi))
    diff = jnp.asarray(modops.np_u64([[d] for d in diffs]))
    new_q = jnp.asarray(modops.np_u64([[q] for q in new_qs]))
    sm = data + jnp.where(data > half, diff, jnp.uint64(0))
    return jnp.where(sm >= new_q, sm % new_q, sm)


def mod_raise(a: RnsPoly, ctx: CrtContext, target_level: int) -> RnsPoly:
    """Raise a level-1 coefficient-form poly to target_level limbs by
    centered lifting mod each q_i (Transform_values_from_level0,
    ckks_bootstrap_context.c:1527-1550)."""
    assert not a.is_ntt and a.num_q == 1 and a.num_p == 0
    q0 = ctx.q_primes[0]
    rest = switch_modulus_data(a.data[:1], q0,
                               ctx.q_primes[1:target_level])
    return RnsPoly(jnp.concatenate([a.data[:1], rest], axis=0),
                   target_level, 0, False)


# ---------------------------------------------------------------------------
# Rescale
# ---------------------------------------------------------------------------

def rescale(a: RnsPoly, ctx: CrtContext) -> RnsPoly:
    """Drop the last limb and divide by its prime (polynomial.c:1097-1176,
    NTT-form path)."""
    assert a.is_ntt and a.num_p == 0
    level = a.num_q
    assert level > 1
    n = a.degree
    qs = ctx.q_primes
    last_q = qs[level - 1]
    k = level - 2

    last_tables = ntt.gather_tables(ctx.ntt_tables, [level - 1])
    last = ntt.inv(a.data[level - 1:level], last_tables)  # [1, N]

    rem = level - 1
    rem_qs = qs[:rem]
    new_q = jnp.asarray(modops.np_u64([[q] for q in rem_qs]))
    # Switch_modulus (fhe_utils.h:352-377), vectorized over target limbs
    half = jnp.uint64(last_q >> 1)
    diffs = []
    for qi in rem_qs:
        if qi > last_q:
            diffs.append(qi - last_q)
        else:
            diffs.append(qi - (last_q % qi))
    diff = jnp.asarray(modops.np_u64([[d] for d in diffs]))
    sm = last + jnp.where(last > half, diff, jnp.uint64(0))
    sm = jnp.where(sm >= new_q, sm % new_q, sm)

    qlql = ctx.ql_ql_inv_mod_ql_div_ql_mod_qi[k]
    qlql_w = jnp.asarray(modops.np_u64([[v] for v in qlql]))
    qlql_prec = jnp.asarray(modops.np_u64(
        [[modops.precompute_shoup(v, q)] for v, q in zip(qlql, rem_qs)]))
    corr = modops.shoup_mul(sm, qlql_w, qlql_prec, new_q)
    rem_tables = ntt.gather_tables(ctx.ntt_tables, list(range(rem)))
    corr = ntt.fwd(corr, rem_tables)

    ql_inv = ctx.ql_inv_mod_qi[k]
    inv_w = jnp.asarray(modops.np_u64([[v] for v in ql_inv]))
    inv_prec = jnp.asarray(modops.np_u64(
        [[modops.precompute_shoup(v, q)] for v, q in zip(ql_inv, rem_qs)]))
    scaled = modops.shoup_mul_d(a.data[:rem], inv_w, inv_prec, new_q)
    return RnsPoly(modops.add_mod(scaled, corr, new_q), rem, 0, True)
