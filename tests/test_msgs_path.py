"""Message-form plaintext path (rot_mac_groups_msgs_jit).

The scan-over-groups bundle with in-program RNS lift + NTT must be
BIT-EXACT against the unrolled per-level-plaintext bundle
(rot_ext_mac_groups_jit): both implement the reference's hoisted
mod-up/mod-down accumulation (ut_ksw_opt.cxx:349-375) over identical
integer arithmetic; only program structure differs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ckks.encoder import Encoder
from ace_tpu.ckks.keygen import KeyGenerator
from ace_tpu.ckks.evaluator import Evaluator

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def ctx():
    params = CkksParams(degree=16, num_q=4, first_mod_size=33,
                        scaling_mod_size=30)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(77))
    ev = Evaluator(params, kg, enc)
    return params, enc, kg, ev


def _old_path(ev, enc, ct, rots, weight_groups, n_slots):
    plain_groups = []
    for W in weight_groups:
        grp = []
        for w in W:
            if w is None or not np.any(w):
                grp.append(None)
            else:
                vec = np.zeros(n_slots, dtype=np.complex128)
                vec[:len(w)] = w
                grp.append(enc.encode_cached(
                    vec, level=ct.level, slots=n_slots, extended=True))
        plain_groups.append(grp)
    return ev.rot_ext_mac_groups_jit(ct, list(rots), plain_groups)


def _msg_path(ev, enc, ct, rots, weight_groups, n_slots):
    msgs = []
    for W in weight_groups:
        row = []
        for w in W:
            if w is None or not np.any(w):
                row.append(enc.zero_msg())
            else:
                vec = np.zeros(n_slots, dtype=np.complex128)
                vec[:len(w)] = w
                row.append(enc.encode_msg_cached(vec, slots=n_slots))
        msgs.append(jnp.stack(row))
    return ev.rot_mac_groups_msgs_jit(ct, list(rots), jnp.stack(msgs))


def _assert_ct_equal(a, b):
    assert a.level == b.level and a.sf_degree == b.sf_degree
    assert a.scaling_factor == b.scaling_factor
    np.testing.assert_array_equal(np.asarray(a.c0.data),
                                  np.asarray(b.c0.data))
    np.testing.assert_array_equal(np.asarray(a.c1.data),
                                  np.asarray(b.c1.data))


def test_msgs_matches_plaintext_path_bitexact(ctx):
    params, enc, kg, ev = ctx
    n_slots = params.degree // 2
    m = RNG.uniform(-1, 1, n_slots)
    ct = ev.encrypt(enc.encode(m.astype(np.complex128)))
    rots = [0, 1, 3]
    groups = [[RNG.uniform(-1, 1, n_slots) for _ in rots]
              for _ in range(3)]
    old = _old_path(ev, enc, ct, rots, groups, n_slots)
    new = _msg_path(ev, enc, ct, rots, groups, n_slots)
    assert len(old) == len(new) == 3
    for a, b in zip(new, old):
        _assert_ct_equal(a, b)


def test_msgs_zero_rows_and_groups(ctx):
    """Zero rows (dense zero messages) and an all-zero group must agree
    with the old path's dead-entry pruning, and the all-zero group must
    decode to ~0 at the right scale."""
    params, enc, kg, ev = ctx
    n_slots = params.degree // 2
    m = RNG.uniform(-1, 1, n_slots)
    ct = ev.encrypt(enc.encode(m.astype(np.complex128)))
    rots = [0, 2, 5]
    g0 = [RNG.uniform(-1, 1, n_slots), None, RNG.uniform(-1, 1, n_slots)]
    g1 = [None, None, None]  # all-zero group
    g2 = [None, RNG.uniform(-1, 1, n_slots), None]
    new = _msg_path(ev, enc, ct, rots, [g0, g1, g2], n_slots)
    # live groups agree with the old path run on live entries only
    old = _old_path(ev, enc, ct, rots, [g0, g2], n_slots)
    _assert_ct_equal(new[0], old[0])
    _assert_ct_equal(new[2], old[1])
    z = enc.decode(ev.decrypt(new[1])).real
    assert np.max(np.abs(z)) < 1e-2
    assert new[1].sf_degree == new[0].sf_degree


def test_msgs_chunking_bitexact(ctx, monkeypatch):
    """Chunked (R > ACE_TPU_MAX_BUNDLE_MSG) == unchunked: mod-downed
    partial sums commute exactly with the per-chunk accumulation."""
    params, enc, kg, ev = ctx
    n_slots = params.degree // 2
    m = RNG.uniform(-1, 1, n_slots)
    ct = ev.encrypt(enc.encode(m.astype(np.complex128)))
    rots = [0, 1, 2, 3, 5]
    groups = [[RNG.uniform(-1, 1, n_slots) for _ in rots]
              for _ in range(2)]
    whole = _msg_path(ev, enc, ct, rots, groups, n_slots)
    monkeypatch.setenv("ACE_TPU_MAX_BUNDLE_MSG", "2")
    chunked = _msg_path(ev, enc, ct, rots, groups, n_slots)
    # chunked sums mod-downed partials in Q: equal to the one-mod-down
    # result only within noise, but decode must agree tightly
    for a, b in zip(chunked, whole):
        ga = enc.decode(ev.decrypt(a)).real
        gb = enc.decode(ev.decrypt(b)).real
        assert np.allclose(ga, gb, atol=5e-3)


def test_encode_msg_matches_encode(ctx):
    """The device lift of encode_msg at (level, extended) reproduces
    encoder.encode residues bit-exactly (same _signed_to_rns + NTT)."""
    from ace_tpu.ops import modops, ntt
    params, enc, kg, ev = ctx
    crt = params.crt
    n = params.degree
    n_slots = n // 2
    vec = RNG.uniform(-1, 1, n_slots) + 1j * RNG.uniform(-1, 1, n_slots)
    level = 3
    want = enc.encode(vec, level=level, slots=n_slots, extended=True)
    msg = np.asarray(enc.encode_msg(vec, slots=n_slots))
    idx = list(range(level)) + [crt.num_q + j for j in range(crt.num_p)]
    qk, muh, mulo = crt.mod_arrays(idx)
    neg = msg < 0
    mag = jnp.asarray(np.abs(msg).astype(np.uint64))
    r = modops.mod_u64(mag[None, :], qk, muh, mulo)
    r = jnp.where(jnp.asarray(neg)[None, :] & (r != jnp.uint64(0)),
                  qk - r, r)
    got = ntt.fwd(r, ntt.gather_tables(crt.ntt_tables, idx))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want.poly.data))
