"""Direct unit tests for utils/liftjit.py (closure-constant lifting).

Every evaluator op bundle routes through LiftedJit, so a silent
mismatch here (const ordering, argument-tree drift, eval_jaxpr version
skew) would corrupt every CKKS op. These tests pin its contract
independently of the evaluator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ace_tpu.utils.liftjit import lift_jit


def test_golden_numeric_with_u64_consts():
    # u64 closure consts are exactly what jax.closure_convert can NOT
    # lift (it only lifts inexact dtypes) — the reason liftjit exists
    table = np.arange(17, dtype=np.uint64) * np.uint64(3)
    q = np.uint64(2**61 - 1)

    def fn(x):
        return (x + jnp.asarray(table)) % q

    x = np.arange(17, dtype=np.uint64)
    got = np.asarray(lift_jit(fn)(x))
    np.testing.assert_array_equal(got, (x + table) % q)


def test_multiple_consts_ordering():
    # two consts of identical shape/dtype used asymmetrically: if the
    # lifted const order ever drifted from the jaxpr's constvar order,
    # this result flips sign
    a = np.full(8, 5.0)
    b = np.full(8, 2.0)

    def fn(x):
        return x * jnp.asarray(a) - jnp.asarray(b)

    x = np.arange(8, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(lift_jit(fn)(x)), x * 5.0 - 2.0)


def test_pytree_args_and_outputs():
    t = np.arange(4, dtype=np.uint64)

    def fn(pair, scale):
        (x, y) = pair
        return {"s": x + y + jnp.asarray(t), "d": x - scale}

    f = lift_jit(fn)
    x = np.arange(4, dtype=np.uint64)
    y = np.ones(4, dtype=np.uint64)
    out = f((x, y), np.uint64(1))
    np.testing.assert_array_equal(np.asarray(out["s"]), x + y + t)
    np.testing.assert_array_equal(np.asarray(out["d"]), x - 1)
    # second call reuses the converted jaxpr (no retrace)
    out2 = f((y, x), np.uint64(0))
    np.testing.assert_array_equal(np.asarray(out2["d"]), y)


def test_changed_arg_structure_asserts():
    def fn(args):
        return sum(args)

    f = lift_jit(fn)
    f([np.float64(1.0), np.float64(2.0)])
    with pytest.raises(AssertionError, match="argument structure"):
        f([np.float64(1.0), np.float64(2.0), np.float64(3.0)])


def test_lower_with_abstract_args():
    table = np.arange(8, dtype=np.uint64)

    def fn(x):
        return x ^ jnp.asarray(table)

    f = lift_jit(fn)
    lowered = f.lower(jax.ShapeDtypeStruct((8,), np.uint64))
    assert lowered is not None
    compiled = lowered.compile()
    # the lifted consts are runtime parameters, not HLO literals: the
    # module text must not embed the table values densely
    x = np.full(8, 255, dtype=np.uint64)
    got = np.asarray(f(x))
    np.testing.assert_array_equal(got, x ^ table)


def test_consts_are_parameters_not_literals():
    # a big (1 MB) u64 table must not appear in the lowered HLO text —
    # that is the whole point (module shrink + executable dedup)
    table = np.arange(1 << 17, dtype=np.uint64)

    def fn(x):
        return x + jnp.asarray(table)

    f = lift_jit(fn)
    txt = f.lower(
        jax.ShapeDtypeStruct(((1 << 17),), np.uint64)).as_text()
    assert len(txt) < 200_000, \
        f"HLO embeds the table as a literal ({len(txt)} chars)"


def test_const_order_is_history_independent():
    # Round-3 regression: make_jaxpr collects closure consts in a
    # trace-HISTORY-dependent order (jax's global small-constant caches
    # reorder them between a fresh and a warmed process), which used to
    # permute the wrapper's HLO parameters and change its persistent-
    # cache key — AOT-precompiled programs missed at run time. liftjit
    # now reorders consts by first use in the jaxpr body, so the same
    # builder lowers to bit-identical HLO no matter what was traced
    # before it in the process. Simulate "histories" by warming jax's
    # caches with unrelated traces between two conversions.
    def mk():
        big = np.arange(4096, dtype=np.uint64)

        def fn(x):
            y = (x + jnp.asarray(big)) % jnp.uint64(97)
            y = jnp.roll(y, 3) ^ (y >> jnp.uint64(2))
            return y + jnp.asarray(np.uint64(5))
        return fn

    s = jax.ShapeDtypeStruct((4096,), np.uint64)
    t1 = lift_jit(mk()).lower(s).as_text()
    # unrelated traces to perturb jax's global constant caches
    jax.make_jaxpr(lambda x: jnp.roll(x, 3) + jnp.uint64(5))(
        jnp.zeros(16, jnp.uint64))
    jax.make_jaxpr(lambda x: (x >> jnp.uint64(2)) % jnp.uint64(97))(
        jnp.zeros(16, jnp.uint64))
    t2 = lift_jit(mk()).lower(s).as_text()
    assert t1 == t2


def test_executable_dedup_across_const_values():
    # two instances differing ONLY in const values produce identical
    # HLO text -> one persistent-cache executable (rotation-index dedup)
    def mk(tbl):
        def fn(x):
            return x[jnp.asarray(tbl)]
        return fn

    perm1 = np.random.default_rng(0).permutation(64)
    perm2 = np.random.default_rng(1).permutation(64)
    s = jax.ShapeDtypeStruct((64,), np.float64)
    t1 = lift_jit(mk(perm1)).lower(s).as_text()
    t2 = lift_jit(mk(perm2)).lower(s).as_text()
    assert t1 == t2
