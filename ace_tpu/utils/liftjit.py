"""jit with closure constants lifted to runtime arguments.

The CKKS op bundles close over the CrtContext's precompute tables (NTT
twiddles, base-conversion hat matrices, automorphism index maps —
tens of MB at N=2^15, L=40). Plain `jax.jit` lowers closed-over arrays
as dense HLO literals, so every (op, level, rotation) program carried
its tables inline: ~100 MB StableHLO modules, minutes of remote AOT
compile each, and zero executable sharing between programs that differ
only in table VALUES (e.g. two rotation indices at the same level).

`jax.closure_convert` cannot do this hoisting: it lifts only *inexact*
(float/complex) constants — it exists for custom_vjp — and every CKKS
table is u32/u64. So we lift by hand: trace once with `make_jaxpr`,
device-put the jaxpr's consts, and jit an `eval_jaxpr` wrapper that
takes (args..., consts...) as runtime inputs. Results:
  - modules shrink ~1000x (tables become parameters),
  - the persistent compile cache dedupes by HLO hash, so all rotation
    indices at one (level, pattern) share ONE executable,
  - runtime cost is unchanged: the tables are device-resident arrays
    passed by reference.

The wrapper exposes `.lower(*abstract_args)` for AOT precompilation
(runtime/precompile.py workers duck-type on it like on a jit object).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

# ACE_TPU_TRACE=1: timestamped line per bundle dispatch (and another
# when the dispatch call returns) — the tool for localizing remote
# stalls: the last "dispatch" line without a matching "done" is the
# call the tunnel is sitting on.
_TRACE = os.environ.get("ACE_TPU_TRACE", "") not in ("", "0")
_seq = [0]


def _tr(msg: str) -> None:
    print(f"[trace {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def _eval_jaxpr():
    # jax.core.eval_jaxpr moved around across jax versions
    try:
        return jax.core.eval_jaxpr
    except AttributeError:  # pragma: no cover
        from jax._src.core import eval_jaxpr
        return eval_jaxpr


class LiftedJit:
    def __init__(self, fn):
        self._fn = fn
        self._jitted = None
        self._consts = None
        self._in_tree = None
        self._out_tree = None

    def _convert(self, args):
        closed, out_shape = jax.make_jaxpr(
            self._fn, return_shape=True)(*args)
        self._out_tree = jax.tree.structure(out_shape)
        _, self._in_tree = jax.tree.flatten(args)
        jaxpr = closed.jaxpr
        # Canonicalize the lifted-const argument order. The order of
        # `closed.consts` is trace-HISTORY-dependent: jax's global
        # small-constant caches make the first trace in a fresh process
        # collect consts in a different order than the same trace in a
        # warmed process. That permutes the wrapper's HLO parameter
        # list, so the SAME program hashes to a different persistent-
        # cache key in the precompile workers than in the live run —
        # every AOT-compiled program missed at run time (round-3 bug).
        # Fix: reorder consts by first use in the jaxpr body, which IS
        # identical across traces of the same function (the eqn list is
        # trace-deterministic), so the lowered module is bit-identical
        # in every process. No value-based dedup: reading const VALUES
        # would block on device->host fetches through the tunnel, and
        # trace-level id-dedup is already history-stable (verified:
        # fresh and warmed traces produce the same const count).
        pos_of = {id(v): i for i, v in enumerate(jaxpr.constvars)}
        try:
            lit = jax.core.Literal
        except AttributeError:  # moved across jax versions
            from jax.extend.core import Literal as lit
        order = []
        seen = set()

        def visit(v):
            if (not isinstance(v, lit) and id(v) in pos_of
                    and id(v) not in seen):
                seen.add(id(v))
                order.append(v)

        for eqn in jaxpr.eqns:
            for v in eqn.invars:
                visit(v)
        for v in jaxpr.outvars:
            visit(v)
        # consts unused by any eqn/outvar are DROPPED from the parameter
        # list (their values can't matter) and bound to zero placeholders
        # — keeping them would reintroduce the trace-history-dependent
        # constvars tail order this whole canonicalization removes

        slot_of = {id(v): i for i, v in enumerate(order)}
        # device-put once; shared tables reuse the same buffers
        uniq = [jnp.asarray(closed.consts[pos_of[id(v)]]) for v in order]
        binding = [slot_of.get(id(v), v.aval) for v in jaxpr.constvars]
        self._consts = uniq
        ev = _eval_jaxpr()
        out_tree = self._out_tree

        def conv(flat_args, consts):
            bound = [consts[b] if isinstance(b, int)
                     else jnp.zeros(b.shape, b.dtype) for b in binding]
            outs = ev(jaxpr, bound, *flat_args)
            return jax.tree.unflatten(out_tree, outs)

        self._jitted = jax.jit(conv)

    def __call__(self, *args):
        if not _TRACE:
            if self._jitted is None:
                self._convert(args)
            flat, tree = jax.tree.flatten(args)
            assert tree == self._in_tree, "argument structure changed"
            return self._jitted(flat, self._consts)
        _seq[0] += 1
        n = _seq[0]
        name = getattr(self._fn, "__qualname__",
                       getattr(self._fn, "__name__", "?"))
        fresh = self._jitted is None
        if fresh:
            t0 = time.perf_counter()
            _tr(f"#{n} trace {name}")
            self._convert(args)
            _tr(f"#{n} traced {name} ({time.perf_counter() - t0:.1f}s)")
        flat, tree = jax.tree.flatten(args)
        assert tree == self._in_tree, "argument structure changed"
        t0 = time.perf_counter()
        _tr(f"#{n} dispatch {name}"
            + (" [first: may compile]" if fresh else ""))
        out = self._jitted(flat, self._consts)
        _tr(f"#{n} done {name} ({time.perf_counter() - t0:.1f}s)")
        return out

    def lower(self, *args):
        """AOT lowering; `args` may be ShapeDtypeStructs."""
        if self._jitted is None:
            self._convert(args)
        flat, _ = jax.tree.flatten(args)
        return self._jitted.lower(flat, self._consts)


def lift_jit(fn) -> LiftedJit:
    return LiftedJit(fn)
