"""Canonicalize Mosaic (Pallas TPU) kernel serialization for the
persistent compilation cache.

jax's persistent-cache key strips debug info from the StableHLO module
(cache_key.py runs `strip-debuginfo`), but a Pallas kernel is embedded
as an OPAQUE serialized-bytecode string inside the tpu_custom_call
backend_config — and that serialized module carries `loc(...)`
attributes that include the USER CALL SITE of the trace (file:line of
whoever triggered lowering). Two lowerings of the *same* kernel from
different call sites therefore produce byte-different payloads, so the
whole program hashes to a different persistent-cache key.

This broke ahead-of-time precompilation wholesale: the AOT workers
(runtime/precompile.py `fn.lower(...)` line) and the live evaluator
(`fn(args)` call sites in ckks/evaluator.py) could never share an
executable, and every precompiled program recompiled at run time
(round-3 failure mode; the liftjit const-order fix addressed the other
half of it).

Fix: wrap jax's `_lower_mosaic_module_to_asm` to round-trip the Mosaic
module through its location-free textual form before serialization.
Locations are diagnostics-only for Mosaic, and the outer StableHLO
module keeps its own (which jax's cache key strips), so nothing is
lost — while the payload becomes a pure function of the kernel
computation.

Opt out with ACE_TPU_NO_MOSAIC_CANON=1.
"""

from __future__ import annotations

import os


def install() -> bool:
    """Install the canonicalizing wrapper. Returns True if active."""
    if os.environ.get("ACE_TPU_NO_MOSAIC_CANON", "") not in ("", "0"):
        return False
    try:
        import jax._src.tpu_custom_call as tcc
        from jax._src.lib.mlir import ir  # noqa: F401
    except Exception:  # pragma: no cover - jax layout drift
        return False
    orig = getattr(tcc, "_lower_mosaic_module_to_asm", None)
    if orig is None or getattr(orig, "_ace_tpu_canon", False):
        return orig is not None

    def canonized(module, **kw):
        try:
            from jax._src.lib.mlir import ir as _ir
            with module.context:
                # get_asm() default prints WITHOUT debug info -> all
                # loc(...) attributes drop; re-parse in the same context
                # (dialects already registered there).
                stripped = _ir.Module.parse(module.operation.get_asm())
            module = stripped
        except Exception:  # pragma: no cover - never block lowering
            pass
        return orig(module, **kw)

    canonized._ace_tpu_canon = True
    tcc._lower_mosaic_module_to_asm = canonized
    return True
