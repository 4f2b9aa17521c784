"""ace_tpu — a TPU-native CKKS FHE evaluation framework.

A from-scratch re-design of the capabilities of the ACE FHE compiler
(ace-compiler/ace-compiler): ONNX neural networks compiled to encrypted
inference under RNS-CKKS — but with every runtime layer built as
JAX/XLA/Pallas programs instead of generated C on CPUs.

Layering (bottom-up):
  ops/        exact modular arithmetic + negacyclic NTT device kernels
  poly/       RNS polynomial layer (CRT context, mod-up/down, rescale, ...)
  ckks/       scheme layer (params, encoder, keygen, encrypt, evaluator,
              bootstrap)
  compiler/   ONNX -> slot-packed FHE program (metakernel lowering,
              scale management, parameter selection)
  models/     model zoo graph builders (ResNet-20/32/44/56/110 CIFAR)
  parallel/   device-mesh sharding of limb/slot axes (shard_map rules)
  runtime/    execution contexts, weight management, timing/reporting

All device integer math is exact: polynomials are RNS residue arrays of
dtype uint64 ([num_limbs, N]); every kernel produces canonical residues
in [0, q) so results are bit-identical to the reference CPU runtime
(fhe-cmplr/rtlib/ant) at identical moduli chains.
"""

import os

import jax

# Exact 64-bit integer arithmetic everywhere (verified bit-exact on TPU,
# where XLA emulates u64 ops over u32 pairs). Must happen before any
# jax.numpy usage in the package.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: CKKS programs compile one XLA executable
# per (op, level) pair; caching them on disk makes every run after the
# first start instantly. The default lives inside the repo work tree but
# is GITIGNORED (compiled binaries are machine-specific; committing them
# bloats history and risks SIGILL on other hosts). Warm it with
# ace_tpu.runtime.precompile workers. Override dir with
# ACE_TPU_CACHE_DIR, disable with ACE_TPU_CACHE_DIR="".
_cache_dir = os.environ.get(
    "ACE_TPU_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".xla_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Pallas kernels must serialize location-free or the persistent cache
# keys depend on the trace call site (see utils/mosaic_canon.py).
from ace_tpu.utils import mosaic_canon as _mosaic_canon

_mosaic_canon.install()

__version__ = "0.1.0"
