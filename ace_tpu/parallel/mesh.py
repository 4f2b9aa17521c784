"""Device-mesh sharding for CKKS evaluation.

Parallel axes of the FHE workload (SURVEY.md §5.7-5.8):
  - limb axis  (RNS primes): elementwise poly ops and per-limb NTTs are
    embarrassingly parallel — zero communication. Base conversions
    (mod-up/mod-down/rescale) contract over source limbs — XLA's SPMD
    partitioner turns our per-limb accumulation into all-gather/psum
    over ICI. This is the tensor-parallel analog.
  - batch axis (independent ciphertexts/images): pure data parallel.

We annotate with NamedSharding and let XLA insert collectives (no
hand-written NCCL-analog): mesh ('dp', 'limb'), ciphertext data
[..., L, N] sharded P(..., 'limb', None).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int = 1, n_limb: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_dp * n_limb
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    dev = np.asarray(devices[:need]).reshape(n_dp, n_limb)
    return Mesh(dev, ("dp", "limb"))


def limb_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Sharding for poly data: [L, N] or [B, L, N]."""
    if batched:
        return NamedSharding(mesh, P("dp", "limb", None))
    return NamedSharding(mesh, P(None, "limb", None)
                         if len(mesh.shape) > 2 else P("limb", None))


def shard_poly(mesh: Mesh, poly_data, batched: bool = False):
    return jax.device_put(poly_data, limb_sharding(mesh, batched))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_limb(data, mesh: Mesh | None):
    """device_put a [L, N] (or [..., L, N]) array with the limb axis
    sharded; no-op without a mesh. This is the single chokepoint that
    turns the whole evaluator SPMD: keys/plaintexts/fresh ciphertexts
    enter device memory limb-sharded, every jitted op bundle compiles
    under GSPMD with per-limb NTTs local and base-conversion
    contractions lowered to psum/all-gather over ICI (SURVEY.md 5.8).
    """
    if mesh is None:
        return jax.numpy.asarray(data)
    data = np.asarray(data) if not hasattr(data, "ndim") else data
    nd = data.ndim
    n_limb = mesh.shape["limb"]
    if nd >= 2 and data.shape[-2] % n_limb == 0:
        spec = P(*([None] * (nd - 2) + ["limb", None]))
    elif data.shape[-1] % n_limb == 0:
        # limb count not divisible (e.g. extended Q+P bases): shard the
        # coefficient axis instead — N is a power of two, always even;
        # GSPMD re-shards inside programs as profitable.
        spec = P(*([None] * (nd - 1) + ["limb"]))
    else:
        spec = P()
    return jax.device_put(data, NamedSharding(mesh, spec))
