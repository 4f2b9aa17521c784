"""Op-stream checkpoint/resume for long encrypted inferences.

The reference has no execution checkpointing (SURVEY.md §5.4 — its
only persisted intermediate state is compiler IR). On TPU the compile
wall makes a multi-hour first run realistic, so the runner can persist
its live environment after every op: the CKKS level trajectory is
static, so resuming at op K with the saved ciphertexts is exact.

Format: one .npz per checkpoint holding, per live value, the raw limb
planes of (c0, c1) plus scale metadata, and the next op index. Atomic
via write-to-temp + rename.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save(path: str, env: dict, next_op: int) -> None:
    from ace_tpu.ckks.cipher import Ciphertext
    arrays = {}
    meta = {"next_op": next_op, "values": {}}
    for name, ct in env.items():
        if not isinstance(ct, Ciphertext):
            raise TypeError(
                f"checkpoint supports plain Ciphertext envs only "
                f"(got {type(ct).__name__} for {name!r})")
        i = len(meta["values"])
        arrays[f"c0_{i}"] = np.asarray(ct.c0.data)
        arrays[f"c1_{i}"] = np.asarray(ct.c1.data)
        meta["values"][name] = {
            "i": i,
            "num_q": ct.c0.num_q, "num_p": ct.c0.num_p,
            "is_ntt": bool(ct.c0.is_ntt),
            "scaling_factor": float(ct.scaling_factor),
            "sf_degree": int(ct.sf_degree), "slots": int(ct.slots),
        }
    tmp = path + ".tmp.npz"
    np.savez(tmp, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def load(path: str):
    """Returns (env, next_op)."""
    import jax.numpy as jnp
    from ace_tpu.ckks.cipher import Ciphertext
    from ace_tpu.poly.poly import RnsPoly
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    env = {}
    for name, v in meta["values"].items():
        i = v["i"]
        c0 = RnsPoly(jnp.asarray(z[f"c0_{i}"]), v["num_q"], v["num_p"],
                     v["is_ntt"])
        c1 = RnsPoly(jnp.asarray(z[f"c1_{i}"]), v["num_q"], v["num_p"],
                     v["is_ntt"])
        env[name] = Ciphertext(c0, c1, v["scaling_factor"],
                               v["sf_degree"], v["slots"])
    return env, meta["next_op"]
