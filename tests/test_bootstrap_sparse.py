"""Sparse-packing bootstrap through the BSGS transform path.

The reference supports sparse bootstrap (slots < N/2,
ckks_bootstrap_context.c:1677 branch) with the same BSGS rotation
structure as the fully-packed path. This exercises `_bsgs_level` with
slots-periodic ciphertexts: ring rotations compose modulo `slots`, so
the giant-step decomposition must reproduce the direct per-diagonal
rotation result.
"""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ckks.encoder import Encoder
from ace_tpu.ckks.keygen import KeyGenerator
from ace_tpu.ckks.evaluator import Evaluator
from ace_tpu.ckks.bootstrap import BootstrapContext, fft_params


@pytest.fixture(scope="module")
def ctx():
    params = CkksParams(degree=64, num_q=21, first_mod_size=60,
                        scaling_mod_size=56, hamming_weight=32)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(77))
    ev = Evaluator(params, kg, enc)
    return params, enc, kg, ev


def test_sparse_fft_params_trigger_bsgs():
    # slots=8 budget=3 must produce a level where BSGS actually runs
    # (g > 1 and num_rot > g) so this suite covers the giant-step path
    p = fft_params(8, 3)
    assert p["g"] > 1 and p["num_rot"] > p["g"], p


@pytest.mark.slow
def test_bootstrap_sparse_slots(ctx):
    params, enc, kg, ev = ctx
    rng = np.random.default_rng(5)
    slots = 8  # sparse: degree//2 == 32
    msg = rng.uniform(-0.7, 0.7, slots).astype(np.complex128)
    ct = ev.encrypt(enc.encode(msg, level=2, slots=slots))
    assert ct.level == 2
    bts = BootstrapContext(ev, slots=slots)
    out = bts.bootstrap(ct)
    assert out.level > ct.level + 2, f"no levels gained: {out.level}"
    got = enc.decode(ev.decrypt(out)).real[:slots]
    assert np.max(np.abs(got - msg.real)) < 2e-2, (got, msg.real)
