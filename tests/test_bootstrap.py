"""Bootstrap correctness: encrypt at a low level, bootstrap, decode —
message must be preserved and levels regained (mirrors
ut_ckks_bootstrap.cxx's strategy at tiny degree)."""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ckks.encoder import Encoder
from ace_tpu.ckks.keygen import KeyGenerator
from ace_tpu.ckks.evaluator import Evaluator
from ace_tpu.ckks.bootstrap import BootstrapContext


@pytest.fixture(scope="module")
def ctx():
    params = CkksParams(degree=64, num_q=21, first_mod_size=60,
                        scaling_mod_size=56, hamming_weight=32)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(31))
    ev = Evaluator(params, kg, enc)
    return params, enc, kg, ev


def test_fft_params_budget3():
    from ace_tpu.ckks import bootstrap as B
    p = B.fft_params(32, 3)
    assert p["level_budget"] == 3 and p["layers_coll"] == 2
    assert p["rem_coll"] == 1 and p["num_rot"] == 7


@pytest.mark.slow
def test_bootstrap_fully_packed(ctx):
    params, enc, kg, ev = ctx
    rng = np.random.default_rng(4)
    msg = rng.uniform(-0.7, 0.7, 32).astype(np.complex128)
    # encrypt at the lowest usable level
    ct = ev.encrypt(enc.encode(msg, level=2))
    assert ct.level == 2
    bts = BootstrapContext(ev)
    out = bts.bootstrap(ct)
    assert out.level > ct.level + 2, f"no levels gained: {out.level}"
    got = enc.decode(ev.decrypt(out)).real
    assert np.max(np.abs(got - msg.real)) < 2e-2, \
        (got[:6], msg.real[:6])
