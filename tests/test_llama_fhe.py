"""Encrypted llama attention block vs plain oracle (beyond-reference:
the reference never lowers its llama graph to FHE)."""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ckks.encoder import Encoder
from ace_tpu.ckks.keygen import KeyGenerator
from ace_tpu.ckks.evaluator import Evaluator
from ace_tpu.models import llama_fhe as LF


SEQ, D = 4, 8  # fully packed at degree 64 (seq*d == N/2)


def _weights(rng, scale=0.35):
    return {
        "rms_weight": rng.uniform(0.6, 1.4, D),
        "wq": rng.standard_normal((D, D)) * scale,
        "wk": rng.standard_normal((D, D)) * scale,
        "wv": rng.standard_normal((D, D)) * scale,
    }


def test_plain_oracle_matches_graph_executor():
    """attention_plain == models.llama.run_plain on the same config."""
    from ace_tpu.models import llama as L
    g = L.build_attention_block(seq=SEQ, embed=D, n_heads=1, n_rep=1)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, SEQ, D))
    got = LF.attention_plain(x[0], g.weights, SEQ, D)
    want = np.asarray(L.run_plain(g, x)).reshape(SEQ, D)
    assert np.max(np.abs(got - want)) < 1e-9


@pytest.mark.slow
def test_encrypted_attention_block():
    params = CkksParams(degree=2 * SEQ * D, num_q=50, first_mod_size=60,
                        scaling_mod_size=50)
    enc = Encoder(params)
    kg = KeyGenerator(params, np.random.default_rng(7))
    ev = Evaluator(params, kg, enc)

    rng = np.random.default_rng(11)
    w = _weights(rng)
    x = rng.standard_normal((SEQ, D)) * 0.8
    want = LF.attention_plain(x, w, SEQ, D)

    # data-range contract (the relu_vr analog): certify the ranges the
    # approximations must cover, from the plain shadow
    ms = np.mean(x * x, axis=-1) + 1e-5
    y = x / np.sqrt(ms)[:, None] * np.asarray(w["rms_weight"])
    q = y @ w["wq"].T
    k = y @ w["wk"].T
    smax = float(np.max(np.abs(q @ k.T))) / np.sqrt(D) * 1.3 + 0.5
    den = np.exp((q @ k.T) / np.sqrt(D)).sum(-1)

    ct = ev.encrypt(enc.encode(x.reshape(-1).astype(np.complex128)))
    out = LF.encrypted_attention(
        ev, enc, ct, w, SEQ, D,
        ms_range=(float(ms.min()) * 0.7, float(ms.max()) * 1.4),
        score_bound=smax,
        den_range=(float(den.min()) * 0.7, float(den.max()) * 1.4))
    got = enc.decode(ev.decrypt(out)).real[:SEQ * D].reshape(SEQ, D)
    assert np.max(np.abs(got - want)) < 2e-2, (got[0], want[0])
