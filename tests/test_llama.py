"""LLaMA attention-block graph parity (nn-addon/llama analog):
graph structure matches the reference's op sequence, and the plain
executor computes real attention."""

import numpy as np

from ace_tpu.models import llama


def test_block_structure_matches_reference():
    g = llama.build_attention_block(seq=4, embed=64, n_heads=8)
    kinds = [op.op_type for op in g.ops]
    # llama.cxx:20-54 sequence
    assert kinds == ["Rmsnorm", "Matmul", "Matmul", "Matmul",
                     "RopeRotary", "ReshapeKv", "RepeatKv", "RepeatKv",
                     "Transpose", "Matmul", "Sqrt", "Divide", "Softmax",
                     "Matmul", "Transpose"]
    assert g.input_shape == (1, 4, 64)


def test_plain_attention_is_correct():
    seq, embed, heads = 4, 64, 8
    hd = embed // heads
    g = llama.build_attention_block(seq=seq, embed=embed, n_heads=heads)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, seq, embed))
    out = llama.run_plain(g, x)
    assert out.shape == (1, seq, heads, hd)
    assert np.isfinite(out).all()

    # independent attention computation from the same weights
    w = {k: np.asarray(v, np.float64) for k, v in g.weights.items()}
    v_ = x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + 1e-5)
    rms = v_ * w["rms_weight"]
    q = rms @ w["wq"].T
    k = rms @ w["wk"].T
    v = rms @ w["wv"].T

    def rope(t):
        freqs = w["rope_freqs"]
        ang = np.outer(np.arange(seq), 1.0 / (10000.0 ** (2 * freqs / hd)))
        th = t.reshape(1, seq, heads, hd)
        tr, ti = th[..., 0::2], th[..., 1::2]
        c, s = np.cos(ang), np.sin(ang)
        out = np.empty_like(th)
        out[..., 0::2] = tr * c[None, :, None, :] - ti * s[None, :, None, :]
        out[..., 1::2] = tr * s[None, :, None, :] + ti * c[None, :, None, :]
        return out.reshape(t.shape)

    def heads_of(t):
        return t.reshape(1, seq, heads, hd).transpose(0, 2, 1, 3)

    qh = heads_of(rope(q))
    kh = heads_of(rope(k))
    vh = heads_of(v)
    scores = (qh @ kh.transpose(0, 1, 3, 2)) / np.sqrt(hd)
    e = np.exp(scores - scores.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    want = (probs @ vh).transpose(0, 2, 1, 3)
    assert np.allclose(out, want, atol=1e-9), np.abs(out - want).max()
