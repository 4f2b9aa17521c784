"""Checkpoint/resume of the op-stream runner (runtime/ckpt.py).

The CKKS level trajectory is static, so persisting the live env after
op K and restarting at K+1 must be exact. Verified on a tiny chain:
the resumed run's output bit-matches the uninterrupted run."""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.compiler.onnx_front import NNGraph, NNOp
from ace_tpu.compiler.lowering import GraphRunner
from ace_tpu.compiler import packing as pk
from ace_tpu.runtime.context import FheContext
from ace_tpu.runtime import ckpt


def _tiny_graph():
    # x -> Mul(c) -> residual Add(x, .) : the Add reads a value produced
    # two ops earlier, so resume must restore more than the last output
    shape = (1, 1, 2, 4)
    ops = [
        NNOp("Mul", "m1", ["input", "c"], ["t1"], {}, shape, shape),
        NNOp("Mul", "m2", ["t1", "c"], ["t2"], {}, shape, shape),
        NNOp("Add", "a1", ["t2", "t1"], ["out"], {}, shape, shape),
    ]
    w = {"c": np.full(shape, 0.5)}
    return NNGraph(ops, w, "input", shape, "out")


def test_ckpt_roundtrip_and_resume(tmp_path):
    p = CkksParams(degree=32, num_q=6, first_mod_size=33,
                   scaling_mod_size=30)
    ctx = FheContext(params=p)
    g = _tiny_graph()
    be = pk.FheBackend(ctx.evaluator, ctx.encoder)
    img = np.arange(8) * 0.1 - 0.3

    def fresh_input():
        ctx.prepare_input(img.reshape(1, 1, 2, 4), "input")
        return ctx.get_input_data("input")

    # uninterrupted run
    runner = GraphRunner(g, be)
    out_full = runner.run(fresh_input())
    ctx.set_output_data("o", out_full)
    ref = ctx.handle_output("o", 8)

    # run op 1, checkpoint, then "crash" and resume ops 2-3
    ck = str(tmp_path / "ck.npz")
    x = fresh_input()
    env = {g.input_name: x}
    out = None
    runner2 = GraphRunner(g, be)
    # simulate interruption by truncating the op list after op 1
    g1 = NNGraph(g.ops[:1], g.weights, g.input_name, g.input_shape,
                 g.ops[0].outputs[0])
    r1 = GraphRunner(g1, be)
    mid = r1.run(x, checkpoint=ck)
    # the checkpoint after op 1 holds t1 AND input is dropped (dead);
    # patch next_op for the full graph resume
    env2, nop = ckpt.load(ck)
    assert nop == 1 and "t1" in env2
    out_res = runner2.run(x, checkpoint=ck)
    ctx.set_output_data("o2", out_res)
    got = ctx.handle_output("o2", 8)
    # same ciphertext ops on the same saved state -> bit-identical
    np.testing.assert_array_equal(np.asarray(out_res.c0.data),
                                  np.asarray(runner.run(x).c0.data))
    np.testing.assert_allclose(got, img * 0.25 + img * 0.5, atol=1e-3)
    # ref used an independent encryption -> differs by CKKS noise only
    np.testing.assert_allclose(ref, got, atol=1e-6)
