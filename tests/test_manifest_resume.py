"""Manifest round-trip: compile artifacts -> FheContext.from_manifest.

The reference analog: poly2c emits Get_context_params into the
generated program and Prepare_context consumes it in a fresh process
(eg_fhertlib_add.inc:15-24, rtlib context.c:29-86). Here the manifest
JSON + weight file play that role; this test proves they are actually
consumable across processes (driver writes, a fresh context reads)."""

import json
import os

import numpy as np
import pytest

from ace_tpu.compiler.scheme_info import SchemeConfig
from ace_tpu.driver import compile_model_artifacts


ONNX = "/root/reference/model/resnet20_cifar10_pre.onnx"


@pytest.mark.skipif(not os.path.exists(ONNX), reason="no reference model")
def test_manifest_roundtrip(tmp_path):
    man = tmp_path / "m.json"
    wf = tmp_path / "w.msg"
    cfg = SchemeConfig(security_level=0, hamming_weight=192,
                       first_mod_size=60, scaling_mod_size=56,
                       use_bootstrap=True)
    m = compile_model_artifacts(ONNX, cfg, weights_path=str(wf),
                                manifest_path=str(man))
    assert m["rotate_indices"]

    # a *tiny* context is enough to prove consumability: shrink the
    # chain so key generation is fast on CPU
    data = json.load(open(man))
    data["scheme"]["poly_degree"] = 1 << 10
    data["scheme"]["mul_level"] = 3
    data["scheme"]["q_part_num"] = 2
    data["scheme"]["rotate_indices"] = data["rotate_indices"][:4]
    data["rotate_indices"] = data["rotate_indices"][:4]
    json.dump(data, open(man, "w"))

    from ace_tpu.runtime.context import FheContext
    ctx = FheContext.from_manifest(str(man), max_rot_keys=4)
    assert ctx.params.degree == 1 << 10
    assert ctx.params.num_q == 4
    # weight file opened and readable
    assert ctx.pt_mgr is not None
    rd = ctx.pt_mgr.reader
    name = min(rd.by_name,  # smallest entry fits the tiny slot count
               key=lambda n: rd.entries[rd.by_name[n]]["nbytes"])
    pt = ctx.pt_mgr.get(name, level=2)
    assert pt.poly.num_q == 2
    # rotation LRU pre-warmed from the manifest inventory (zeros are
    # skipped and distinct rotations can share an automorphism index)
    assert 1 <= len(ctx.keygen._rot_keys) <= 4
    # and the context actually evaluates
    msg = np.zeros(ctx.params.degree // 2)
    msg[:8] = np.arange(8) * 0.1
    ct = ctx.prepare_input(msg, "input")
    out = ctx.evaluator.rotate(ctx.get_input_data("input"),
                               int(data["rotate_indices"][0]) or 1)
    ctx.set_output_data("output", out)
    dec = ctx.handle_output("output", 8)
    k = int(data["rotate_indices"][0]) or 1
    want = np.roll(msg, -k)[:8]
    np.testing.assert_allclose(dec, want, atol=1e-3)
