"""SPMD keyswitch over the ('digit','slot') mesh: digit-MAC psum +
slot-sharded NTT all_to_alls, bit-exact vs the single-device rotate."""

import numpy as np
import pytest
import jax

from ace_tpu.ckks.params import CkksParams
from ace_tpu.parallel.spmd import SpmdKeySwitch, make_digit_slot_mesh
from ace_tpu.runtime.context import FheContext


@pytest.mark.parametrize("degree,num_q,parts,slot", [
    (1 << 10, 6, 2, 4),
    (1 << 12, 8, 2, 2),
])
def test_spmd_rotate_bit_exact(degree, num_q, parts, slot):
    if len(jax.devices()) < parts * slot:
        pytest.skip("needs virtual device mesh")
    params = CkksParams(degree=degree, num_q=num_q, first_mod_size=60,
                        scaling_mod_size=56, hamming_weight=16,
                        num_q_parts=parts)
    ctx = FheContext(params, seed=11)
    msg = np.linspace(-1, 1, degree // 2)
    ct = ctx.prepare_input(msg, "x")

    mesh = make_digit_slot_mesh(parts, slot)
    ksw = SpmdKeySwitch(params, ct.level, mesh)
    got = ksw.rotate(ct, 5, ctx.keygen)
    want = ctx.evaluator.rotate(ct, 5)

    assert np.array_equal(np.asarray(jax.device_get(got.c0.data)),
                          np.asarray(jax.device_get(want.c0.data)))
    assert np.array_equal(np.asarray(jax.device_get(got.c1.data)),
                          np.asarray(jax.device_get(want.c1.data)))
    # and it decrypts to the rotated message
    ctx.set_output_data("y", got)
    out = ctx.handle_output("y", degree // 2)
    assert np.allclose(out, np.roll(msg, -5), atol=1e-2)


def test_spmd_rotate_short_last_digit():
    """level not divisible by per_part_size exercises the clamped
    window + offset masking path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual device mesh")
    params = CkksParams(degree=1 << 10, num_q=7, first_mod_size=60,
                        scaling_mod_size=56, hamming_weight=16,
                        num_q_parts=2)
    ctx = FheContext(params, seed=12)
    msg = np.arange(512) / 512.0
    ct = ctx.prepare_input(msg, "x")
    # drop one limb so the last digit is short at the live level
    ct = ctx.evaluator.mod_switch(ct) if hasattr(
        ctx.evaluator, "mod_switch") else ct
    level = ct.level
    crt = params.crt
    mesh = make_digit_slot_mesh(crt.num_decomp(level), 4)
    ksw = SpmdKeySwitch(params, level, mesh)
    got = ksw.rotate(ct, 3, ctx.keygen)
    want = ctx.evaluator.rotate(ct, 3)
    assert np.array_equal(np.asarray(jax.device_get(got.c0.data)),
                          np.asarray(jax.device_get(want.c0.data)))
    assert np.array_equal(np.asarray(jax.device_get(got.c1.data)),
                          np.asarray(jax.device_get(want.c1.data)))
