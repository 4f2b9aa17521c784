"""Multi-chip evaluator: the SAME jitted op bundles compile and run
SPMD when key/plaintext/ciphertext material enters limb-sharded
(parallel/mesh.put_limb), with XLA inserting the collectives
(SURVEY.md §5.8 — the NCCL-free design). Bit-exactness against the
unsharded evaluator is the contract."""

import numpy as np
import pytest
import jax

from ace_tpu.ckks.params import CkksParams
from ace_tpu.parallel.mesh import make_mesh
from ace_tpu.runtime.context import FheContext


def _ctx(mesh, degree=1 << 10, num_q=8):
    params = CkksParams(degree=degree, num_q=num_q, first_mod_size=60,
                        scaling_mod_size=56, hamming_weight=16,
                        num_q_parts=3)
    return FheContext(params, seed=7, mesh=mesh)


@pytest.fixture(scope="module")
def meshes():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    return None, make_mesh(1, 4)


def test_rotate_mul_rescale_bit_exact(meshes):
    """Full hybrid keyswitch (rotate), mul+relin, rescale: sharded run
    must be bit-identical to the unsharded one (same seed => same keys
    => same polynomials)."""
    plain_ctx, mesh = meshes
    msg = np.linspace(-1, 1, 512)

    outs = []
    for m in (None, mesh):
        ctx = _ctx(m)
        ct = ctx.prepare_input(msg, "x")
        r = ctx.evaluator.rotate(ct, 3)
        sq = ctx.evaluator.mul(r, r)
        rs = ctx.evaluator.rescale(sq)
        outs.append(np.asarray(jax.device_get(rs.c0.data)))
        ctx.set_output_data("y", rs)
        got = ctx.handle_output("y", 512)
        assert np.allclose(got, np.roll(msg, -3) ** 2, atol=1e-2)
    assert np.array_equal(outs[0], outs[1]), "sharded != unsharded"


def test_hoisted_mac_groups_sharded(meshes):
    _, mesh = meshes
    ctx = _ctx(mesh)
    from ace_tpu.compiler.packing import FheBackend
    msg = np.arange(512) / 512.0
    ct = ctx.prepare_input(msg, "x")
    be = FheBackend(ctx.evaluator, ctx.encoder)
    w = np.ones(512)
    outs = be.rot_ext_mac_groups(ct, [1, 2, 5], [[w, w, None]])
    ctx.set_output_data("y", be._norm(outs[0]))
    got = ctx.handle_output("y", 512)
    want = np.roll(msg, -1) + np.roll(msg, -2)
    assert np.allclose(got[:512], want, atol=1e-2)


@pytest.mark.slow
def test_bootstrap_sharded_bit_exact(meshes):
    """A full (sparse) bootstrap under the limb-sharded mesh matches
    the unsharded bootstrap bit-for-bit."""
    _, mesh = meshes
    msg = np.linspace(-0.4, 0.4, 64)
    outs = []
    for m in (None, mesh):
        params = CkksParams(degree=1 << 10, num_q=19, first_mod_size=60,
                            scaling_mod_size=56, hamming_weight=192,
                            num_q_parts=3)
        ctx = FheContext(params, seed=3, mesh=m)
        ct = ctx.prepare_input(msg, "x", level=2)
        ct = ctx.evaluator.rescale(ctx.evaluator.mul_const(ct, 1.0))
        out = ctx.bootstrap(ct)
        outs.append(np.asarray(jax.device_get(out.c0.data)))
        ctx.set_output_data("y", out)
        got = ctx.handle_output("y", 64)
        assert np.allclose(got, msg, atol=2e-2)
    assert np.array_equal(outs[0], outs[1])
