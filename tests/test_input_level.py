"""Input-level policy: encrypt at the first bootstrap segment's depth
(the ctx_param_ana input-level analog) and still match plain inference."""

import numpy as np
import pytest

from ace_tpu.compiler import level_sim
from ace_tpu.compiler.scheme_info import SchemeConfig, select_params


def test_segment_levels_resnet20():
    from ace_tpu.models import resnet as M
    g = M.load_model("resnet20_cifar10")
    segs = level_sim.segment_levels(g, 1 << 14, relu_mul_depth=13,
                                    relu_range_default=16.0)
    # one bootstrap per relu (19) -> 20 segments; conv1 consumes 1 level
    assert len(segs) == 20
    assert segs[0] == 1
    assert max(segs) == level_sim.required_levels(
        g, 1 << 14, relu_mul_depth=13, relu_range_default=16.0)


def test_select_params_sets_input_level():
    from ace_tpu.models import resnet as M
    g = M.load_model("resnet20_cifar10")
    cfg = SchemeConfig(security_level=0, hamming_weight=192,
                       first_mod_size=60, scaling_mod_size=56,
                       relu_mul_depth=13, relu_value_range=16.0,
                       use_bootstrap=True)
    info = select_params(g, cfg)
    assert info.input_level == 2
    assert info.input_level < info.mul_level


@pytest.mark.slow
def test_low_level_input_through_bootstrap():
    """Encrypt at level 2, burn one level, bootstrap, compare to plain —
    the exact shape of the pre-first-bootstrap segment."""
    from ace_tpu.ckks.params import CkksParams
    from ace_tpu.runtime.context import FheContext

    # bootstrap consumes level_sim.bootstrap_depth(192)=16 after raise,
    # so num_q = 16 + headroom
    params = CkksParams(degree=1 << 10, num_q=19, first_mod_size=60,
                        scaling_mod_size=56, hamming_weight=192,
                        num_q_parts=3)
    ctx = FheContext(params, seed=0)
    msg = np.linspace(-0.5, 0.5, params.degree // 2)
    ct = ctx.prepare_input(msg, "x", level=2)
    assert ct.level == 2
    ev = ctx.evaluator
    pl = ctx.encoder.encode(np.full(params.degree // 2, 0.5 + 0j), level=2)
    ct = ev.rescale(ev.mul_plain(ct, pl))     # level 2 -> 1
    assert ct.level == 1
    out = ctx.bootstrap(ct)
    assert out.level > ct.level  # refreshed budget
    ctx.set_output_data("y", out)
    got = ctx.handle_output("y", params.degree // 2)
    assert np.allclose(got, msg * 0.5, atol=2e-2), np.max(np.abs(got - msg * 0.5))
