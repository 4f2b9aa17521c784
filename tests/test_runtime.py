"""Runtime subsystem tests: rt_data file round-trip, pt manager,
timing counters, FheContext io_api flow, validation backend."""

import numpy as np
import pytest

from ace_tpu.ckks.params import CkksParams
from ace_tpu.runtime import rt_data
from ace_tpu.runtime.timing import RtTiming
from ace_tpu.runtime.context import FheContext

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def ctx():
    return FheContext(CkksParams(degree=16, num_q=4, first_mod_size=33,
                                 scaling_mod_size=30), seed=9)


def test_rt_data_roundtrip(tmp_path):
    w = rt_data.RtDataWriter()
    a = RNG.uniform(-1, 1, 37).astype(np.float32)
    b = RNG.uniform(-1, 1, 8)
    w.append("conv1_weight", a)
    w.append_f64("fc_bias", b)
    pt = RNG.integers(0, 2**60, (3, 16), dtype=np.uint64)
    w.append_pt("encoded_w", pt, scale=2.0**30, sf_degree=1, level=3,
                msg_len=8)
    path = str(tmp_path / "weights.msg")
    w.write(path)

    r = rt_data.RtDataReader(path)
    assert [e["name"] for e in r.entries] == ["conv1_weight", "fc_bias",
                                              "encoded_w"]
    ent, arr = r.read(r.by_name["conv1_weight"])
    assert ent["kind"] == rt_data.KIND_F32 and np.array_equal(arr, a)
    ent, arr = r.read(r.by_name["fc_bias"])
    assert np.array_equal(arr, b)
    ent, arr = r.read(r.by_name["encoded_w"])
    assert ent["level"] == 3 and ent["scale"] == 2.0**30
    assert np.array_equal(arr.reshape(3, 16), pt)
    r.prefetch(0)  # smoke: madvise path
    r.close()


def test_pt_manager_get(tmp_path, ctx):
    w = rt_data.RtDataWriter()
    vals = RNG.uniform(-1, 1, 8).astype(np.float32)
    w.append("w0", vals)
    path = str(tmp_path / "w.msg")
    w.write(path)
    mgr = ctx.open_weight_file(path)
    pt = mgr.get("w0", level=3)
    assert pt.level == 3
    got = ctx.encoder.decode(pt).real[:8]
    assert np.allclose(got, vals, atol=1e-5)
    assert mgr.get("w0", level=3) is pt  # cached


def test_timing_counters():
    tm = RtTiming(enabled=True)
    with tm.tm("RTM_BOOTSTRAP"):
        pass
    tm.add("RTM_NTT", 0.5, count=3)
    assert tm.count("RTM_BOOTSTRAP") == 1
    assert tm.seconds("RTM_NTT") == 0.5
    rep = tm.report()
    assert "RTM_NTT" in rep and "RTM_BOOTSTRAP" in rep


def test_context_io_flow(ctx):
    x = RNG.uniform(-1, 1, (2, 2, 2))
    ct = ctx.prepare_input(x, "input")
    assert ctx.get_input_data("input") is ct
    out = ctx.evaluator.add(ct, ct)
    ctx.set_output_data("output", out)
    got = ctx.handle_output("output", 8)
    assert np.allclose(got, 2 * x.reshape(-1), atol=1e-2)
    rep = ctx.finalize()
    assert "key memory" in rep
    assert ctx.key_memory_bytes() > 0


def test_validating_backend_catches_divergence(ctx):
    from ace_tpu.compiler.packing import FheBackend
    from ace_tpu.runtime.validate import (ValidatingBackend, Shadow,
                                          ValidationError)
    be = ValidatingBackend(FheBackend(ctx.evaluator, ctx.encoder),
                           epsilon=1e-2, check_every=True)
    msg = np.zeros(8)
    msg[:4] = RNG.uniform(-1, 1, 4)
    s = Shadow(ctx.evaluator.encrypt(ctx.encoder.encode(
        msg.astype(np.complex128))), msg)
    s2 = be.add(s, s)
    s3 = be.mul_plain(s2, np.full(8, 0.5))
    be.check(s3, "final")
    # now corrupt the shadow: must raise
    bad = Shadow(s3.ct, s3.msg + 1.0)
    with pytest.raises(ValidationError):
        be.check(bad, "corrupted")


def test_pt_manager_preencoded_plaintext(tmp_path, ctx):
    """-P2C:cte analog: a pre-encoded RNS plaintext entry loads as a
    ready Plaintext and multiplies correctly."""
    import numpy as np
    enc, ev = ctx.encoder, ctx.evaluator
    msg = RNG.uniform(-1, 1, 8)
    pt = enc.encode(msg.astype(np.complex128), level=3)
    w = rt_data.RtDataWriter()
    w.append_pt("w_enc", np.asarray(pt.poly.data), scale=pt.scaling_factor,
                sf_degree=pt.sf_degree, level=3, msg_len=8)
    path = str(tmp_path / "enc.msg")
    w.write(path)
    mgr = ctx.open_weight_file(path)
    loaded = mgr.get("w_enc", level=3)
    assert loaded.level == 3
    x = RNG.uniform(-1, 1, 8)
    ct = ev.encrypt(enc.encode(x.astype(np.complex128), level=3))
    got = enc.decode(ev.decrypt(ev.mul_plain(ct, loaded))).real
    assert np.allclose(got, x * msg, atol=1e-2)
