"""Reference-style CLI option parsing (the -GRP:key=val:flag surface)."""

from ace_tpu.utils.options import parse_args, parse_group, parse_relu_vr


def test_parse_group():
    g, o = parse_group("-CKKS:sk_hw=192:q0=60:sf=56")
    assert g == "CKKS"
    assert o == {"sk_hw": "192", "q0": "60", "sf": "56"}
    g, o = parse_group("-P2C:lib=ant:df=w.msg:fp")
    assert o == {"lib": "ant", "df": "w.msg", "fp": True}


def test_parse_relu_vr():
    out = parse_relu_vr("/relu/Relu=4;/layer1/relu/Relu=6.5")
    assert out == {"/relu/Relu": 4.0, "/layer1/relu/Relu": 6.5}


def test_parse_args_build_script_line():
    # the flags from scripts/build_resnet20_cifar10.sh
    cfg, glob, extras = parse_args([
        "model.onnx", "-CKKS:sk_hw=192:q0=60:sf=56",
        "-SIHE:relu_vr=/relu/Relu=4", "-VEC:rtt:conv_fast",
        "-P2C:df=weights.msg:fp", "-trace"])
    assert cfg.hamming_weight == 192
    assert cfg.first_mod_size == 60 and cfg.scaling_mod_size == 56
    assert cfg.relu_ranges == {"/relu/Relu": 4.0}
    assert extras["vec"] == {"rtt": True, "conv_fast": True}
    assert extras["p2c"]["df"] == "weights.msg"
    assert glob.trace
    assert extras["inputs"] == ["model.onnx"]


def test_compile_driver_manifest(tmp_path):
    """fhe_cmplr-analog compile: manifest + weight file from reference
    build-script flags."""
    import json
    from ace_tpu.driver import main
    man = tmp_path / "m.json"
    wf = tmp_path / "w.msg"
    rc = main(["/root/reference/model/resnet20_cifar10_pre.onnx",
               "-CKKS:sk_hw=192:q0=60:sf=56:sec=0",
               f"-P2C:df={wf}", "-o", str(man)])
    assert rc == 0
    m = json.loads(man.read_text())
    assert m["scheme"]["poly_degree"] == 1 << 15
    assert 200 <= len(m["rotate_indices"]) <= 300  # reference: 227
    assert wf.stat().st_size > 1 << 20  # all resnet20 weights
