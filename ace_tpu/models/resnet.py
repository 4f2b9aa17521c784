"""ResNet model family: the reference's encrypted-CNN benchmark suite.

Covers the models shipped with the reference (model/ directory +
rtlib/ant/dataset mains): resnet20/32/44/56 on CIFAR-10 and resnet32 on
CIFAR-100. Models load from the reference's pre-trained ONNX files when
present (read-only), or any user-supplied ONNX with the same op set.

End-to-end flow mirrors dataset/resnet_cifar.main.inc:35-119:
read CIFAR image -> normalize -> encode+encrypt -> run encrypted graph
-> decrypt+decode -> argmax vs label.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ace_tpu.compiler.onnx_front import load_onnx, NNGraph
from ace_tpu.compiler.lowering import GraphRunner
from ace_tpu.compiler import packing as pk
from ace_tpu.compiler.scheme_info import SchemeConfig, select_params
from ace_tpu.runtime.timing import TIMING

REFERENCE_MODEL_DIR = "/root/reference/model"

MODEL_FILES = {
    "resnet20_cifar10": "resnet20_cifar10_pre.onnx",
    "resnet32_cifar10": "resnet32_cifar10_pre.onnx",
    "resnet32_cifar100": "resnet32_cifar100_pre.onnx",
    "resnet44_cifar10": "resnet44_cifar10_pre.onnx",
    "resnet56_cifar10": "resnet56_cifar10_pre.onnx",
}

# dataset/resnet_cifar.main.inc:44-45
CIFAR_MEAN = np.array([0.485, 0.456, 0.406])
CIFAR_STDEV = np.array([0.229, 0.224, 0.225])


def model_path(name: str, model_dir: str = REFERENCE_MODEL_DIR) -> str:
    return os.path.join(model_dir, MODEL_FILES[name])


def load_model(name: str, model_dir: str = REFERENCE_MODEL_DIR) -> NNGraph:
    return load_onnx(model_path(name, model_dir))


def read_cifar_batch(path: str, count: int = 0, classes: int = 10):
    """Binary CIFAR batch reader (nn-addon/include/nn/util/
    cifar_reader.h:95-117): per-record [label(+coarse for cifar100)]
    then 3x32x32 RGB bytes; normalized (x/255 - mean) / stdev."""
    label_size = 1 if classes == 10 else 2
    rec = label_size + 3 * 32 * 32
    raw = np.fromfile(path, dtype=np.uint8)
    n = len(raw) // rec
    if count:
        n = min(n, count)
    raw = raw[:n * rec].reshape(n, rec)
    labels = raw[:, label_size - 1].astype(np.int64)
    imgs = raw[:, label_size:].reshape(n, 3, 32, 32).astype(np.float64)
    imgs = (imgs / 255.0 - CIFAR_MEAN[None, :, None, None]) \
        / CIFAR_STDEV[None, :, None, None]
    return imgs, labels


@dataclasses.dataclass
class CompiledModel:
    """An ONNX model bound to CKKS parameters and a runtime context."""
    graph: NNGraph
    scheme: object
    ctx: object
    runner: GraphRunner
    num_classes: int


def compile_model(name_or_graph, cfg: SchemeConfig | None = None,
                  ctx=None, num_classes: int = 10,
                  check_every: bool = False,
                  max_rot_keys: int = 0, trace=None) -> CompiledModel:
    """The fhe_cmplr analog: NN graph -> params -> runtime context ->
    encrypted executable (GraphRunner over the FheBackend)."""
    from ace_tpu.runtime.context import FheContext

    g = load_model(name_or_graph) if isinstance(name_or_graph, str) \
        else name_or_graph
    cfg = cfg or SchemeConfig()
    scheme = select_params(g, cfg)
    if ctx is None:
        # keep rotation keys within a single-chip HBM budget (LRU +
        # regenerate); per-key bytes derive from the key structure
        ctx = FheContext(scheme_info=scheme, max_rot_keys=max_rot_keys,
                         rot_key_budget_bytes=0 if max_rot_keys
                         else (10 << 30))
    be = pk.FheBackend(ctx.evaluator, ctx.encoder,
                       bootstrap_fn=ctx.bootstrap)
    if check_every:
        from ace_tpu.runtime.validate import ValidatingBackend
        be = ValidatingBackend(be, check_every=True)
    runner = GraphRunner(
        g, be, relu_ranges=cfg.relu_ranges,
        relu_range_default=cfg.relu_value_range,
        relu_mul_depth=cfg.relu_mul_depth,
        bootstrap_before_relu=cfg.use_bootstrap, trace=trace)
    return CompiledModel(g, scheme, ctx, runner, num_classes)


def infer_plain(graph: NNGraph, image: np.ndarray,
                n_slots: int = 1 << 15) -> np.ndarray:
    """Packed-slot plain inference (the rt_validate oracle path)."""
    be = pk.PlainBackend(n_slots)
    runner = GraphRunner(graph, be)
    return runner.run(be.pack(np.asarray(image).reshape(-1)))


def infer_encrypted(model: CompiledModel, image: np.ndarray,
                    checkpoint: str = "") -> np.ndarray:
    """One encrypted inference; returns the logits (decrypted).
    `checkpoint`: optional resume file (see GraphRunner.run)."""
    from ace_tpu.runtime.validate import ValidatingBackend, Shadow
    ctx = model.ctx
    ct = ctx.prepare_input(image, "input",
                           level=model.scheme.input_level)
    x = ctx.get_input_data("input")
    be = model.runner.be
    if isinstance(be, ValidatingBackend):
        msg = np.zeros(be.n_slots)
        flat = np.asarray(image, np.float64).reshape(-1)
        msg[:flat.size] = flat
        x = Shadow(x, msg)
    with TIMING.tm("RTM_MAIN_GRAPH"):
        out = model.runner.run(x, checkpoint=checkpoint)
    if isinstance(be, ValidatingBackend):
        be.check(out, "graph output")
        out = out.ct
    ctx.set_output_data("output", out)
    return ctx.handle_output("output", model.num_classes)
