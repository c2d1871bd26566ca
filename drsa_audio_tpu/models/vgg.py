"""VGG-style CNN as an explicit functional layer list.

TPU-native redesign of the reference VGGType (cxai/model/create_model.py:8-97).
Instead of nn.Module objects, the model is a flat list of ``LayerSpec`` nodes
plus a parameter pytree keyed by layer name. Layer names mirror the reference's
``features.N`` / ``classifier.N`` addressing so LRP name-maps transfer 1:1.

The explicit list is what makes the LRP engine possible as a *function
interpreter* (forward records per-layer inputs; backward applies per-layer
rules) instead of autograd hooks — see drsa_audio_tpu/xai/lrp/engine.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One layer in the network. ``kind`` is the op; ``config`` is static."""
    kind: str            # conv | batchnorm | batchnorm1d | relu | maxpool |
                         # linear | dropout | flatten | projection |
                         # subspacefilter | invprojection
    name: str            # e.g. "features.0"
    config: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class VGGConfig:
    """Architecture hyperparameters (reference create_model.py:14-28)."""
    n_filters: Sequence[int] = (32, 64, 96, 128)
    conv_kernel: tuple = (3, 3)
    pool_kernels: Sequence[tuple] = ((4, 4), (2, 4), (2, 2), (2, 2))
    n_dense: int = 512
    n_classes: int = 10
    dropout: float = 0.2
    block_depth: int = 2
    dense_depth: int = 2
    input_size: tuple = (128, 256)
    conv_bn: bool = True
    dense_bn: bool = True

    @property
    def flat_features(self) -> int:
        h, w = self.input_size
        for ph, pw in self.pool_kernels:
            h, w = h // ph, w // pw
        return h * w * self.n_filters[-1]


def build_layer_specs(cfg: VGGConfig) -> list[LayerSpec]:
    """Build the layer list with reference-compatible names.

    Feature extractor: [Conv2d -> (BatchNorm2d) -> ReLU] * block_depth ->
    MaxPool, per block. Classifier: [Linear -> (BatchNorm1d) -> ReLU ->
    Dropout] * dense_depth -> Linear.
    """
    specs: list[LayerSpec] = []
    idx = 0
    in_ch = 1
    for block, filters in enumerate(cfg.n_filters):
        for d in range(cfg.block_depth):
            specs.append(LayerSpec("conv", f"features.{idx}", {
                "in_ch": in_ch if d == 0 else filters,
                "out_ch": filters,
                "kernel": tuple(cfg.conv_kernel),
            }))
            idx += 1
            if cfg.conv_bn:
                specs.append(LayerSpec("batchnorm", f"features.{idx}", {"ch": filters}))
                idx += 1
            specs.append(LayerSpec("relu", f"features.{idx}", {}))
            idx += 1
        specs.append(LayerSpec("maxpool", f"features.{idx}", {
            "kernel": tuple(cfg.pool_kernels[block]),
        }))
        idx += 1
        in_ch = filters

    specs.append(LayerSpec("flatten", "flatten", {"features": cfg.flat_features}))

    idx = 0
    n_in = cfg.flat_features
    for _ in range(cfg.dense_depth):
        specs.append(LayerSpec("linear", f"classifier.{idx}", {
            "in_f": n_in, "out_f": cfg.n_dense,
        }))
        idx += 1
        if cfg.dense_bn:
            specs.append(LayerSpec("batchnorm1d", f"classifier.{idx}", {"ch": cfg.n_dense}))
            idx += 1
        specs.append(LayerSpec("relu", f"classifier.{idx}", {}))
        idx += 1
        if cfg.dropout:
            specs.append(LayerSpec("dropout", f"classifier.{idx}", {"rate": cfg.dropout}))
            idx += 1
        n_in = cfg.n_dense
    specs.append(LayerSpec("linear", f"classifier.{idx}", {
        "in_f": n_in, "out_f": cfg.n_classes,
    }))
    return specs


def init_params(specs: Sequence[LayerSpec], key: jax.Array,
                scheme: str = "he") -> dict:
    """Parameter initialization.

    scheme='he' (default): Kaiming-uniform with ReLU gain sqrt(2) — keeps
    activation scale through deep no-BN stacks (the torch default, a=sqrt(5),
    attenuates ~2x per block and stalls narrow nets).
    scheme='torch': torch's Conv2d/Linear default (a=sqrt(5)) for parity
    experiments.
    """
    gain_sq = 2.0 if scheme == "he" else 2.0 / 6.0
    params: dict[str, Any] = {}
    for spec in specs:
        if spec.kind == "conv":
            kh, kw = spec.config["kernel"]
            in_ch, out_ch = spec.config["in_ch"], spec.config["out_ch"]
            fan_in = in_ch * kh * kw
            bound_w = np.sqrt(3.0 * gain_sq / fan_in)
            bound_b = 1.0 / np.sqrt(fan_in)
            key, k1, k2 = jax.random.split(key, 3)
            params[spec.name] = {
                "w": jax.random.uniform(k1, (out_ch, in_ch, kh, kw), jnp.float32,
                                        -bound_w, bound_w),
                "b": jax.random.uniform(k2, (out_ch,), jnp.float32, -bound_b, bound_b),
            }
        elif spec.kind == "linear":
            in_f, out_f = spec.config["in_f"], spec.config["out_f"]
            bound_w = np.sqrt(3.0 * gain_sq / in_f)
            bound_b = 1.0 / np.sqrt(in_f)
            key, k1, k2 = jax.random.split(key, 3)
            params[spec.name] = {
                "w": jax.random.uniform(k1, (out_f, in_f), jnp.float32, -bound_w, bound_w),
                "b": jax.random.uniform(k2, (out_f,), jnp.float32, -bound_b, bound_b),
            }
        elif spec.kind in ("batchnorm", "batchnorm1d"):
            ch = spec.config["ch"]
            params[spec.name] = {
                "scale": jnp.ones((ch,), jnp.float32),
                "bias": jnp.zeros((ch,), jnp.float32),
                "mean": jnp.zeros((ch,), jnp.float32),
                "var": jnp.ones((ch,), jnp.float32),
            }
    return params


def conv2d_same(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None) -> jnp.ndarray:
    """3x3 'same' conv, NCHW x OIHW (matches torch Conv2d padding='same').

    Mixed precision: the input is cast to the weight dtype (bf16 weights ->
    bf16 MXU passes) while the accumulation/output stays float32.
    """
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ).astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)[None, :, None, None]
    return out


def linear_apply(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense layer with the same mixed-precision convention."""
    out = jnp.matmul(x.astype(w.dtype), w.T,
                     preferred_element_type=jnp.float32).astype(jnp.float32)
    return out + b.astype(jnp.float32)


def cast_params(params: dict, dtype) -> dict:
    """Cast conv/linear weights+biases (not BN stats) to ``dtype`` for
    mixed-precision inference (bf16 on TPU)."""
    out = {}
    for name, p in params.items():
        if isinstance(p, dict) and "w" in p:
            out[name] = {k: v.astype(dtype) for k, v in p.items()}
        else:
            out[name] = p
    return out


def maxpool2d(x: jnp.ndarray, kernel: tuple) -> jnp.ndarray:
    """MaxPool with stride == kernel (torch MaxPool2d default)."""
    kh, kw = kernel
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, kh, kw),
        padding="VALID",
    )


# ---- NHWC variants: TPU-preferred layout (channels on the 128-lane minor
# dim) for the LRP lower-segment hot path. The round-3 profiler trace
# (docs/lower_backward_trace.md) showed 35% of the lower backward is
# reshape/copy/transpose churn around the NCHW convs; running the whole
# segment in NHWC removes the per-op relayouts. Weights stay OIHW in the
# param pytree (transposed per call — 9*Ci*Co floats, negligible).

def conv2d_same_nhwc(x: jnp.ndarray, w_oihw: jnp.ndarray,
                     b: jnp.ndarray | None) -> jnp.ndarray:
    """3x3 'same' conv, NHWC x (OIHW params transposed to HWIO)."""
    w = jnp.transpose(w_oihw, (2, 3, 1, 0))
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)[None, None, None, :]
    return out


def maxpool2d_nhwc(x: jnp.ndarray, kernel: tuple) -> jnp.ndarray:
    kh, kw = kernel
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, kh, kw, 1),
        padding="VALID",
    )


def apply_layer_nhwc(spec: "LayerSpec", params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Inference-mode apply for the conv-section layer kinds in NHWC."""
    kind = spec.kind
    if kind == "conv":
        p = params[spec.name]
        return conv2d_same_nhwc(x, p["w"], p.get("b"))
    if kind == "relu":
        return jnp.maximum(x, 0.0)
    if kind == "maxpool":
        return maxpool2d_nhwc(x, spec.config["kernel"])
    if kind == "dropout":
        return x
    raise ValueError(f"apply_layer_nhwc: unsupported kind {kind}")


def apply_layer(
    spec: LayerSpec,
    params: dict,
    x: jnp.ndarray,
    *,
    train: bool = False,
    dropout_key: jax.Array | None = None,
    bn_eps: float = 1e-5,
) -> jnp.ndarray:
    """Apply one layer (inference semantics unless ``train``)."""
    kind = spec.kind
    if kind == "conv":
        p = params[spec.name]
        return conv2d_same(x, p["w"], p.get("b"))
    if kind == "linear":
        p = params[spec.name]
        return linear_apply(x, p["w"], p["b"])
    if kind == "relu":
        return jnp.maximum(x, 0.0)
    if kind == "maxpool":
        return maxpool2d(x, spec.config["kernel"])
    if kind == "flatten":
        return x.reshape(x.shape[0], -1)
    if kind == "batchnorm":
        p = params[spec.name]
        inv = jax.lax.rsqrt(p["var"] + bn_eps)
        return (x - p["mean"][None, :, None, None]) * (inv * p["scale"])[None, :, None, None] \
            + p["bias"][None, :, None, None]
    if kind == "batchnorm1d":
        p = params[spec.name]
        inv = jax.lax.rsqrt(p["var"] + bn_eps)
        return (x - p["mean"][None, :]) * (inv * p["scale"])[None, :] + p["bias"][None, :]
    if kind == "dropout":
        if train and dropout_key is not None:
            rate = spec.config["rate"]
            keep = jax.random.bernoulli(dropout_key, 1.0 - rate, x.shape)
            return jnp.where(keep, x / (1.0 - rate), 0.0)
        return x
    if kind == "projection":
        from drsa_audio_tpu.models.projection import apply_projection
        return apply_projection(x, spec.config["U"], spec.config["num_concepts"])
    if kind == "subspacefilter":
        return x
    if kind == "invprojection":
        from drsa_audio_tpu.models.projection import apply_inv_projection
        return apply_inv_projection(x, spec.config["U"],
                                    spec.config["num_concepts"],
                                    spec.config.get("map_hw"))
    raise ValueError(f"unknown layer kind {kind}")


def forward(
    specs: Sequence[LayerSpec],
    params: dict,
    x: jnp.ndarray,
    *,
    train: bool = False,
    dropout_key: jax.Array | None = None,
) -> jnp.ndarray:
    """Full forward pass -> logits."""
    for i, spec in enumerate(specs):
        dk = None
        if train and dropout_key is not None and spec.kind == "dropout":
            dk = jax.random.fold_in(dropout_key, i)
        x = apply_layer(spec, params, x, train=train, dropout_key=dk)
    return x


def train_forward_with_bn(
    specs: Sequence[LayerSpec],
    params: dict,
    x: jnp.ndarray,
    dropout_key: jax.Array | None,
    momentum: float = 0.1,
    bn_eps: float = 1e-5,
):
    """Training forward using batch statistics; returns (logits, new_params)
    with updated BN running stats (torch convention:
    running = (1 - momentum) * running + momentum * batch_stat)."""
    new_params = dict(params)
    for i, spec in enumerate(specs):
        if spec.kind == "batchnorm":
            p = params[spec.name]
            axes = (0, 2, 3)
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            n = x.shape[0] * x.shape[2] * x.shape[3]
            unbiased = var * n / max(n - 1, 1)
            inv = jax.lax.rsqrt(var + bn_eps)
            x = (x - mean[None, :, None, None]) * (inv * p["scale"])[None, :, None, None] \
                + p["bias"][None, :, None, None]
            new_params[spec.name] = {
                **p,
                "mean": (1 - momentum) * p["mean"] + momentum * mean,
                "var": (1 - momentum) * p["var"] + momentum * unbiased,
            }
        elif spec.kind == "batchnorm1d":
            p = params[spec.name]
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            n = x.shape[0]
            unbiased = var * n / max(n - 1, 1)
            inv = jax.lax.rsqrt(var + bn_eps)
            x = (x - mean[None, :]) * (inv * p["scale"])[None, :] + p["bias"][None, :]
            new_params[spec.name] = {
                **p,
                "mean": (1 - momentum) * p["mean"] + momentum * mean,
                "var": (1 - momentum) * p["var"] + momentum * unbiased,
            }
        else:
            dk = None
            if dropout_key is not None and spec.kind == "dropout":
                dk = jax.random.fold_in(dropout_key, i)
            x = apply_layer(spec, params, x, train=True, dropout_key=dk)
    return x, new_params


def fold_batchnorm(specs: Sequence[LayerSpec], params: dict, bn_eps: float = 1e-5):
    """Functional BN canonizer: fold each BatchNorm into the preceding
    conv/linear (replaces zennit SequentialMergeBatchNorm, reference
    getdrsadata.py:81). Returns (new_specs, new_params) with BN layers
    replaced by identity ('relu'-adjacent noop is removed entirely).

    w' = w * scale / sqrt(var + eps);  b' = (b - mean) * scale / sqrt(var+eps) + bias
    """
    new_specs: list[LayerSpec] = []
    new_params = dict(params)
    prev_linear: LayerSpec | None = None
    for spec in specs:
        if spec.kind in ("batchnorm", "batchnorm1d") and prev_linear is not None:
            bn = params[spec.name]
            p = dict(new_params[prev_linear.name])
            factor = bn["scale"] / jnp.sqrt(bn["var"] + bn_eps)
            if prev_linear.kind == "conv":
                p["w"] = p["w"] * factor[:, None, None, None]
            else:
                p["w"] = p["w"] * factor[:, None]
            p["b"] = (p.get("b", 0.0) - bn["mean"]) * factor + bn["bias"]
            new_params[prev_linear.name] = p
            new_params.pop(spec.name, None)
            continue  # drop the BN layer
        if spec.kind in ("conv", "linear"):
            prev_linear = spec
        elif spec.kind not in ("batchnorm", "batchnorm1d"):
            prev_linear = None
        new_specs.append(spec)
    return new_specs, new_params


def conv_out_shape(input_size, pool_kernels, conv_kernel=(3, 3),
                   out_filters: int = 128, padding="same", stride: int = 1,
                   block_depth: int = 2) -> int:
    """Analytic flattened feature count for architecture grid search
    (reference get_out_shape, create_model.py:174-211)."""
    pad = 1 if padding == "same" else 0
    h, w = input_size
    for ph, pw in pool_kernels:
        for _ in range(block_depth):
            h = (h - conv_kernel[0] + 2 * pad) // stride + 1
            w = (w - conv_kernel[1] + 2 * pad) // stride + 1
        h = (h - (ph - 1) - 1) // ph + 1
        w = (w - (pw - 1) - 1) // pw + 1
    return int(h * w * out_filters)


# Trained configurations used downstream in the reference:
def gtzan_6s_config() -> VGGConfig:
    """6 s GTZAN model (reference getdrsadata.py:72-73, train.py:271)."""
    return VGGConfig(
        n_filters=(64, 64, 100, 128, 128), n_dense=100,
        pool_kernels=((2, 4), (2, 2), (2, 2), (2, 2), (2, 2)),
        dropout=0.3, input_size=(128, 256), n_classes=10,
        conv_bn=True, dense_bn=True, block_depth=2,
    )


def gtzan_3s_config() -> VGGConfig:
    """3 s GTZAN model (reference cpf.py:410-412)."""
    return VGGConfig(
        n_filters=(32, 32, 64, 64, 128), n_dense=128,
        pool_kernels=((2, 2),) * 5, dropout=0.4, input_size=(128, 128),
        n_classes=10, conv_bn=False, dense_bn=False, block_depth=1,
    )


def toy_config() -> VGGConfig:
    """Toy 2-class model: 5 blocks on 64x64 mels, dims [8,8,16,16,16]
    (reference cpf.py:260 toy dims)."""
    # dropout=0 so the classifier names land at 0/2/4 as LRP_NAME_MAP_TOY expects
    return VGGConfig(
        n_filters=(8, 8, 16, 16, 16), n_dense=32,
        pool_kernels=((2, 2),) * 5, dropout=0.0, input_size=(64, 64),
        n_classes=2, conv_bn=False, dense_bn=False, block_depth=1,
        dense_depth=2,
    )
