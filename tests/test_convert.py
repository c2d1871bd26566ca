"""Torch checkpoint conversion: build a real torch VGG clone, convert its
state dict, and require identical logits."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from drsa_audio_tpu.models.vgg import (
    VGGConfig, build_layer_specs, forward,
)
from drsa_audio_tpu.utils.convert import (
    params_from_state_dict, state_dict_from_params,
)


def build_torch_model(cfg: VGGConfig):
    """Reference-architecture torch model with matching module names."""
    feats = []
    in_ch = 1
    for block, filters in enumerate(cfg.n_filters):
        for d in range(cfg.block_depth):
            feats.append(nn.Conv2d(in_ch if d == 0 else filters, filters,
                                   cfg.conv_kernel, padding="same"))
            if cfg.conv_bn:
                feats.append(nn.BatchNorm2d(filters))
            feats.append(nn.ReLU())
        feats.append(nn.MaxPool2d(tuple(cfg.pool_kernels[block])))
        in_ch = filters

    head = []
    n_in = cfg.flat_features
    for _ in range(cfg.dense_depth):
        head.append(nn.Linear(n_in, cfg.n_dense))
        if cfg.dense_bn:
            head.append(nn.BatchNorm1d(cfg.n_dense))
        head.append(nn.ReLU())
        if cfg.dropout:
            head.append(nn.Dropout(cfg.dropout))
        n_in = cfg.n_dense
    head.append(nn.Linear(n_in, cfg.n_classes))

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Sequential(*head)

        def forward(self, x):
            x = self.features(x)
            x = x.reshape(x.shape[0], -1)
            return self.classifier(x)

    return M()


def test_conversion_identical_logits(rng):
    cfg = VGGConfig(n_filters=(4, 8), pool_kernels=((4, 4), (2, 2)),
                    n_dense=16, n_classes=3, dropout=0.0, block_depth=1,
                    dense_depth=1, input_size=(32, 32), conv_bn=True,
                    dense_bn=False)
    tm = build_torch_model(cfg)
    tm.eval()
    # randomize BN stats so conversion is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    specs = build_layer_specs(cfg)
    params = params_from_state_dict(tm.state_dict(), specs)

    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours = np.asarray(forward(specs, params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # round trip back to torch
    sd = state_dict_from_params(params, specs)
    tm.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    with torch.no_grad():
        ref2 = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ref2, ref, rtol=1e-5)
