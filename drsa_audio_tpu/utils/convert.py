"""Convert reference (PyTorch) checkpoints to this framework's params.

The reference saves ``torch.save({'model_state_dict': ...})`` checkpoints
(cxai/model/train.py:175-188) with module names like ``features.0.weight``.
Layouts map 1:1: Conv2d weight OIHW == our conv 'w'; Linear weight
[out, in] == our 'w'; BatchNorm weight/bias/running_mean/running_var ->
scale/bias/mean/var.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def params_from_state_dict(state_dict, specs) -> dict:
    """Build our params pytree from a torch-style state dict (tensor or
    ndarray values)."""
    def get(name):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    params: dict = {}
    for spec in specs:
        if spec.kind in ("conv", "linear"):
            params[spec.name] = {
                "w": get(f"{spec.name}.weight"),
                "b": get(f"{spec.name}.bias"),
            }
        elif spec.kind in ("batchnorm", "batchnorm1d"):
            params[spec.name] = {
                "scale": get(f"{spec.name}.weight"),
                "bias": get(f"{spec.name}.bias"),
                "mean": get(f"{spec.name}.running_mean"),
                "var": get(f"{spec.name}.running_var"),
            }
    return params


def load_torch_checkpoint(path: str, specs) -> dict:
    """Load a reference ``best_model_*.pth`` checkpoint file."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt)
    return params_from_state_dict(state, specs)


def state_dict_from_params(params, specs) -> dict:
    """Inverse mapping (numpy arrays), for exporting back to torch users."""
    out = {}
    for spec in specs:
        if spec.kind in ("conv", "linear"):
            p = params[spec.name]
            out[f"{spec.name}.weight"] = np.asarray(p["w"])
            out[f"{spec.name}.bias"] = np.asarray(p["b"])
        elif spec.kind in ("batchnorm", "batchnorm1d"):
            p = params[spec.name]
            out[f"{spec.name}.weight"] = np.asarray(p["scale"])
            out[f"{spec.name}.bias"] = np.asarray(p["bias"])
            out[f"{spec.name}.running_mean"] = np.asarray(p["mean"])
            out[f"{spec.name}.running_var"] = np.asarray(p["var"])
    return out
