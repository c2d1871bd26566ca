"""Microbench explain-pipeline precision variants on the real chip.

Compares the fused wav -> logmel -> LRP -> K-subspace-heatmap program with
f32 vs bf16 conv/linear weights (mixed precision: rule divisions and
accumulation stay f32 — models/vgg.py:conv2d_same), and reports the heatmap
correlation of bf16 vs f32 (parity gate >= 0.99, BASELINE.json).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 256
ITERS = 8
K = 4
LAYER_IDX = 10


def main():
    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_3s_config, cast_params,
    )
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel, peak_normalize
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN

    cfg = gtzan_3s_config()
    specs = build_layer_specs(cfg)
    params32 = init_params(specs, jax.random.PRNGKey(0))
    fe = FrontendConfig.for_case("gtzan")
    U = random_orthogonal(jax.random.PRNGKey(7), 64)
    specs_proj = insert_projection(specs, LAYER_IDX, U, K)
    composite = class_composite(LRP_NAME_MAP_GTZAN, K)

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal(
        (BATCH, fe.sample_rate * fe.slice_length)).astype(np.float32))

    def make(params):
        @jax.jit
        def explain(w):
            x = peak_normalize(w)
            mels = logmel(x, fe)[:, None]
            heat, _ = subspace_heatmaps(specs_proj, params, mels, composite,
                                        K, class_idx=0)
            return heat
        return explain

    results = {}
    heats = {}
    for name, params in (("f32", params32),
                         ("bf16", cast_params(params32, jnp.bfloat16))):
        fn = make(params)
        heats[name] = np.asarray(fn(wavs))  # warmup + output
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(wavs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[name] = {"clips_per_sec": round(BATCH * ITERS / dt, 1),
                         "ms_per_iter": round(dt / ITERS * 1e3, 2)}

    a, b = heats["f32"].ravel(), heats["bf16"].ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    results["bf16_vs_f32_heatmap_corr"] = round(corr, 6)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
