"""A/B the inner-conv contraction strategy of the fused Pallas chain on the
real chip: 9 block-diagonal tap matmuls (production, conv3x3_packed) vs the
banded (P+2)-column window contraction (conv3x3_window_packed,
DRSA_INNER_WINDOW_CONV=1) that halves the padded MXU work at P=4.

The flag is read at trace time, so both variants run in ONE process: toggle
the env var between jit traces of the staged lower backward.

Usage: python scripts/bench_inner_window.py [--batch 256] [--iters 16]
Prints one JSON line per variant with ms/iter and the agreement vs prod.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_3s_config)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import (
        class_composite, explain_forward_upper, explain_lower)
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN

    K = 4
    LAYER_IDX = 10
    specs = build_layer_specs(gtzan_3s_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    U = random_orthogonal(jax.random.PRNGKey(7), 64)
    specs_proj = insert_projection(specs, LAYER_IDX, U, K)
    composite = class_composite(LRP_NAME_MAP_GTZAN, K)

    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.standard_normal(
        (args.batch, 1, 128, 128)).astype(np.float32))

    @jax.jit
    def stage_upper(x):
        R_f, acts, _ = explain_forward_upper(specs_proj, params, x, composite,
                                             class_idx=0, nhwc=True)
        return R_f, acts

    R_f, acts = stage_upper(mels)
    jax.block_until_ready(R_f)

    def make_lower():
        @jax.jit
        def f(a, r):
            return explain_lower(specs_proj, params, a, r, composite, K,
                                 nhwc=True, fused=True)
        return f

    from _tunnel_timing import measure_rpc_floor, time_with_fresh_input
    floor_ms = measure_rpc_floor(jax, jnp)
    print(json.dumps({"rpc_floor_ms": round(floor_ms, 2)}), flush=True)

    variants = [("prod_tapmm", "0"), ("window_packed", "1")]
    outs = {}
    for name, flag in variants:
        os.environ["DRSA_INNER_WINDOW_CONV"] = flag
        fn = make_lower()
        try:
            print(json.dumps({"variant": name, "status": "compiling"}),
                  flush=True)
            ms, out = time_with_fresh_input(
                jax, lambda v: fn(acts, v), R_f, args.iters, floor_ms)
        except Exception as e:
            print(json.dumps({"variant": name, "error":
                              f"{type(e).__name__}: {str(e)[:500]}"}),
                  flush=True)
            continue
        outs[name] = np.asarray(out)
        rec = {"variant": name, "ms_per_iter": round(ms, 2),
               "clips_per_sec": round(args.batch / ms * 1e3, 1)}
        if len(outs) == 2:
            a, b = outs["prod_tapmm"].ravel(), outs["window_packed"].ravel()
            rec["corr_vs_prod"] = round(float(np.corrcoef(a, b)[0, 1]), 8)
            rec["max_abs_diff"] = float(np.max(np.abs(a - b)))
        print(json.dumps(rec), flush=True)
    os.environ.pop("DRSA_INNER_WINDOW_CONV", None)


if __name__ == "__main__":
    main()
