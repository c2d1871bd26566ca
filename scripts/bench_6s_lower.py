"""A/B the 6s lower backward on the real chip: generalized fused Pallas
chain vs the round-3 clone-chunked XLA path (the eval harness's previous
production route for this model).

Usage: python scripts/bench_6s_lower.py [--batch 32] [--iters 8] [--layer 33]
Prints one JSON line per variant with ms/iter and the heatmap agreement.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--layer", type=int, default=33)
    ap.add_argument("--d", type=int, default=128,
                    help="layer dim (128 for layers 26/33, 100 for 19)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_6s_config, fold_batchnorm)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import (
        class_composite, explain_forward_upper, explain_lower)
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN_6S

    K = 4
    specs = build_layer_specs(gtzan_6s_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    specs, params = fold_batchnorm(specs, params)
    U = random_orthogonal(jax.random.PRNGKey(7), args.d)
    specs_proj = insert_projection(specs, args.layer, U, K,
                                   input_size=(128, 256))
    composite = class_composite(LRP_NAME_MAP_GTZAN_6S, K)

    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.standard_normal(
        (args.batch, 1, 128, 256)).astype(np.float32))

    @jax.jit
    def stage_upper(x):
        R_f, acts, _ = explain_forward_upper(specs_proj, params, x, composite,
                                             class_idx=0, nhwc=True)
        return R_f, acts

    def make_lower(**kw):
        @jax.jit
        def f(acts, R_f):
            return explain_lower(specs_proj, params, acts, R_f, composite, K,
                                 nhwc=True, **kw)
        return f

    R_f, acts = stage_upper(mels)
    jax.block_until_ready(R_f)

    variants = {
        "fused_chain": make_lower(fused=True),
        "xla_clone_chunk2": make_lower(fused=False, clone_chunk=2),
    }
    outs = {}
    for name, fn in variants.items():
        # a variant that fails to lower (e.g. Mosaic on an untested 6s plan)
        # must not take the other variant's number down with it
        try:
            out = fn(acts, R_f)
            jax.block_until_ready(out)        # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(acts, R_f)
            jax.block_until_ready(out)
        except Exception as e:
            print(json.dumps({"variant": name, "error":
                              f"{type(e).__name__}: {str(e)[:500]}"}),
                  flush=True)
            continue
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        outs[name] = np.asarray(out)
        rec = {"variant": name, "ms_per_iter": round(ms, 2),
               "clips_per_sec": round(args.batch / ms * 1e3, 1)}
        if len(outs) == 2:
            a, b = outs["fused_chain"].ravel(), outs["xla_clone_chunk2"].ravel()
            rec["corr_vs_fused"] = round(float(np.corrcoef(a, b)[0, 1]), 8)
            rec["max_abs_diff"] = float(np.max(np.abs(a - b)))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
