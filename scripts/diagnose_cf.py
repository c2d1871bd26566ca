#!/usr/bin/env python
"""Diagnose why DRSA concept flipping loses to standard-LRP flipping on the
gtzan_synth_v2 corpus (round-3 VERDICT item 4: investigate, don't explain).

Isolates three candidate causes on the same eval batch:

  1. composite mismatch — the committed standard baseline uses scaled gamma
     0.4 while the DRSA name_map uses scaled gamma 0.3: flip the SUM of the
     subspace heatmaps (identical composite on both sides, exact by LRP
     linearity) and compare;
  2. subspace quality — random orthogonal U through the identical pipeline
     (if random K=4 == DRSA K=4, optimization adds nothing at this layer);
  3. union mechanics — per flip step, how many distinct patches the K-concept
     union actually covers and what fraction of the standard ordering's top
     patches it includes (the reference flipper takes each concept's top-n,
     core.py:232-234, so DRSA flips MORE patches per nominal step; losing
     anyway means per-concept orderings actively miss the high-total-
     relevance patches).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/gtzan_synth_v2")
    ap.add_argument("--layers", type=int, nargs="+", default=[19, 33])
    ap.add_argument("--samples-per-class", type=int, default=10)
    ap.add_argument("--num-concepts", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.utils.config import ExperimentConfig
    from drsa_audio_tpu.models.vgg import build_layer_specs, fold_batchnorm, forward
    from drsa_audio_tpu.models.train import load_checkpoint, merge_params
    from drsa_audio_tpu.data.datasets import get_data_main
    from drsa_audio_tpu.xai.explain import HeatmapGenerator
    from drsa_audio_tpu.xai.eval.flipping import (
        Flipper, quadratic_schedule, rank_patches)
    from drsa_audio_tpu.xai.eval.stats import paired_diff_ci
    from drsa_audio_tpu.utils.evaluation import load_projection_matrix
    from drsa_audio_tpu.utils.constants import CLASS_IDX_MAPPER

    cfg = ExperimentConfig.gtzan_6s_default()
    ckpt = load_checkpoint(os.path.join(args.run, "model"), None)
    params = merge_params(ckpt["trainable"], ckpt.get("state") or {})
    specs = build_layer_specs(cfg.vgg_config())
    specs, params = fold_batchnorm(specs, params)
    K = args.num_concepts

    batch, _ = get_data_main(os.path.join(args.run, "data"),
                             args.samples_per_class,
                             fold=cfg.train.validation_fold,
                             num_chunks=cfg.eval.num_chunks, case=cfg.case)
    x = jnp.asarray(batch)
    b = x.shape[0]
    print(f"eval batch: {x.shape}")

    fwd = jax.jit(lambda t: forward(specs, params, t))
    p = cfg.eval.perturbation_size
    flipper = Flipper(p, forward_batch=512)

    report = {}
    for layer_idx in args.layers:
        per_class = b // len(CLASS_IDX_MAPPER)
        heatmaps = {"drsa": [], "random": []}
        rng = np.random.default_rng(0)
        for i, cls in enumerate(CLASS_IDX_MAPPER):
            xb = x[i * per_class:(i + 1) * per_class]
            U = load_projection_matrix(
                os.path.join(args.run, "subspaces", f"{K}_concepts", cls,
                             f"layer{layer_idx}"))
            D = U.shape[0]
            # random orthogonal U, same shape/pipeline
            A = rng.standard_normal((D, D)).astype(np.float32)
            Q, _ = np.linalg.qr(A)
            for name, Umat in (("drsa", U), ("random", Q)):
                gen = HeatmapGenerator(
                    specs=specs, params=params,
                    U=jnp.asarray(Umat, jnp.float32),
                    name_map=cfg.lrp_name_map, sample_class=cls,
                    num_concepts=K, layer_idx=layer_idx, case=cfg.case)
                heatmaps[name].append(gen.generate_subspace_heatmaps(
                    xb, concept_flipping=True, attr_batch_size=32,
                    clone_chunk=2))
        R_drsa = np.concatenate(heatmaps["drsa"], axis=0)      # [b, K, h, w]
        R_rand = np.concatenate(heatmaps["random"], axis=0)
        R_sum = R_drsa.sum(axis=1, keepdims=True)              # standard (γ=.3)

        res = {}
        for name, R in (("drsa", R_drsa), ("random_U", R_rand),
                        ("standard_sum", R_sum)):
            aupc, _, _ = flipper(fwd, x, jnp.asarray(R)[:, :, None])
            res[name] = float(np.asarray(aupc).mean())
        aupc_d, _, _ = flipper(fwd, x, jnp.asarray(R_drsa)[:, :, None])
        aupc_s, _, _ = flipper(fwd, x, jnp.asarray(R_sum)[:, :, None])
        d, lo, hi = paired_diff_ci(np.asarray(aupc_d), np.asarray(aupc_s))
        res["drsa_minus_stdsum_ci"] = [d, lo, hi]

        # union mechanics: distinct patches flipped per step + coverage of
        # the standard ordering's top-cum[s]
        h, w = x.shape[-2:]
        gh, gw = h // p, w // p
        P = gh * gw
        flips = quadratic_schedule(P)
        cum = np.cumsum(flips)
        order_d = np.asarray(rank_patches(jnp.asarray(R_drsa), p))   # [b,K,P]
        order_s = np.asarray(rank_patches(jnp.asarray(R_sum), p))    # [b,1,P]
        union_sz, cover = [], []
        for s, c in enumerate(cum):
            u = [set(order_d[i, :, :c].ravel()) for i in range(b)]
            st = [set(order_s[i, 0, :c]) for i in range(b)]
            union_sz.append(float(np.mean([len(ui) for ui in u])))
            cover.append(float(np.mean(
                [len(ui & si) / len(si) for ui, si in zip(u, st)])))
        res["schedule_cum"] = [int(c) for c in cum]
        res["union_size_mean"] = union_sz
        res["std_top_coverage"] = cover

        # relevance concentration: fraction of total positive relevance in
        # the top-1/top-4/top-16 patches of the standard map
        Rp = np.maximum(R_sum[:, 0], 0).reshape(b, gh, p, gw, p).sum((2, 4))
        flat = np.sort(Rp.reshape(b, -1), axis=1)[:, ::-1]
        tot = flat.sum(1) + 1e-12
        for k in (1, 4, 16):
            res[f"std_top{k}_mass"] = float((flat[:, :k].sum(1) / tot).mean())

        print(f"layer {layer_idx}: " + json.dumps(
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in res.items() if not isinstance(v, list)}))
        print(f"  union size per step: {[round(u,1) for u in union_sz[:8]]}")
        print(f"  std-top coverage:    {[round(c,3) for c in cover[:8]]}")
        print(f"  drsa-stdsum diff {d:+.4f} [{lo:+.4f}, {hi:+.4f}]")
        report[str(layer_idx)] = res

    out = args.out or os.path.join(args.run, "eval", "diagnosis.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
