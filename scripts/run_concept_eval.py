#!/usr/bin/env python
"""Concept-level evaluation sweep: concept flipping / random-U baseline /
separability+peakness over K x layer grids, plus a standard-LRP AUPC
baseline.

Reference cxai/xai/pixelflipping/cpf.py:241-476 (perform_cf, sep_and_peak,
main).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config")
    ap.add_argument("--case", choices=["gtzan", "gtzan_6s", "toy"], default="gtzan")
    ap.add_argument("--data", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--epoch", type=int, help="default: latest ckpt")
    ap.add_argument("--subspaces", required=True,
                    help="optimize_subspaces output root")
    ap.add_argument("--out", required=True)
    ap.add_argument("--algorithms", nargs="+", default=["drsa", "random"])
    ap.add_argument("--num-concepts", type=int, nargs="+", default=[2, 4, 8, 16])
    ap.add_argument("--layers", type=int, nargs="+", default=[1, 4, 7, 10, 13])
    ap.add_argument("--interclass-layer", type=int, default=None,
                    help="also run the interclass concept-flipping matrix "
                         "(cpf.py:87-181) at this layer")
    ap.add_argument("--forward-batch", type=int, default=512,
                    help="flipper forward chunk (bounds device memory)")
    ap.add_argument("--attr-batch", type=int, default=32,
                    help="heatmap/LRP attribution chunk (bounds device memory)")
    ap.add_argument("--gamma", type=float,
                    help="rescale the case name map's gamma rules to this "
                         "base value (decay pattern preserved) — composite-"
                         "sensitivity legs")
    args = ap.parse_args()

    import jax.numpy as jnp
    from drsa_audio_tpu.utils.config import ExperimentConfig
    from drsa_audio_tpu.models.vgg import build_layer_specs, fold_batchnorm
    from drsa_audio_tpu.models.train import load_checkpoint, merge_params
    from drsa_audio_tpu.data.datasets import get_data_main
    from drsa_audio_tpu.xai.eval.harness import (
        PixelFlipping, concept_flipping, cf_random_subspace,
    )
    from drsa_audio_tpu.xai.eval.metrics import (
        separability, peakness, separability_scores, peakness_scores,
        negative_mass_fraction, cancellation_factor,
    )
    from drsa_audio_tpu.xai.eval.stats import paired_diff_ci
    from drsa_audio_tpu.utils.evaluation import load_projection_matrix
    from drsa_audio_tpu.utils.constants import (
        CLASS_IDX_MAPPER, CLASS_IDX_MAPPER_TOY,
    )

    if args.config:
        cfg = ExperimentConfig.load(args.config)
    elif args.case == "toy":
        cfg = ExperimentConfig.toy_default()
    elif args.case == "gtzan_6s":
        cfg = ExperimentConfig.gtzan_6s_default()
    else:
        cfg = ExperimentConfig()

    name_map = cfg.lrp_name_map
    if args.gamma is not None:
        from drsa_audio_tpu.utils.constants import rescale_gamma
        name_map = rescale_gamma(name_map, args.gamma)

    ckpt = load_checkpoint(args.checkpoint, args.epoch)
    params = merge_params(ckpt["trainable"], ckpt.get("state") or {})
    specs = build_layer_specs(cfg.vgg_config())
    specs, params = fold_batchnorm(specs, params)
    mapper = CLASS_IDX_MAPPER_TOY if cfg.case == "toy" else CLASS_IDX_MAPPER

    # subspace dim at a layer = out-channels of the conv feeding it, computed
    # from the model specs (matches SUBSPACE_DIMS_GTZAN/_TOY for the 5-block
    # nets at layers [1,4,7,10,13], reference cpf.py:260,312, and covers the
    # 6 s model's layers {19,26,33} = {100,128,128})
    def dim_at(layer_idx):
        d = None
        for s in specs:
            if s.kind == "conv":
                d = s.config["out_ch"]
            if s.name == f"features.{layer_idx}":
                return d
        raise ValueError(f"features.{layer_idx} not in model")

    dim_by_layer = {li: dim_at(li) for li in args.layers}

    if cfg.case == "toy":
        from drsa_audio_tpu.data.datasets import get_songs_toy
        parts = []
        for cls in mapper:
            b, _ = get_songs_toy(args.data, cls, split="test",
                                 N=cfg.eval.samples_per_class)
            parts.append(b[:cfg.eval.samples_per_class])
        batch = np.concatenate(parts, axis=0)
    else:
        batch, _ = get_data_main(args.data, cfg.eval.samples_per_class,
                                 fold=cfg.train.validation_fold,
                                 num_chunks=cfg.eval.num_chunks,
                                 case=cfg.case)
    os.makedirs(args.out, exist_ok=True)

    std_same = {}  # layer -> same-composite standard AUPC per instance
    sp_scores = {}  # (alg, k, layer) -> per-instance sep/peak (+relu variants)
    for alg in args.algorithms:
        for k in args.num_concepts:
            sep_rows, peak_rows = [], []
            for li, layer_idx in enumerate(args.layers):
                if alg == "random":
                    RU = cf_random_subspace(specs, params, batch,
                                            name_map, layer_idx,
                                            dim=dim_by_layer[layer_idx],
                                            num_concepts=k, case=cfg.case,
                                            attr_batch_size=args.attr_batch)
                    aupc = None
                else:
                    Us = {cls: load_projection_matrix(
                        os.path.join(args.subspaces, f"{k}_concepts", cls,
                                     f"layer{layer_idx}"))
                        for cls in mapper}
                    aupc, _, _, RU = concept_flipping(
                        specs, params, batch, name_map, layer_idx,
                        Us, num_concepts=k, case=cfg.case,
                        perturbation_size=cfg.eval.perturbation_size,
                        forward_batch=args.forward_batch,
                        attr_batch_size=args.attr_batch)
                    np.save(os.path.join(
                        args.out, f"{alg}_aupcs_k{k}_layer{layer_idx}.npy"), aupc)
                    if layer_idx not in std_same:
                        # SAME-composite standard baseline: the K subspace
                        # heatmaps sum exactly to the standard heatmap of
                        # cfg.lrp_name_map (LRP linearity, K-independent), so
                        # flipping the sum IS standard flipping under the
                        # composite the DRSA pipeline uses — the comparison
                        # the reference makes (cpf.py main: one name_map for
                        # both sides). Round-3 diagnosis (diagnose_cf.py)
                        # showed the earlier scaled-gamma-0.4 baseline was a
                        # DIFFERENT, stronger composite, which inverted the
                        # DRSA-vs-standard verdict.
                        from drsa_audio_tpu.models.vgg import forward as _fwd
                        from drsa_audio_tpu.xai.eval.flipping import Flipper
                        import jax as _jax
                        fwd = _jax.jit(lambda t: _fwd(specs, params, t))
                        flp = Flipper(cfg.eval.perturbation_size,
                                      forward_batch=args.forward_batch)
                        R_sum = jnp.asarray(RU).sum(axis=1)[:, None, None]
                        a_std, _, _ = flp(fwd, jnp.asarray(batch), R_sum)
                        std_same[layer_idx] = np.asarray(a_std)
                        np.save(os.path.join(
                            args.out, f"standard_same_layer{layer_idx}.npy"),
                            std_same[layer_idx])
                        print(f"standard (same composite) layer={layer_idx}: "
                              f"AUPC {std_same[layer_idx].mean():.4f}")
                s, se = separability(RU)
                p, pe = peakness(RU)
                sep_rows.append((s, se))
                peak_rows.append((p, pe))
                # per-instance scores for bootstrap CIs, plus the mechanism
                # probes for the signed-metric anomaly (VERDICT round-3 #3):
                # the same scores on relu'd maps, and the negative-mass
                # fraction of the raw maps
                RU_pos = np.clip(RU, 0.0, None)
                sp_scores[(alg, k, layer_idx)] = {
                    "sep": separability_scores(RU),
                    "peak": peakness_scores(RU),
                    "sep_pos": separability_scores(RU_pos),
                    "peak_pos": peakness_scores(RU_pos),
                    "neg_mass": negative_mass_fraction(RU),
                    "cancellation": cancellation_factor(RU),
                }
                np.savez(os.path.join(
                    args.out, f"{alg}_sep_peak_scores_k{k}_layer{layer_idx}.npz"),
                    **sp_scores[(alg, k, layer_idx)])
                print(f"{alg} K={k} layer={layer_idx}: sep={s:.4f} peak={p:.4f}"
                      + (f" aupc={aupc.mean():.4f}" if aupc is not None else ""))
            np.save(os.path.join(args.out, f"{alg}_sep_peak_k{k}.npy"),
                    np.array([sep_rows, peak_rows]))

    # sep/peak DRSA-vs-random comparison with paired bootstrap CIs (same eval
    # instances on both sides) on raw AND relu'd maps
    if "drsa" in args.algorithms and "random" in args.algorithms:
        analysis = {}
        for k in args.num_concepts:
            for layer_idx in args.layers:
                dd = sp_scores.get(("drsa", k, layer_idx))
                rr = sp_scores.get(("random", k, layer_idx))
                if dd is None or rr is None:
                    continue
                entry = {"neg_mass": {"drsa": dd["neg_mass"],
                                      "random": rr["neg_mass"]},
                         "cancellation": {"drsa": dd["cancellation"],
                                          "random": rr["cancellation"]}}
                for m in ("sep", "peak", "sep_pos", "peak_pos"):
                    diff, lo, hi = paired_diff_ci(dd[m], rr[m])
                    entry[m] = {
                        "drsa": float(dd[m].mean()),
                        "random": float(rr[m].mean()),
                        "diff": diff, "ci95": [lo, hi],
                        "significant": bool(lo > 0 or hi < 0),
                    }
                analysis[f"k{k}_layer{layer_idx}"] = entry
                print(f"sep/peak CIs K={k} layer={layer_idx}: "
                      + " ".join(f"{m}: d-r={entry[m]['diff']:.3g} "
                                 f"[{entry[m]['ci95'][0]:.3g},"
                                 f"{entry[m]['ci95'][1]:.3g}]"
                                 for m in ("sep", "peak", "sep_pos",
                                           "peak_pos")))
        with open(os.path.join(args.out, "sep_peak_analysis.json"), "w") as f:
            json.dump(analysis, f, indent=1)

    # interclass concept-specificity matrix (cpf.py:87-181) at one layer
    if args.interclass_layer is not None:
        from drsa_audio_tpu.xai.eval.harness import interclass_concept_flipping
        li = args.interclass_layer
        k0 = args.num_concepts[0]
        Us_by_layer = {li: {cls: load_projection_matrix(
            os.path.join(args.subspaces, f"{k0}_concepts", cls, f"layer{li}"))
            for cls in mapper}}
        mats = interclass_concept_flipping(
            specs, params, batch, name_map, Us_by_layer,
            layer_idcs=(li,), num_concepts=k0, case=cfg.case,
            perturbation_size=cfg.eval.perturbation_size,
            forward_batch=args.forward_batch,
            attr_batch_size=args.attr_batch, return_samples=True)
        samples = mats[0]                          # [n, n, per-class samples]
        mat = samples.mean(axis=-1)
        np.save(os.path.join(args.out, f"interclass_layer{li}.npy"), mat)
        np.save(os.path.join(args.out, f"interclass_layer{li}_samples.npy"),
                samples)
        from drsa_audio_tpu.xai.eval.stats import interclass_gap_ci
        gap, lo, hi = interclass_gap_ci(samples)
        print(f"interclass layer {li}: diag {np.diag(mat).mean():.4f} "
              f"offdiag {(mat.sum() - np.trace(mat))
                         / (mat.size - len(mat)):.4f} "
              f"gap {gap:.4f} [95% CI {lo:.4f}, {hi:.4f}]"
              + ("" if lo > 0 else " — NOT significant"))
        with open(os.path.join(args.out, f"interclass_layer{li}_ci.json"),
                  "w") as f:
            json.dump({"gap": gap, "ci95": [lo, hi],
                       "significant": bool(lo > 0)}, f)

    # standard-LRP AUPC baseline (cpf.py:461-472)
    pf = PixelFlipping(specs, params, batch,
                       perturbation_size=cfg.eval.perturbation_size,
                       num_classes=len(mapper),
                       forward_batch=args.forward_batch,
                       attr_batch_size=args.attr_batch)
    grid = [{"convolutional": ("gamma", 0.4), "dense": ("epsilon", 1e-7),
             "first_layer": ("wsquare",)}]
    aupc_scores, _, _, _ = pf(grid, scaled_gamma=True)
    std_scores = None
    for name, scores in aupc_scores.items():
        std_scores = np.asarray(scores)
        np.save(os.path.join(args.out, "standard_R.npy"), scores)
        print(f"standard LRP ({name}): AUPC {scores.mean():.4f}")

    # paired bootstrap CI of (DRSA - standard) AUPC per layer: same balanced
    # batch, same instances, so pairing removes between-clip variance
    # (round-2 VERDICT weak #4 / next-round #5). Primary comparison is the
    # SAME-composite standard (what the thesis claims); the scaled-gamma-0.4
    # sweep is reported separately as a strongest-standard-composite line.
    if "drsa" in args.algorithms:
        from drsa_audio_tpu.xai.eval.stats import paired_diff_ci
        cis = {}
        for k in args.num_concepts:
            for layer_idx in args.layers:
                p = os.path.join(args.out, f"drsa_aupcs_k{k}_layer{layer_idx}.npy")
                if not os.path.exists(p):
                    continue
                entry = {}
                if layer_idx in std_same:
                    d, lo, hi = paired_diff_ci(np.load(p), std_same[layer_idx])
                    verdict = ("DRSA better" if hi < 0 else
                               "standard better" if lo > 0 else "not significant")
                    entry["same_composite"] = {
                        "mean_diff": d, "ci95": [lo, hi], "verdict": verdict}
                    print(f"DRSA-vs-standard(same composite) K={k} "
                          f"layer={layer_idx}: diff {d:+.4f} "
                          f"[95% CI {lo:+.4f}, {hi:+.4f}] {verdict}")
                if std_scores is not None:
                    d, lo, hi = paired_diff_ci(np.load(p), std_scores)
                    verdict = ("DRSA better" if hi < 0 else
                               "standard better" if lo > 0 else "not significant")
                    entry["scaled_gamma_04"] = {
                        "mean_diff": d, "ci95": [lo, hi], "verdict": verdict}
                    print(f"DRSA-vs-standard(scaled-gamma 0.4) K={k} "
                          f"layer={layer_idx}: diff {d:+.4f} "
                          f"[95% CI {lo:+.4f}, {hi:+.4f}] {verdict}")
                cis[f"k{k}_layer{layer_idx}"] = entry
        with open(os.path.join(args.out, "drsa_vs_standard_ci.json"), "w") as f:
            json.dump(cis, f, indent=1)


if __name__ == "__main__":
    main()
