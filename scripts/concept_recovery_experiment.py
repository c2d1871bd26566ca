#!/usr/bin/env python
"""Full concept-recovery experiment: train the toy classifier properly, run
DRSA with K=4 at the reference's budget, and measure how many of the 4
ground-truth concepts the subspaces recover (band assignment + separability
vs random-U baselines). Writes a small JSON report.
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
    ap.add_argument("--out", default="recovery_report.json")
    ap.add_argument("--per-class", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--num-concepts", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--layer", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.data.toydata import generate_batch
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, toy_config, forward,
    )
    from drsa_audio_tpu.models.train import (
        make_optimizer, make_train_step, split_trainable, merge_params,
        toy_augment_and_mel,
    )
    from drsa_audio_tpu.ops.frontend import FrontendConfig
    from drsa_audio_tpu.xai.lrp.engine import Composite
    from drsa_audio_tpu.xai.explain import HeatmapGenerator
    from drsa_audio_tpu.xai.drsa.preprocessing import preprocess_data, normalize_vectors
    from drsa_audio_tpu.xai.drsa.optimizer import fit as drsa_fit, random_orthogonal
    from drsa_audio_tpu.xai.eval.concept_recovery import (
        band_assignment, profile_diversity,
    )
    from drsa_audio_tpu.xai.eval.metrics import separability
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY

    fe = FrontendConfig.for_case("toy")
    K, layer_idx = args.num_concepts, args.layer
    rng = np.random.default_rng(0)

    print(f"training on {2 * args.per_class} clips, {args.epochs} epochs ...")
    wavs = np.concatenate([generate_batch(rng, "class1", args.per_class),
                           generate_batch(rng, "class2", args.per_class)])
    labels = np.concatenate([np.zeros(args.per_class),
                             np.ones(args.per_class)]).astype(np.int32)
    specs = build_layer_specs(toy_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    opt = make_optimizer(lr=5e-3, momentum=0.9, weight_decay=1e-4)
    trainable, state = split_trainable(params)
    opt_state = opt.init(trainable)
    step = make_train_step(
        specs, opt,
        per_example_mel=lambda w, k: toy_augment_and_mel(w, k, fe, False, True))
    key = jax.random.PRNGKey(1)
    order = np.arange(len(wavs))
    for epoch in range(args.epochs):
        np.random.default_rng(epoch).shuffle(order)
        for i in range(0, len(order), 64):
            sel = order[i:i + 64]
            key, sub = jax.random.split(key)
            trainable, state, opt_state, loss, acc = step(
                trainable, state, opt_state, jnp.asarray(wavs[sel]),
                jnp.asarray(labels[sel]), sub)
    params = merge_params(trainable, state)

    mel_fn = lambda w: toy_augment_and_mel(w, jax.random.PRNGKey(0), fe, False, False)
    # held-out accuracy (all-4-concept samples)
    t1 = generate_batch(np.random.default_rng(123), "class1", 64, (1, 2, 3, 4))
    t2 = generate_batch(np.random.default_rng(321), "class2", 64, (1, 2, 3, 4))
    mels_t = jax.vmap(mel_fn)(jnp.asarray(np.concatenate([t1, t2])))
    lt = np.concatenate([np.zeros(64), np.ones(64)]).astype(np.int32)
    acc = float((np.asarray(forward(specs, params, mels_t)).argmax(-1) == lt).mean())
    print(f"held-out all-4 accuracy: {acc:.3f}")

    report = {"heldout_all4_accuracy": acc, "classes": {}}
    composite = Composite.from_list(LRP_NAME_MAP_TOY)

    for cls, class_idx in (("class1", 0), ("class2", 1)):
        x = generate_batch(np.random.default_rng(7 + class_idx), cls, 128,
                           concept_idcs=(1, 2, 3, 4))
        mels = jax.vmap(mel_fn)(jnp.asarray(x))
        act, ctx = preprocess_data(specs, params, mels, composite, layer_idx,
                                   class_idx=class_idx, num_locations=20,
                                   key=jax.random.PRNGKey(3))
        res = drsa_fit(np.asarray(normalize_vectors(act)),
                       np.asarray(normalize_vectors(ctx)),
                       num_concepts=K, steps=args.steps, runs=args.runs, seed=42)
        best = int(res.best_run)
        U = np.asarray(res.U[best])
        gen = HeatmapGenerator(specs=specs, params=params, U=U,
                               name_map=LRP_NAME_MAP_TOY, sample_class=cls,
                               num_concepts=K, layer_idx=layer_idx)
        RU = gen.generate_subspace_heatmaps(np.asarray(mels),
                                            concept_flipping=True)
        shares, assignment, coverage = band_assignment(RU, cls)
        sep_opt, _ = separability(np.maximum(RU, 0))

        seps_rand, covs_rand, divs_rand = [], [], []
        for seed in (101, 202, 303):
            U_r = np.asarray(random_orthogonal(jax.random.PRNGKey(seed), U.shape[0]))
            gen_r = HeatmapGenerator(specs=specs, params=params, U=U_r,
                                     name_map=LRP_NAME_MAP_TOY, sample_class=cls,
                                     num_concepts=K, layer_idx=layer_idx)
            RU_r = gen_r.generate_subspace_heatmaps(np.asarray(mels),
                                                    concept_flipping=True)
            s, _ = separability(np.maximum(RU_r, 0))
            seps_rand.append(float(s))
            _, _, c = band_assignment(RU_r, cls)
            covs_rand.append(c)
            divs_rand.append(profile_diversity(RU_r))

        entry = {
            "final_objective": float(res.objectives[best, -1]),
            "assignment": {str(k): v for k, v in assignment.items()},
            "coverage": coverage,
            "diversity": profile_diversity(RU),
            "separability": float(sep_opt),
            "random_separability_mean": float(np.mean(seps_rand)),
            "random_coverage_mean": float(np.mean(covs_rand)),
            "random_diversity_mean": float(np.mean(divs_rand)),
        }
        report["classes"][cls] = entry
        print(cls, json.dumps(entry, indent=2))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {args.out}")


if __name__ == "__main__":
    main()
