#!/usr/bin/env python
"""End-to-end demo on the synthetic toy set (the reference's promised-but-
missing notebooks, README.md:37): generate data in memory, train, explain,
optimize DRSA subspaces, evaluate, and save plots + explanation audios.

Run: python scripts/demo_toy_workflow.py --out demo_out [--per-class 160]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--per-class", type=int, default=160)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--num-concepts", type=int, default=2)
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

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
    from drsa_audio_tpu.xai.drsa.optimizer import fit as drsa_fit
    from drsa_audio_tpu.xai.eval.harness import concept_flipping
    from drsa_audio_tpu.xai.sonify.mel2audio import Mel2Audio
    from drsa_audio_tpu.runtime.wavio import write_wav
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY
    from drsa_audio_tpu.utils import visualization as viz
    from drsa_audio_tpu.utils.profiling import PhaseTimer

    timer = PhaseTimer()
    fe = FrontendConfig.for_case("toy")
    rng = np.random.default_rng(0)
    K, layer_idx = args.num_concepts, 10

    with timer.phase("generate"):
        wavs = np.concatenate([generate_batch(rng, "class1", args.per_class),
                               generate_batch(rng, "class2", args.per_class)])
        labels = np.concatenate([np.zeros(args.per_class),
                                 np.ones(args.per_class)]).astype(np.int32)

    with timer.phase("train"):
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
            for i in range(0, len(order), 32):
                sel = order[i:i + 32]
                key, sub = jax.random.split(key)
                trainable, state, opt_state, loss, acc = step(
                    trainable, state, opt_state, jnp.asarray(wavs[sel]),
                    jnp.asarray(labels[sel]), sub)
        params = merge_params(trainable, state)
        print(f"final train loss {float(loss):.4f} acc {float(acc):.3f}")

    mel_fn = lambda w: toy_augment_and_mel(w, jax.random.PRNGKey(0), fe, False, False)
    composite = Composite.from_list(LRP_NAME_MAP_TOY)

    with timer.phase("drsa_data"):
        x1 = generate_batch(np.random.default_rng(7), "class1", 64,
                            concept_idcs=(1, 2, 3, 4))
        mels1 = jax.vmap(mel_fn)(jnp.asarray(x1))
        act, ctx = preprocess_data(specs, params, mels1, composite, layer_idx,
                                   class_idx=0, num_locations=16,
                                   key=jax.random.PRNGKey(3))

    with timer.phase("drsa_fit"):
        res = drsa_fit(np.asarray(normalize_vectors(act)),
                       np.asarray(normalize_vectors(ctx)),
                       num_concepts=K, steps=args.steps, runs=3, seed=0)
        best = int(res.best_run)
        U = np.asarray(res.U[best])
        print(f"DRSA best run {best + 1}, objective "
              f"{float(res.objectives[best, -1]):.4f}")
        viz.plot_drsa_objective(np.asarray(res.objectives)).figure.savefig(
            os.path.join(args.out, "drsa_objective.png"), dpi=120)

    with timer.phase("explain"):
        gen = HeatmapGenerator(specs=specs, params=params, U=U,
                               name_map=LRP_NAME_MAP_TOY, sample_class="class1",
                               num_concepts=K, layer_idx=layer_idx)
        gen.generate_subspace_heatmaps(np.asarray(mels1[:8]))
        info = gen.info
        fig = viz.make_drsa_subplot(
            np.asarray(mels1[0, 0]), info["standard_heatmaps"][0, 0],
            [info["subspace_heatmaps"][0, k] for k in range(K)], case="toy",
            suptitle="class1 sample: standard + subspace explanations")
        fig.savefig(os.path.join(args.out, "explanations.png"), dpi=120)

    with timer.phase("concept_recovery"):
        from drsa_audio_tpu.xai.eval.concept_recovery import (
            band_assignment, profile_diversity,
        )
        RU = gen.generate_subspace_heatmaps(np.asarray(mels1),
                                            concept_flipping=True)
        shares, assignment, coverage = band_assignment(RU, "class1")
        print(f"subspace->concept band assignment: {assignment} "
              f"(coverage {coverage}/{K}; diversity "
              f"{profile_diversity(RU):.3f})")

    with timer.phase("flipping"):
        x2 = generate_batch(np.random.default_rng(8), "class2", 8,
                            concept_idcs=(1, 2, 3, 4))
        mels2 = jax.vmap(mel_fn)(jnp.asarray(x2))
        batch = np.concatenate([np.asarray(mels1[:8]), np.asarray(mels2)])
        aupc, mean_logits, flips, _ = concept_flipping(
            specs, params, batch, LRP_NAME_MAP_TOY, layer_idx,
            Us={"class1": U, "class2": U}, num_concepts=K, case="toy",
            perturbation_size=16)
        print(f"concept-flipping AUPC (lower = better): {aupc.mean():.4f}")
        viz.plot_aupcs({"drsa": aupc}, {"drsa": mean_logits}, flips).savefig(
            os.path.join(args.out, "aupc.png"), dpi=120)

    with timer.phase("sonify"):
        m2a = Mel2Audio(case="toy", nnls_iters=80)
        audios = m2a.make_audios(info, x1[0], num_concepts=K)
        write_wav(os.path.join(args.out, "original.wav"),
                  x1[0][None], fe.sample_rate)
        write_wav(os.path.join(args.out, "explanation_standard.wav"),
                  audios[0][None], fe.sample_rate)
        for k in range(K):
            write_wav(os.path.join(args.out, f"explanation_concept{k + 1}.wav"),
                      audios[k + 1][None], fe.sample_rate)

    print()
    print(timer.summary())
    print(f"\nartifacts in {args.out}/")


if __name__ == "__main__":
    main()
