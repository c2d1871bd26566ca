#!/usr/bin/env python
"""Extract DRSA training data (act/ctx vectors) per class x layer.

Reference cxai/xai/drsa/cluster/getdrsadata.py:63-141, mesh-sharded over the
clip batch. Saves .npz per class/layer instead of pickles.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="ExperimentConfig JSON")
    ap.add_argument("--case", choices=["gtzan", "gtzan_6s", "toy"], default="toy")
    ap.add_argument("--data", required=True)
    ap.add_argument("--checkpoint", required=True, help="orbax ckpt dir")
    ap.add_argument("--epoch", type=int, help="default: latest ckpt")
    ap.add_argument("--out", required=True)
    ap.add_argument("--layers", type=int, nargs="+")
    ap.add_argument("--num-locations", type=int, default=20)
    ap.add_argument("--num-clips", type=int,
                    help="truncate each class's chunk batch to N clips "
                         "(reference budget: 300 clips x 20 locations = "
                         "6000 vectors per class-layer)")
    ap.add_argument("--gamma", type=float,
                    help="rescale the case name map's gamma rules to this "
                         "base value (decay pattern preserved)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.utils.config import ExperimentConfig
    from drsa_audio_tpu.models.vgg import build_layer_specs, fold_batchnorm
    from drsa_audio_tpu.models.train import load_checkpoint, merge_params
    from drsa_audio_tpu.xai.lrp.engine import Composite
    from drsa_audio_tpu.xai.drsa.preprocessing import preprocess_data
    from drsa_audio_tpu.data.datasets import get_songs_drsa, get_songs_toy
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
    layers = args.layers or list(cfg.drsa.layer_idcs)

    ckpt = load_checkpoint(args.checkpoint, args.epoch)
    params = merge_params(ckpt["trainable"], ckpt.get("state") or {})
    specs = build_layer_specs(cfg.vgg_config())
    specs, params = fold_batchnorm(specs, params)
    name_map = cfg.lrp_name_map
    if args.gamma is not None:
        from drsa_audio_tpu.utils.constants import rescale_gamma
        name_map = rescale_gamma(name_map, args.gamma)
    composite = Composite.from_list(name_map)

    mapper = CLASS_IDX_MAPPER_TOY if cfg.case == "toy" else CLASS_IDX_MAPPER
    key = jax.random.PRNGKey(cfg.drsa.seed)
    # one compiled class-traced extraction program per layer (3 compiles for
    # the 10-class x 3-layer flagship sweep instead of 30 eager LRP walks)
    from drsa_audio_tpu.xai.drsa.preprocessing import make_extract_fn
    extract_fns = {li: make_extract_fn(specs, params, composite, li)
                   for li in layers}
    for cls, class_idx in mapper.items():
        if cfg.case != "toy":
            n_songs = (-(-args.num_clips // cfg.drsa.chunks_per_song)
                       if args.num_clips else None)
            batch, _, _ = get_songs_drsa(
                args.data, cls, excluded_folds=[cfg.train.validation_fold],
                N=args.num_clips, num_songs=n_songs,
                num_chunks=cfg.drsa.chunks_per_song, case=cfg.case)
        else:
            batch, _ = get_songs_toy(args.data, cls)
        for layer_idx in layers:
            key, sub = jax.random.split(key)
            t_pair = time.perf_counter()
            act, ctx = preprocess_data(
                specs, params, jnp.asarray(batch), composite, layer_idx,
                class_idx, num_locations=args.num_locations, key=sub,
                extract_fn=extract_fns[layer_idx])
            act = np.asarray(act)  # D2H pull = sync (tunnel ack semantics)
            dt = time.perf_counter() - t_pair
            out_dir = os.path.join(args.out, cls)
            os.makedirs(out_dir, exist_ok=True)
            np.savez(os.path.join(out_dir, f"dataset_layer{layer_idx}.npz"),
                     activations=act, contexts=np.asarray(ctx))
            # per-pair wall: the first pair per layer includes the compile;
            # steady state = the later pairs (VERDICT r4 #7)
            print(f"{cls} layer {layer_idx}: {act.shape} "
                  f"[{dt:.1f}s, {len(batch) / dt:.1f} clips/s]")


if __name__ == "__main__":
    main()
