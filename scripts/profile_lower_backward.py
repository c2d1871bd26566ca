"""Profiler-trace analysis of the lower LRP backward on the real chip.

Captures a jax.profiler trace of the batch-folded lower backward (the 81 ms
hot stage, ~96% of explain time) and aggregates TPU-device op durations from
the xplane protobuf, grouping ops into convolution / elementwise-fusion /
copy-transpose-reshape buckets. This answers the round-2 VERDICT question:
how much of the stage is MXU conv compute vs layout glue — confirming (or
refuting) the lane-packing bet before the kernel work.

Usage: python scripts/profile_lower_backward.py [--iters 8] [--out docs/...]
"""

import argparse
import collections
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
K = 4
LAYER_IDX = 10


def load_xplane(logdir: str):
    """Parse the newest .xplane.pb under logdir."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    xplane_pb2 = None
    for mod in ("tensorboard_plugin_profile.protobuf.xplane_pb2",
                "tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.tsl.profiler.protobuf.xplane_pb2"):
        try:
            import importlib
            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        raise ImportError("no xplane_pb2 proto module available")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def classify(op_name: str) -> str:
    n = op_name.lower()
    if "conv" in n:
        return "convolution"
    if any(t in n for t in ("transpose", "copy", "reshape", "bitcast")):
        return "copy/transpose/reshape"
    if any(t in n for t in ("fusion", "divide", "multiply", "add", "select",
                            "maximum", "minimum", "compare", "broadcast")):
        return "elementwise/fusion"
    if "reduce" in n or "window" in n:
        return "reduce/pool"
    return "other"


def aggregate_device_ops(space) -> dict:
    """Sum event durations per op on TPU device planes (line = XLA ops)."""
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    device_total_ns = 0
    for plane in space.planes:
        # device planes are named like '/device:TPU:0'; skip host threads
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                meta = ev_names.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                dur = ev.duration_ps // 1000  # ps -> ns
                per_op[name] += dur
                per_bucket[classify(name)] += dur
                device_total_ns += dur
    return {"per_op": per_op, "per_bucket": per_bucket,
            "total_ns": device_total_ns,
            "planes": [p.name for p in space.planes]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["lower", "upper"], default="lower",
                    help="which staged program to trace: the fused lower "
                         "backward (default) or the forward+upper-backward")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--logdir", default="/tmp/lrp_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_3s_config)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel, peak_normalize
    from drsa_audio_tpu.xai.explain import (
        class_composite, explain_forward_upper, explain_lower)
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN

    specs = build_layer_specs(gtzan_3s_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    fe = FrontendConfig.for_case("gtzan")
    U = random_orthogonal(jax.random.PRNGKey(7), 64)
    specs_proj = insert_projection(specs, LAYER_IDX, U, K)
    composite = class_composite(LRP_NAME_MAP_GTZAN, K)

    @jax.jit
    def stage_upper(mels):
        R_f, acts, _ = explain_forward_upper(specs_proj, params, mels,
                                             composite, class_idx=0,
                                             nhwc=True)
        return R_f, acts

    @jax.jit
    def stage_lower(acts, R_f):
        # nhwc=True matches the production subspace_heatmaps default and
        # routes the conv section through the fused Pallas chain
        return explain_lower(specs_proj, params, acts, R_f, composite, K,
                             nhwc=True)

    rng = np.random.default_rng(0)
    wavs = jax.random.normal(jax.random.PRNGKey(0),
                             (BATCH, fe.sample_rate * fe.slice_length),
                             jnp.float32)
    mels = logmel(peak_normalize(wavs), fe)[:, None]
    R_f, acts = stage_upper(mels)

    # the tunnel DEDUPS identical dispatches (BASELINE.md), so every traced/
    # timed call gets its own perturbed input, pre-materialized
    from _tunnel_timing import measure_rpc_floor
    floor_ms = measure_rpc_floor(jax, jnp)
    if args.stage == "upper":
        ins = [jax.block_until_ready(mels * (1.0 + 1e-6 * (i + 1)))
               for i in range(args.iters)]
        runs = [lambda m=m: stage_upper(m) for m in ins]
    else:
        ins = [jax.block_until_ready(R_f * (1.0 + 1e-6 * (i + 1)))
               for i in range(args.iters)]
        runs = [lambda r=r: stage_lower(acts, r) for r in ins]
    out = runs[0]()                       # compile + warm
    jax.block_until_ready(out)

    times = []
    for run in runs:
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    wall_ms = float(np.median(times)) * 1e3 - floor_ms

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for run in runs:
            out = run()
            jax.block_until_ready(out)

    space = load_xplane(args.logdir)
    agg = aggregate_device_ops(space)
    total = agg["total_ns"] or 1
    print(json.dumps({"wall_ms_per_iter": round(wall_ms, 2),
                      "planes": agg["planes"]}))
    print("\n== bucket breakdown (device ns, % of device total) ==")
    for bucket, ns in agg["per_bucket"].most_common():
        print(f"{bucket:28s} {ns/1e6/args.iters:9.3f} ms/iter  {100*ns/total:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for name, ns in agg["per_op"].most_common(args.top):
        print(f"{ns/1e6/args.iters:9.3f} ms/iter  {100*ns/total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
