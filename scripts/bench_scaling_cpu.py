#!/usr/bin/env python
"""Sharded-explain scaling shape on the virtual CPU mesh (1/2/4/8 devices).

Real multi-chip hardware is unavailable in this container (one v5e chip
through a tunnel), so this measures the POD STORY's mechanics instead of
absolute perf: the fused explain pipeline shard_mapped over an n-device
jax.sharding mesh, with (a) correctness vs the single-device result,
(b) per-device partitioning evidence (each device holds batch/n clips), and
(c) wall clock. The host has ONE physical CPU core, so wall clock cannot
speed up — the curve documents that partitioning adds no materialized
overhead (flat-or-better total time = perfect partition on serialized
hardware).

Round-3 finding this script exposed: under bare GSPMD propagation (jit with
a sharded input, no shard_map) the partitioner hit the LRP engine's
clone-major [K, b] -> [K*b] batch fold — which INTERLEAVES the sharded
axis — gave up, and silently REPLICATED the whole backward on every device
(n-times total work, output replicated). parallel/sharding.py now wraps the
explain/extraction pipelines in jax.shard_map, which runs the unmodified
single-device program on each shard; this script guards the partitioning
(rows_per_device must be batch/n).

Each device count runs in a SUBPROCESS because the virtual-device count is
fixed at backend init (round-2 VERDICT next-round #6).
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, json
n = int(sys.argv[1])
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags +
    f" --xla_force_host_platform_device_count={n}").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, %(root)r)
from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, toy_config
from drsa_audio_tpu.models.projection import insert_projection
from drsa_audio_tpu.ops.frontend import FrontendConfig
from drsa_audio_tpu.parallel.sharding import get_mesh, sharded_explain_pipeline
from drsa_audio_tpu.xai.explain import class_composite
from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_TOY

K, BATCH, ITERS = 4, 64, 3
specs = build_layer_specs(toy_config())
params = init_params(specs, jax.random.PRNGKey(0))
fe = FrontendConfig.for_case("toy")
U = random_orthogonal(jax.random.PRNGKey(3), 16)
specs_proj = insert_projection(specs, 10, U, K)
composite = class_composite(LRP_NAME_MAP_TOY, K)
mesh = get_mesh(n)
explain = sharded_explain_pipeline(specs_proj, params, composite, mesh, K,
                                   class_idx=0, frontend_config=fe)
rng = np.random.default_rng(0)
wavs = rng.standard_normal((BATCH, 16000)).astype(np.float32)
out = explain(wavs)
# partitioning evidence: each device holds BATCH/n clips of the result
shard_rows = {str(s.device) if hasattr(s, 'device') else str(s.devices): s.data.shape[0]
              for s in out.addressable_shards}
heat = np.asarray(out)
t0 = time.perf_counter()
for _ in range(ITERS):
    out = explain(wavs)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / ITERS
print(json.dumps({
    "n_devices": n,
    "wall_ms": round(dt * 1e3, 1),
    "clips_per_sec": round(BATCH / dt, 1),
    "rows_per_device": sorted(set(shard_rows.values())),
    "checksum": float(np.abs(heat).sum()),
}))
"""


def main():
    results = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, "-c", WORKER % {"root": ROOT}, str(n)],
            capture_output=True, text=True, timeout=1800)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"n={n} failed")
        line = out.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        results.append(rec)
        print(line, flush=True)
    # partitioning: each device must hold exactly batch/n rows (a replicated
    # output here is the GSPMD-gives-up failure mode this script exists to
    # catch)
    for r in results:
        expect = 64 // r["n_devices"]
        assert r["rows_per_device"] == [expect], (
            f"n={r['n_devices']}: rows_per_device {r['rows_per_device']} != "
            f"[{expect}] — pipeline is replicating, not partitioning")
    # correctness: identical result under every partitioning
    sums = {r["checksum"] for r in results}
    ref = results[0]["checksum"]
    assert all(abs(s - ref) / abs(ref) < 1e-4 for s in sums), sums
    print("sharded results identical across 1/2/4/8 devices "
          f"(checksum {ref:.6g})")


if __name__ == "__main__":
    main()
