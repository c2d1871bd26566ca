"""Measure whether JAX's persistent compilation cache survives across
processes on the axon remote-compile platform (VERDICT round-4 #2).

Three questions, answered with wall-clock compile times of a NOVEL program
(novelty via a command-line salt folded into a constant, so neither the
remote-compile service's own cache nor a prior local cache can have seen it):

  1. cold:       fresh program, no local cache        -> baseline compile cost
  2. remote-hot: same program, new process, no cache  -> does the REMOTE
                                                         service cache across
                                                         processes?
  3. local-hot:  same program, new process, WITH
                 jax_compilation_cache_dir            -> does the LOCAL disk
                                                         cache short-circuit
                                                         the remote compile?

Run: python scripts/probe_compile_cache.py            (orchestrates children)
     python scripts/probe_compile_cache.py child <salt> <cache_dir|-> (one leg)
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def child(salt: float, cache_dir: str):
    import jax
    import jax.numpy as jnp

    if cache_dir != "-":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # mid-sized novel program: a few conv layers at bench-like shapes with a
    # salt constant baked in (changes the HLO hash, not the structure)
    @jax.jit
    def f(x, w1, w2):
        y = jax.lax.conv_general_dilated(x, w1, (1, 1), "SAME")
        y = jnp.maximum(y * salt, 0.0)
        y = jax.lax.conv_general_dilated(y, w2, (1, 1), "SAME")
        return jnp.tanh(y).sum()

    x = jnp.ones((32, 8, 128, 128))
    w1 = jnp.ones((16, 8, 3, 3)) * 1e-3
    w2 = jnp.ones((16, 16, 3, 3)) * 1e-3
    t0 = time.perf_counter()
    v = float(f(x, w1, w2))
    dt = time.perf_counter() - t0
    print(json.dumps({"compile_plus_run_s": round(dt, 3), "value": v}))


LEG_TIMEOUT_S = float(os.environ.get("CACHE_PROBE_LEG_TIMEOUT_S", "900"))


def run_leg(name, salt, cache_dir):
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", str(salt),
             cache_dir],
            capture_output=True, text=True, timeout=LEG_TIMEOUT_S)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        try:
            rec = json.loads(line)
        except ValueError:
            rec = {"error": (r.stderr or r.stdout)[-400:]}
    except subprocess.TimeoutExpired:
        # tunnel stall or extreme remote-compile congestion: record it and
        # keep going — later legs may still answer on fresh connections
        rec = {"error": f"leg timed out after {LEG_TIMEOUT_S:.0f}s"}
    rec["leg"] = name
    print(json.dumps(rec), flush=True)
    return rec


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(float(sys.argv[2]), sys.argv[3])
        return
    stamp = int(time.time())
    cache_dir = os.path.join(ROOT, "runs", "jax_cache_probe")
    os.makedirs(cache_dir, exist_ok=True)

    salt_a = 1.0 + (stamp % 100000) * 1e-7          # novel for legs 1-2
    salt_b = 1.0 + ((stamp + 7) % 100000) * 1e-7    # novel for legs 3-4

    legs = [run_leg("cold_nocache", salt_a, "-")]
    if "error" in legs[0]:
        # the tunnel is down or unusably congested: the remaining legs
        # would only burn 3 more timeouts without answering the question
        print(json.dumps({"aborted": "first leg failed; tunnel down?"}))
        return
    legs += [
        run_leg("remote_hot_nocache", salt_a, "-"),
        run_leg("cold_withcache", salt_b, cache_dir),
        run_leg("local_hot_withcache", salt_b, cache_dir),
    ]
    try:
        entries = sum(len(fs) for _, _, fs in os.walk(cache_dir))
    except OSError:
        entries = -1
    print(json.dumps({"summary": {l["leg"]: l.get("compile_plus_run_s")
                                  for l in legs},
                      "cache_entries": entries}, indent=1))


if __name__ == "__main__":
    main()
