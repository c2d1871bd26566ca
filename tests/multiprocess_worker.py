"""Worker for tests/test_multiprocess.py: one of N processes in a
jax.distributed CPU 'pod' (4 virtual devices per process).

Runs the framework's real multi-host path (SURVEY.md §5.8): distributed
init -> global mesh over all processes' devices -> per-process local input
shards assembled with ``global_from_local`` -> the sharded data-parallel
train step (gradient all-reduce over DCN/Gloo) -> replicated params
verified identical to a single-process run of the same step.

Invoked as: python multiprocess_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import optax


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from drsa_audio_tpu.parallel.sharding import (
        distributed_init, get_mesh, global_from_local, replicate)
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, toy_config
    from drsa_audio_tpu.models.train import make_train_step, split_trainable

    distributed_init(f"localhost:{port}", num_processes=nproc, process_id=pid)
    n_local = jax.local_device_count()
    assert jax.device_count() == nproc * n_local, jax.device_count()

    specs = build_layer_specs(toy_config())
    params = init_params(specs, jax.random.PRNGKey(0))  # same seed everywhere
    trainable, state = split_trainable(params)
    optimizer = optax.sgd(1e-2, momentum=0.9)
    opt_state = optimizer.init(trainable)
    step = make_train_step(specs, optimizer, has_bn=False)

    mesh = get_mesh()
    global_batch = jax.device_count()  # one mel per device
    rng = np.random.default_rng(7)
    full = rng.standard_normal((global_batch, 1, 64, 64)).astype(np.float32)
    labels_full = (np.arange(global_batch) % 2).astype(np.int32)

    # each process feeds ONLY the rows its local devices own
    lo, hi = pid * n_local, (pid + 1) * n_local
    batch = global_from_local(full[lo:hi], mesh, global_batch)
    labels = global_from_local(labels_full[lo:hi], mesh, global_batch)
    trainable_r = replicate(trainable, mesh)
    state_r = replicate(state, mesh)
    opt_state_r = replicate(opt_state, mesh)
    key = jax.random.PRNGKey(3)

    new_trainable, _, _, loss, acc = step(
        trainable_r, state_r, opt_state_r, batch, labels, key)

    # reference: the same step single-host on this process's devices only
    ref_trainable, _, _, ref_loss, _ = step(
        trainable, state, opt_state, jnp.asarray(full),
        jnp.asarray(labels_full), key)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for name in new_trainable:
        for k in new_trainable[name]:
            # replicated output: any addressable shard IS the full value
            got = np.asarray(new_trainable[name][k].addressable_shards[0].data)
            want = np.asarray(ref_trainable[name][k])
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    print(f"proc {pid} OK loss={float(loss):.5f}", flush=True)


if __name__ == "__main__":
    main()
