"""Device-mesh sharding for dataset-scale pipelines.

The reference is single-process single-device (SURVEY.md §2.11). Here the
parallel axis is the DATA (clips / chunks / classes): every pipeline —
training, attribution, DRSA extraction, pixel flipping — is a pure jitted
program over a batch axis, so scaling out is one ``jax.sharding`` annotation:
XLA partitions the program and inserts the ICI collectives (psum for loss/
grad reductions) automatically. No TP/PP is warranted for a ~5M-param CNN.

Works identically on a real TPU slice and on the virtual
``xla_force_host_platform_device_count`` CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Place an array with its leading axis split across the mesh."""
    spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P())), x)


def pad_to_multiple(x: np.ndarray, multiple: int):
    """Pad the batch axis up to a multiple (for even sharding); returns
    (padded, original_len)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        pad = np.zeros((rem,) + x.shape[1:], x.dtype)
        x = np.concatenate([x, pad], axis=0)
    return x, n


def _pad_batch_jnp(x: jnp.ndarray, multiple: int):
    """jnp variant of pad_to_multiple (no host round-trip for device-resident
    inputs); returns (padded, pad_rows). shard_map requires the 'data' axis
    to divide the mesh evenly — the wrappers below zero-pad a ragged last
    batch (e.g. a truncated final extraction chunk) and slice the pad rows
    off the output, so they accept any batch size like the pre-shard_map
    GSPMD versions did."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        x = jnp.concatenate(
            [x, jnp.zeros((rem,) + x.shape[1:], x.dtype)], axis=0)
    return x, rem


def sharded_heatmaps(specs, params, composite, mesh: Mesh, class_idx: int):
    """Build a mesh-sharded standard-heatmap program: input batch sharded on
    'data', params replicated; returns the jitted fn.

    Uses ``jax.shard_map`` (not bare GSPMD propagation): attribution is
    embarrassingly parallel over clips, and the LRP engine's clone-major
    ``[K, b] -> [K*b]`` batch fold interleaves the sharded axis, which makes
    the GSPMD partitioner give up and REPLICATE the whole backward on every
    device (measured: n-times total work on the virtual mesh, round-3
    scripts/bench_scaling_cpu.py). shard_map runs the unmodified single-
    device program on each local shard — no collectives are needed."""
    from drsa_audio_tpu.xai.lrp.engine import lrp, output_mask_class

    in_sharding = NamedSharding(mesh, P("data", None, None, None))

    def run(x):
        R, logits, _ = lrp(specs, params, x, composite,
                           output_mask_class(class_idx))
        return R

    sharded = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=P("data", None, None, None),
        out_specs=P("data", None, None, None), check_vma=False))

    def call(x):
        x, pad = _pad_batch_jnp(jnp.asarray(x), mesh.size)
        out = sharded(jax.device_put(x, in_sharding))
        return out[:-pad] if pad else out

    return call


def sharded_explain_pipeline(specs_proj, params, composite, mesh: Mesh,
                             num_concepts: int, class_idx: int,
                             frontend_config=None):
    """The fused clip -> mel -> subspace-heatmaps program, batch-sharded
    via ``jax.shard_map`` (see sharded_heatmaps for why not bare GSPMD).

    If frontend_config is given the input is raw waveforms [b, T]; otherwise
    precomputed mels [b, 1, h, w].
    """
    from drsa_audio_tpu.xai.explain import subspace_heatmaps
    from drsa_audio_tpu.ops.frontend import logmel, peak_normalize

    def run(x):
        if frontend_config is not None:
            x = peak_normalize(x)
            x = logmel(x, frontend_config)[:, None]
        heat, logits = subspace_heatmaps(
            specs_proj, params, x, composite, num_concepts,
            class_idx=class_idx)
        return heat

    ndim = 2 if frontend_config is not None else 4
    in_spec = P("data", *([None] * (ndim - 1)))
    in_sharding = NamedSharding(mesh, in_spec)
    sharded = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=in_spec,
        out_specs=P("data", None, None, None), check_vma=False))

    def call(x):
        x, pad = _pad_batch_jnp(jnp.asarray(x), mesh.size)
        out = sharded(jax.device_put(x, in_sharding))
        return out[:-pad] if pad else out

    return call


def sharded_drsa_extraction(specs, params, composite, mesh: Mesh,
                            layer_idx: int, class_idx: int,
                            num_locations: int | None = None):
    """Batch-sharded act/ctx vector extraction (the getdrsadata hot loop),
    via ``jax.shard_map`` (see sharded_heatmaps for why not bare GSPMD).
    The per-clip location-sampling keys are split GLOBALLY and sharded with
    the data, so results are bit-equal to the single-device run at any mesh
    size."""
    from drsa_audio_tpu.xai.drsa.preprocessing import preprocess_data

    def run(x, clip_keys):
        return preprocess_data(specs, params, x, composite, layer_idx,
                               class_idx, num_locations=num_locations,
                               clip_keys=clip_keys)

    in_sharding = NamedSharding(mesh, P("data", None, None, None))
    key_sharding = NamedSharding(mesh, P("data", None))
    sharded = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=(P("data", None, None, None), P("data", None)),
        out_specs=P("data"), check_vma=False))

    def call(x, key):
        x = jnp.asarray(x)
        n = x.shape[0]
        # keys are split for the ORIGINAL batch (bit-equality with the
        # single-device run), then zero-padded alongside the data rows
        clip_keys = jax.random.split(key, n)
        x, pad = _pad_batch_jnp(x, mesh.size)
        if pad:
            clip_keys = jnp.concatenate(
                [clip_keys,
                 jnp.zeros((pad,) + clip_keys.shape[1:], clip_keys.dtype)])
        act, ctx = sharded(jax.device_put(x, in_sharding),
                           jax.device_put(clip_keys, key_sharding))
        if pad:
            keep = n * num_locations if num_locations else n
            act, ctx = act[:keep], ctx[:keep]
        return act, ctx

    return call


def make_sharded_train_step(specs, optimizer, mesh: Mesh,
                            per_example_mel=None, has_bn: bool = False):
    """Data-parallel train step: batch sharded on 'data', params replicated.
    XLA inserts the gradient all-reduce (the loss is a global mean)."""
    from drsa_audio_tpu.models.train import make_train_step

    step = make_train_step(specs, optimizer, per_example_mel, has_bn)
    batch_ndim = 2 if per_example_mel is not None else 4
    batch_sharding = NamedSharding(mesh, P("data", *([None] * (batch_ndim - 1))))
    label_sharding = NamedSharding(mesh, P("data"))

    def sharded_step(trainable, state, opt_state, batch, labels, key):
        batch = jax.device_put(jnp.asarray(batch), batch_sharding)
        labels = jax.device_put(jnp.asarray(labels), label_sharding)
        return step(trainable, state, opt_state, batch, labels, key)

    return sharded_step


def distributed_init(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host initialization (jax.distributed) for pod-scale runs over
    DCN; no-op on a single host.

    Exercised for real by tests/test_multiprocess.py: two processes x four
    virtual CPU devices form one 8-device global mesh and run the sharded
    train step with per-process local data."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def global_from_local(local, mesh: Mesh, global_batch: int,
                      axis_name: str = "data"):
    """Multi-host input pipeline primitive: assemble the GLOBAL batch-sharded
    array from this process's LOCAL shard (each host feeds only the rows its
    devices own — ``jax.make_array_from_process_local_data``). On a single
    process this is equivalent to ``shard_batch``."""
    local = np.asarray(local)
    spec = P(axis_name, *([None] * (local.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local,
        global_shape=(global_batch,) + local.shape[1:])
