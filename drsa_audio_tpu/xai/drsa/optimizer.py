"""DRSA subspace optimization: projected gradient ascent on orthogonal U.

TPU-native redesign of the reference SubspaceOptimizer
(cxai/xai/drsa/drsa.py:15-238):

  * the optimization loop is a ``lax.scan`` — one compiled program for all
    steps instead of 5000 Python iterations;
  * restarts (and classes x layers, see ``drsa_fit_batched``) are ``vmap``-ed —
    the reference's 90 sequential runs become one batched program;
  * orthogonalization U <- U (U^T U)^{-1/2} runs on-device: either Newton–
    Schulz iteration (pure matmuls, rides the MXU; default) or ``jnp.linalg.
    eigh`` (the reference hosts this in float64 on CPU — drsa.py:201-221).

Objective (drsa.py:122-155, 171-182, 224-238): project activations and
contexts through U, elementwise product summed per d_k block, ReLU ->
per-sample per-concept relevance; generalized F-mean with p=2 over samples
("soft-max") then p=0.5 over concepts ("soft-min").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def generalized_fmean(x: jnp.ndarray, p: float, axis: int = 0) -> jnp.ndarray:
    """(mean(x^p))^(1/p) (reference drsa.py:171-182)."""
    return jnp.mean(x**p, axis=axis) ** (1.0 / p)


def objective_fn(rel: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Soft-max over datapoints (p=2), soft-min over concepts (p=0.5).

    rel: [batch, num_concepts] non-negative relevances.
    mask: optional [batch] validity weights — padded rows are excluded from
    the datapoint mean (used by ``drsa_fit_batched`` where pairs with
    different N are padded to a common length).
    """
    if mask is None:
        x = generalized_fmean(rel, 2.0, axis=0)
    else:
        m = mask.astype(rel.dtype)[:, None]
        x = jnp.sqrt(jnp.sum(rel**2 * m, axis=0) / jnp.sum(m))
    return generalized_fmean(x, 0.5, axis=0)


def subspace_relevances(act_vecs, ctx_vecs, U, num_concepts: int):
    """[batch, num_concepts] ReLU'd per-concept relevance (drsa.py:122-155)."""
    d = U.shape[0]
    d_k = d // num_concepts
    xa = jnp.matmul(act_vecs, U, preferred_element_type=jnp.float32)
    xc = jnp.matmul(ctx_vecs, U, preferred_element_type=jnp.float32)
    x = (xa * xc).reshape(-1, num_concepts, d_k)
    return jax.nn.relu(jnp.sum(x, axis=-1))


def obj_val(act_vecs, ctx_vecs, U, num_concepts: int, mask=None):
    return objective_fn(
        subspace_relevances(act_vecs, ctx_vecs, U, num_concepts), mask)


def project_grad(gradient: jnp.ndarray, U: jnp.ndarray) -> jnp.ndarray:
    """Project the gradient onto the tangent of the orthogonal constraint
    (reference drsa.py:185-198; unused by the default update rule, provided
    for Riemannian-ascent experiments)."""
    return gradient - U.T @ gradient @ U.T


def orthogonalize_eigh(U: jnp.ndarray) -> jnp.ndarray:
    """U (U^T U)^{-1/2} via symmetric eigendecomposition (drsa.py:201-221)."""
    UtU = U.T @ U
    S, V = jnp.linalg.eigh(UtU)
    inv_sqrt = (V * (1.0 / jnp.sqrt(S))[None, :]) @ V.T
    return U @ inv_sqrt


def orthogonalize_ns(U: jnp.ndarray, iterations: int = 24) -> jnp.ndarray:
    """U (U^T U)^{-1/2} via Newton–Schulz iteration — matmuls only (MXU).

    Scaled so the iteration converges: Y_0 = A / ||A||_F with A = U^T U;
    Y_{k+1} = Y_k (3I - Z Y_k)/2 style coupled iteration computing A^{-1/2}.
    """
    d = U.shape[0]
    A = U.T @ U
    norm = jnp.sqrt(jnp.sum(A * A))
    Y = A / norm
    Z = jnp.eye(d, dtype=U.dtype)
    I = jnp.eye(d, dtype=U.dtype)

    def body(_, carry):
        Y, Z = carry
        T = 0.5 * (3.0 * I - Z @ Y)
        return (Y @ T, T @ Z)

    Y, Z = jax.lax.fori_loop(0, iterations, body, (Y, Z))
    # Z approx A^{-1/2} * sqrt(norm); undo the scaling
    inv_sqrt = Z / jnp.sqrt(norm)
    return U @ inv_sqrt


class DRSAResult(NamedTuple):
    U: jnp.ndarray               # [runs, d, d] final projection matrices
    objectives: jnp.ndarray      # [runs, steps+1] objective trajectory
    best_run: jnp.ndarray        # scalar int: argmax of final objective


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def drsa_fit(
    U0: jnp.ndarray,             # [runs, d, d] initial orthogonal matrices
    act_vecs: jnp.ndarray,       # [N, d]
    ctx_vecs: jnp.ndarray,       # [N, d]
    num_concepts: int,
    steps: int = 2000,
    ortho_method: str = "ns",
) -> DRSAResult:
    """Run ``runs`` restarts of projected gradient ascent, vmapped.

    Update rule (reference drsa.py:102): U <- orthogonalize(U + dObj/dU),
    i.e. plain gradient step with LR 1 followed by re-orthogonalization.
    """
    ortho = orthogonalize_ns if ortho_method == "ns" else orthogonalize_eigh
    value_and_grad = jax.value_and_grad(
        lambda U: obj_val(act_vecs, ctx_vecs, U, num_concepts))

    def one_run(U_init):
        def step_fn(U, _):
            obj, g = value_and_grad(U)
            U_new = ortho(U + g)
            return U_new, obj

        U_final, objs = jax.lax.scan(step_fn, U_init, None, length=steps)
        final_obj = obj_val(act_vecs, ctx_vecs, U_final, num_concepts)
        return U_final, jnp.concatenate([objs, final_obj[None]])

    U_final, objectives = jax.vmap(one_run)(U0)
    best = jnp.argmax(objectives[:, -1])
    return DRSAResult(U_final, objectives, best)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def drsa_fit_batched(
    U0: jnp.ndarray,             # [pairs, runs, d, d]
    act_vecs: jnp.ndarray,       # [pairs, N_max, d] (zero-padded)
    ctx_vecs: jnp.ndarray,       # [pairs, N_max, d]
    mask: jnp.ndarray,           # [pairs, N_max] validity (1 = real row)
    num_concepts: int,
    steps: int = 2000,
    ortho_method: str = "ns",
) -> DRSAResult:
    """The full class x layer sweep as ONE compiled program.

    The reference runs 30 sequential optimizations (10 classes x 3 layers,
    optsubspaces.py:8-64); here every pair with the same d is vmapped together
    (classes at one layer share d — pairs across layers with different d are
    grouped by the caller), restarts vmapped inside, the step loop a single
    lax.scan. Pairs with fewer datapoints are zero-padded to N_max and
    excluded from the objective's datapoint mean via ``mask``.

    Returns a DRSAResult with leading [pairs] axis (best_run is [pairs])."""
    ortho = orthogonalize_ns if ortho_method == "ns" else orthogonalize_eigh

    def one_pair(U0_runs, A, C, m):
        value_and_grad = jax.value_and_grad(
            lambda U: obj_val(A, C, U, num_concepts, m))

        def one_run(U_init):
            def step_fn(U, _):
                obj, g = value_and_grad(U)
                return ortho(U + g), obj

            U_final, objs = jax.lax.scan(step_fn, U_init, None, length=steps)
            final_obj = obj_val(A, C, U_final, num_concepts, m)
            return U_final, jnp.concatenate([objs, final_obj[None]])

        U_final, objectives = jax.vmap(one_run)(U0_runs)
        return U_final, objectives

    U_final, objectives = jax.vmap(one_pair)(U0, act_vecs, ctx_vecs, mask)
    best = jnp.argmax(objectives[:, :, -1], axis=1)
    return DRSAResult(U_final, objectives, best)


def fit_batched(
    datasets,                    # list of (act [N_i, d], ctx [N_i, d])
    num_concepts: int = 4,
    steps: int = 2000,
    runs: int = 3,
    seed: int = 42,
    ortho_method: str = "ns",
) -> DRSAResult:
    """Pad a list of same-d datasets to a common N and run drsa_fit_batched.

    Seeding matches the sequential ``fit`` exactly — every pair uses
    PRNGKey(seed) (the reference passes one seed to every drsa.main call,
    optsubspaces.py:22-23) — so batched results equal per-pair results."""
    d = np.shape(datasets[0][0])[-1]
    # flatten any leading structure ([N, L, d] location-sampled extracts ->
    # [N*L, d] rows), exactly as the sequential ``fit`` does
    flat = [(np.asarray(a, np.float32).reshape(-1, d),
             np.asarray(c, np.float32).reshape(-1, d)) for a, c in datasets]
    n_max = max(a.shape[0] for a, _ in flat)
    P = len(flat)
    A = np.zeros((P, n_max, d), np.float32)
    C = np.zeros((P, n_max, d), np.float32)
    M = np.zeros((P, n_max), np.float32)
    for i, (a, c) in enumerate(flat):
        n = a.shape[0]
        A[i, :n] = a
        C[i, :n] = c
        M[i, :n] = 1.0
    U0 = jnp.broadcast_to(init_runs(jax.random.PRNGKey(seed), d, runs),
                          (P, runs, d, d))
    return drsa_fit_batched(U0, jnp.asarray(A), jnp.asarray(C),
                            jnp.asarray(M), num_concepts, steps, ortho_method)


def random_orthogonal(key: jax.Array, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """Haar-ish random orthogonal matrix via QR of a Gaussian (replaces
    scipy.stats.ortho_group.rvs, reference drsa.py:272)."""
    g = jax.random.normal(key, (d, d), dtype=jnp.float32)
    q, r = jnp.linalg.qr(g)
    # sign-fix for a unique decomposition
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    return q.astype(dtype)


def init_runs(key: jax.Array, d: int, runs: int = 3) -> jnp.ndarray:
    """One random orthogonal matrix, column-permuted per run
    (reference drsa.py:270-285)."""
    kq, *kperms = jax.random.split(key, runs + 1)
    U = random_orthogonal(kq, d)
    Us = []
    for kp in kperms:
        perm = jax.random.permutation(kp, d)
        Us.append(U[:, perm])
    return jnp.stack(Us)


def fit(
    act_vecs,
    ctx_vecs,
    num_concepts: int = 4,
    steps: int = 2000,
    runs: int = 3,
    seed: int = 42,
    ortho_method: str = "ns",
) -> DRSAResult:
    """drsa.main equivalent (reference drsa.py:241-301): multi-restart
    optimization, returns all runs + the best one."""
    act_vecs = jnp.asarray(act_vecs, jnp.float32).reshape(-1, np.shape(act_vecs)[-1])
    ctx_vecs = jnp.asarray(ctx_vecs, jnp.float32).reshape(-1, np.shape(ctx_vecs)[-1])
    d = act_vecs.shape[-1]
    U0 = init_runs(jax.random.PRNGKey(seed), d, runs)
    return drsa_fit(U0, act_vecs, ctx_vecs, num_concepts, steps, ortho_method)
