"""Experimental LRP output-head transforms.

Functional equivalents of the reference's unused-but-present modules
(cxai/model/modify_model.py:128-165): the differential-logit layer (pairwise
logit differences) and the reverse log-sum-exp trick from the LRP overview
paper (Montavon et al. 2017) for attributing log-probability ratios.
"""

from __future__ import annotations

import jax.numpy as jnp


def differential_logits(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray):
    """Pairwise log-probability ratios from the final linear layer.

    Replaces the last Linear(w [C, F], b [C]): out[n, j, k] =
    x @ (w_j - w_k) + (b_j - b_k) (modify_model.py:128-145).
    """
    wd = w.T[:, :, None] - w.T[:, None, :]     # [F, C, C]: w_j - w_k
    bd = b[:, None] - b[None, :]               # [C, C]: b_j - b_k
    return jnp.einsum("nf,fjk->njk", x, wd) + bd[None]


def reverse_logsumexp(x: jnp.ndarray) -> jnp.ndarray:
    """-log sum_{c' != c} exp(-x[..., c, c']) (modify_model.py:148-165):
    turns differential logits into the log-ratio output used by the LRP
    log-ratio trick."""
    expd = jnp.exp(-x)
    mask = 1.0 - jnp.eye(x.shape[-1], dtype=x.dtype)
    expd = expd * mask
    return -jnp.log(jnp.sum(expd, axis=-1))
