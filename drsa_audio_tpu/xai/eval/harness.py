"""Pixel-flipping and concept-flipping experiment harnesses.

Re-implements the reference PixelFlipping sweep (cxai/xai/pixelflipping/
pf.py:29-412) and the concept-level evaluations (cpf.py:20-395) on top of the
jittable Flipper.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drsa_audio_tpu.models.vgg import LayerSpec, forward
from drsa_audio_tpu.xai.lrp.engine import (
    Composite, layer_map_composite,
)
from drsa_audio_tpu.xai.explain import HeatmapGenerator
from drsa_audio_tpu.xai.eval.flipping import Flipper
from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
from drsa_audio_tpu.utils.constants import CLASS_IDX_MAPPER, CLASS_IDX_MAPPER_TOY


def make_rule(kind: str, value=None, stabilizer: float = 1e-7):
    """Rule-spec factory mirroring the reference rule_mapper (pf.py:18-27,
    257-292): gamma takes gamma=value, epsilon takes epsilon=value, alphabeta
    derives beta = alpha - 1."""
    if kind == "gamma":
        return ("gamma", {"gamma": value, "stabilizer": stabilizer})
    if kind == "epsilon":
        return ("epsilon", {"epsilon": value if value is not None else 1e-6})
    if kind == "alphabeta":
        return ("alphabeta", {"alpha": value, "beta": value - 1.0,
                              "stabilizer": stabilizer})
    return (kind, {"stabilizer": stabilizer})


def configuration_name(conf: Dict[str, Tuple]) -> str:
    """String key for a configuration (pf.py:294-310)."""
    out = ""
    for key, spec in conf.items():
        kind = spec[0]
        if kind == "alphabeta":
            out += "alpha_%3.1f_beta_%3.1f" % (spec[1], spec[1] - 1.0)
        elif kind == "zplus":
            out += kind + "_"
        elif key == "first_layer":
            out += kind
        else:
            out += f"{kind}_{spec[1]}_"
    return out


def scaled_gamma_name_map(specs: Sequence[LayerSpec], gamma: float,
                          eps: float = 1e-7, first_layer: str = "wsquare"):
    """'Scaled gamma' composite: full gamma on blocks 1-3, gamma/2 on
    block 4, gamma/4 on block 5+, epsilon on dense (pf.py:336-412; the
    reference hard-codes per-layer maps for its 1-conv-per-block nets —
    assignment here is per BLOCK, delimited by maxpools, so depth-2 blocks
    get the same decay schedule)."""
    conv_names = []  # (name, block_idx)
    block = 0
    for s in specs:
        if s.kind == "conv":
            conv_names.append((s.name, block))
        elif s.kind == "maxpool":
            block += 1
    dense_names = [s.name for s in specs if s.kind == "linear"]
    block_gamma = [gamma, gamma, gamma, gamma / 2, gamma / 4]
    name_map = [(conv_names[0][0], make_rule(first_layer))]
    for name, blk in conv_names[1:]:
        g = block_gamma[min(blk, len(block_gamma) - 1)]
        name_map.append((name, make_rule("gamma", g)))
    for name in dense_names:
        name_map.append((name, make_rule("epsilon", eps)))
    return name_map


class PixelFlipping:
    """Sweep LRP configurations and pixel-flip each (pf.py:29-196)."""

    def __init__(self, specs, params, input_batch, perturbation_size: int = 8,
                 perturbation_mode: str = "constant", num_classes: int = 10,
                 data_normalization: str = "normalized", forward_batch: int = 0,
                 attr_batch_size: int = 0):
        self.specs = specs
        self.params = params
        self.input_batch = jnp.asarray(input_batch)
        self.num_classes = num_classes
        self.samples_per_class = self.input_batch.shape[0] // num_classes
        self.attr_batch_size = attr_batch_size
        self.flipper = Flipper(perturbation_size, perturbation_mode,
                               data_normalization, forward_batch)
        self._fwd = jax.jit(lambda x: forward(specs, params, x))
        self.aupc_scores: dict = {}
        self.averaged_pertubed_prediction_logits: dict = {}
        self.heatmaps: dict = {}

    def _composite_for(self, conf: Dict[str, Tuple], scaled_gamma=False):
        if scaled_gamma:
            nm = scaled_gamma_name_map(
                self.specs, conf["convolutional"][1], conf["dense"][1],
                first_layer=conf["first_layer"][0])
            return Composite.from_list(nm)
        return layer_map_composite(
            self.specs,
            conv_rule=make_rule(*conf["convolutional"]),
            dense_rule=make_rule(*conf["dense"]),
            first_layer_rule=make_rule(*conf["first_layer"]),
        )

    def _attr_programs(self, key, composite):
        """Per-configuration compiled attribution programs (the LRP walk is
        tracing code; eager it dispatches op-by-op). The single-class program
        traces the class one-hot so the per-class chunk loop shares it.
        ``key`` must capture everything that shapes the composite — the
        configuration name AND the scaled_gamma mode (the same conf name
        maps to a different composite under scaled_gamma)."""
        if not hasattr(self, "_attr_cache"):
            self._attr_cache = {}
        ent = self._attr_cache.get(key)
        if ent is None:
            from drsa_audio_tpu.xai.lrp.engine import lrp, output_mask_all_classes

            @jax.jit
            def attr_single(xc, onehot):
                R, _, _ = lrp(self.specs, self.params, xc, composite,
                              lambda lg: lg * onehot[None, :])
                return R

            @jax.jit
            def attr_balanced(xc):
                R, _, _ = lrp(self.specs, self.params, xc, composite,
                              output_mask_all_classes(self.num_classes))
                return R

            ent = (attr_single, attr_balanced)
            self._attr_cache[key] = ent
        return ent

    def __call__(self, configuration_grid: List[Dict], scaled_gamma=False,
                 flipping_mode=None):
        flips = None
        for conf in configuration_grid:
            name = configuration_name(conf)
            composite = self._composite_for(conf, scaled_gamma)
            attr_single, attr_balanced = self._attr_programs(
                (name, bool(scaled_gamma)), composite)
            # balanced consecutive-class batch: ONE LRP pass attributes every
            # sample's own class (the reference loops per class for GPU
            # memory, pf.py:164-176). attr_batch_size chunks the pass per
            # class (each sample's mask is just its own class's logit, so the
            # per-class class_idx pass is identical to the block-diagonal
            # mask) for big-model batches that would OOM the chip.
            if (self.attr_batch_size
                    and self.input_batch.shape[0] > self.attr_batch_size):
                if self.input_batch.shape[0] % self.num_classes:
                    raise ValueError(
                        "attr_batch_size requires a balanced batch: "
                        f"{self.input_batch.shape[0]} samples do not divide "
                        f"into {self.num_classes} classes (the per-class "
                        "slicing would silently drop the remainder)")
                spc = self.samples_per_class
                parts = []
                for ci in range(self.num_classes):
                    cls_batch = self.input_batch[ci * spc:(ci + 1) * spc]
                    onehot = jnp.zeros(self.num_classes,
                                       jnp.float32).at[ci].set(1.0)
                    for j in range(0, spc, self.attr_batch_size):
                        parts.append(attr_single(
                            cls_batch[j:j + self.attr_batch_size], onehot))
                R = jnp.concatenate(parts, axis=0)
            else:
                R = attr_balanced(self.input_batch)
            self.heatmaps[name] = np.asarray(R)
            aupc, mean_logits, flips = self.flipper(
                self._fwd, self.input_batch, R, flipping_mode=flipping_mode)
            self.aupc_scores[name] = aupc
            self.averaged_pertubed_prediction_logits[name] = mean_logits
        return (self.aupc_scores, self.averaged_pertubed_prediction_logits,
                flips, self.heatmaps)


# ---------------------------------------------------- concept-level evals

def concept_flipping(specs, params, input_batch, name_map, layer_idx: int,
                     Us: Dict[str, np.ndarray], num_concepts: int = 4,
                     case: str | None = None, perturbation_size: int = 16,
                     forward_batch: int = 0, attr_batch_size: int = 32):
    """Flip all concepts' top patches simultaneously (cpf.py:20-84).

    Us maps class-name -> trained U for this layer. Returns
    (aupc [n_classes, per_class], mean logits per step, flips per step,
    subspace heatmaps [b, K, h, w]).
    """
    mapper = CLASS_IDX_MAPPER if case != "toy" else CLASS_IDX_MAPPER_TOY
    x = jnp.asarray(input_batch)
    per_class = x.shape[0] // len(mapper)
    heatmaps = []
    for i, cls in enumerate(mapper):
        batch = x[i * per_class:(i + 1) * per_class]
        gen = HeatmapGenerator(
            specs=specs, params=params, U=jnp.asarray(Us[cls], jnp.float32),
            name_map=name_map, sample_class=cls, num_concepts=num_concepts,
            layer_idx=layer_idx, case=case)
        heatmaps.append(gen.generate_subspace_heatmaps(
            batch, concept_flipping=True, attr_batch_size=attr_batch_size, clone_chunk=2))
    R = np.concatenate(heatmaps, axis=0)  # [b, K, h, w]

    fwd = jax.jit(lambda t: forward(specs, params, t))
    flipper = Flipper(perturbation_size, forward_batch=forward_batch)
    aupc, mean_logits, flips = flipper(fwd, x, R[:, :, None])
    return aupc, mean_logits, flips, R


def interclass_concept_flipping(specs, params, input_batch, name_map,
                                Us_by_layer: Dict[int, Dict[str, np.ndarray]],
                                layer_idcs=(1, 4, 7, 10, 13),
                                num_concepts: int = 4, case=None,
                                perturbation_size: int = 16,
                                forward_batch: int = 0,
                                attr_batch_size: int = 32,
                                return_samples: bool = False):
    """AUPC matrix: rows = class whose U is inserted, attributing every
    class's samples (cpf.py:87-181). Returns list per layer of
    [n_classes, n_classes] arrays — or, with ``return_samples``, the
    per-instance tensors [n_classes, n_classes, samples_per_class] so
    callers can put bootstrap CIs on the diagonal-vs-off-diagonal gap
    (xai.eval.stats.interclass_gap_ci; round-2 VERDICT weak #4)."""
    mapper = CLASS_IDX_MAPPER if case != "toy" else CLASS_IDX_MAPPER_TOY
    x = jnp.asarray(input_batch)
    per_class = x.shape[0] // len(mapper)
    fwd = jax.jit(lambda t: forward(specs, params, t))
    flipper = Flipper(perturbation_size, forward_batch=forward_batch)

    all_layers = []
    for layer_idx in layer_idcs:
        rows = []
        for sub_cls in mapper:
            U = jnp.asarray(Us_by_layer[layer_idx][sub_cls], jnp.float32)
            heatmaps = []
            for j, attr_cls in enumerate(mapper):
                batch = x[j * per_class:(j + 1) * per_class]
                gen = HeatmapGenerator(
                    specs=specs, params=params, U=U, name_map=name_map,
                    sample_class=attr_cls, num_concepts=num_concepts,
                    layer_idx=layer_idx, case=case)
                heatmaps.append(gen.generate_subspace_heatmaps(
                    batch, concept_flipping=True,
                    attr_batch_size=attr_batch_size, clone_chunk=2))
            R = np.concatenate(heatmaps, axis=0)
            aupc, _, _ = flipper(fwd, x, R[:, :, None])
            rows.append(np.asarray(aupc) if return_samples
                        else aupc.mean(axis=-1))
        all_layers.append(np.stack(rows, axis=0))
    return all_layers


def cf_random_subspace(specs, params, input_batch, name_map, layer_idx: int,
                       dim: int, num_concepts: int = 4, case=None,
                       permutations: int = 3, seed: int = 0,
                       attr_batch_size: int = 32):
    """Random-orthogonal-U baseline (cpf.py:192-233). Returns the last
    permutation's subspace heatmaps [b, K, h, w]."""
    mapper = CLASS_IDX_MAPPER if case != "toy" else CLASS_IDX_MAPPER_TOY
    x = jnp.asarray(input_batch)
    per_class = x.shape[0] // len(mapper)
    key = jax.random.PRNGKey(seed)
    U = random_orthogonal(key, dim)
    heatmaps = None
    for perm_i in range(permutations):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, dim)
        Up = U[:, perm]
        heatmaps = []
        for i, cls in enumerate(mapper):
            batch = x[i * per_class:(i + 1) * per_class]
            gen = HeatmapGenerator(
                specs=specs, params=params, U=Up, name_map=name_map,
                sample_class=cls, num_concepts=num_concepts,
                layer_idx=layer_idx, case=case)
            heatmaps.append(gen.generate_subspace_heatmaps(
                batch, concept_flipping=True,
                attr_batch_size=attr_batch_size, clone_chunk=2))
        heatmaps = np.concatenate(heatmaps, axis=0)
    return heatmaps
