"""Training/eval engine: optimizer construction, jitted SPMD train step,
host-side epoch loops.

Reference counterparts: `main.py:222-265` (five LR param groups + AdamW +
MultiStepLR), `src/engine.py:25-95` (train_one_epoch: forward → weighted loss
→ backward → clip_grad_norm_(0.1) → step, NaN abort), `src/engine.py:98-203`
(evaluate_coco), `src/engine.py:206-262` (inference_vis).

TPU-native differences:
  * DDP + NCCL all-reduce → one jitted SPMD step over a `Mesh`; the batch is
    sharded along `data`, params replicated, XLA inserts the gradient
    reductions.
  * The per-rank `num_boxes` all-reduce (`criterion.py:222-226`) becomes a
    `psum` over the vmapped clip axis (`axis_name="batch"`), which XLA lowers
    to the same cross-device collective when that axis is sharded.
  * MultiStepLR is a per-group `optax.piecewise_constant_schedule` keyed on
    the global step (= epoch boundaries × steps_per_epoch).
"""
from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.criterion import (build_weight_dict, clip_criterion,
                               image_criterion, weighted_total)
from .parallel.mesh import make_mesh, replicate, shard_batch
from .util.misc import MetricLogger


# ---------------------------------------------------------------------------
# Parameter groups (reference main.py:222-261)
# ---------------------------------------------------------------------------

def match_name_keywords(name: str, keywords) -> bool:
    """Substring keyword match on a dotted parameter path.

    Mirrors `src/util/misc.py:501`. The reference's torch names use
    `backbone.0` (Joiner index); our flax path is `detr.backbone....`, so that
    keyword is canonicalized.
    """
    canonical = {"backbone.0": "backbone."}
    return any(canonical.get(k, k) in name for k in keywords)


PARAM_GROUPS = ("base", "backbone", "linear_proj", "mask_head",
                "temporal_linear_proj", "frozen")

# conv1/layer1 of the ResNet stem never train (reference
# src/models/backbone.py:61-64 keeps only layer2-4 trainable).
_ALWAYS_FROZEN = ("backbone.conv1", "backbone.bn1", "backbone.layer1")


def _param_group(path: str, cfg) -> str:
    if match_name_keywords(path, tuple(cfg.SOLVER.FROZEN_PARAMS) + _ALWAYS_FROZEN):
        return "frozen"
    if match_name_keywords(path, cfg.SOLVER.DEVIS.LR_TEMPORAL_LINEAR_PROJ_NAMES):
        return "temporal_linear_proj"
    if match_name_keywords(path, cfg.SOLVER.LR_LINEAR_PROJ_NAMES):
        return "linear_proj"
    if match_name_keywords(path, cfg.SOLVER.LR_MASK_HEAD_NAMES):
        return "mask_head"
    if match_name_keywords(path, cfg.SOLVER.BACKBONE_NAMES):
        return "backbone"
    return "base"


def param_labels(params, cfg):
    """Label pytree mapping each param to its LR group."""
    def label(path, _):
        name = ".".join(str(k.key) for k in path)
        return _param_group(name, cfg)
    return jax.tree_util.tree_map_with_path(label, params)


def group_base_lrs(cfg) -> Dict[str, float]:
    s = cfg.SOLVER
    return {
        "base": s.BASE_LR,
        "backbone": s.LR_BACKBONE,
        "linear_proj": s.BASE_LR * s.LR_LINEAR_PROJ_MULT,
        "mask_head": s.BASE_LR * s.LR_MASK_HEAD_MULT,
        "temporal_linear_proj": s.BASE_LR * s.DEVIS.LR_TEMPORAL_LINEAR_PROJ_MULT,
    }


def multistep_schedule(base_lr: float, milestones, gamma: float,
                       steps_per_epoch: int):
    """torch MultiStepLR on epoch granularity, evaluated at the global step."""
    if not milestones:
        return base_lr
    return optax.piecewise_constant_schedule(
        base_lr, {int(m) * steps_per_epoch: gamma for m in milestones})


def build_optimizer(cfg, params, steps_per_epoch: int
                    ) -> Tuple[optax.GradientTransformation, Any]:
    """AdamW with the reference's five LR groups + global-norm clip 0.1."""
    lrs = group_base_lrs(cfg)
    txs = {
        g: optax.adamw(multistep_schedule(lr, cfg.SOLVER.STEPS,
                                          cfg.SOLVER.GAMMA, steps_per_epoch),
                       weight_decay=cfg.SOLVER.WEIGHT_DECAY)
        for g, lr in lrs.items()
    }
    txs["frozen"] = optax.set_to_zero()
    labels = param_labels(params, cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.SOLVER.GRAD_CLIP_MAX_NORM),
        optax.multi_transform(txs, labels),
    )
    return tx, labels


# ---------------------------------------------------------------------------
# Train state & step
# ---------------------------------------------------------------------------

class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    frozen: Any                      # non-trainable collections (BN stats)
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state)


def create_train_state(cfg, variables, steps_per_epoch: int) -> TrainState:
    params = variables["params"]
    frozen = {k: v for k, v in variables.items() if k != "params"}
    tx, _ = build_optimizer(cfg, params, steps_per_epoch)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      frozen=frozen, opt_state=tx.init(params), tx=tx)


def make_train_step(model, cfg, num_classes: int) -> Callable:
    """Returns jitted `step(state, batch, rng) -> (state, metrics)`.

    batch (VIS):   images (B, T, H, W, 3), pad_mask (B, T, H, W),
                   targets {labels (B,N), boxes (B,N,T,4)… exists (B,N)}.
    batch (COCO):  images (B, H, W, 3), pad_mask (B, H, W),
                   targets {labels (B,N), boxes (B,N,4), valid, masks}.
    The leading B axis is sharded over the mesh's `data` axis by the caller;
    everything inside is SPMD.
    """
    is_vis = cfg.DATASETS.TYPE == "vis"
    mask_on = bool(cfg.MODEL.MASK_ON)
    weight_dict = build_weight_dict(cfg)
    T = cfg.MODEL.DEVIS.NUM_FRAMES
    focal_alpha = cfg.MODEL.LOSS.FOCAL_ALPHA
    from .models import matcher_cfg_from
    mcfg = matcher_cfg_from(cfg, clip=is_vis)
    eff_classes = (num_classes - 1 if cfg.MODEL.LOSS.FOCAL_LOSS
                   else num_classes)

    def loss_fn(params, frozen, batch, rng):
        variables = {"params": params, **frozen}
        if is_vis:
            def per_clip(images, pad_mask, targets, rng):
                out = model.apply(variables, images, pad_mask,
                                  targets=targets, train=True,
                                  deterministic=False,
                                  rngs={"dropout": rng})
                return clip_criterion(out, targets, eff_classes, T, mcfg,
                                      focal_alpha, axis_name="batch",
                                      mask_on=mask_on)
            B = batch["images"].shape[0]
            losses = jax.vmap(per_clip, axis_name="batch")(
                batch["images"], batch["pad_mask"], batch["targets"],
                jax.random.split(rng, B))
            losses = jax.tree.map(lambda x: x.mean(), losses)
        else:
            out = model.apply(variables, batch["images"], batch["pad_mask"],
                              targets=batch["targets"], train=True,
                              deterministic=False, rngs={"dropout": rng})
            losses = image_criterion(out, batch["targets"], eff_classes, mcfg,
                                     focal_alpha, mask_on=mask_on)
        total = weighted_total(losses, weight_dict)
        return total, losses

    @jax.jit
    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.frozen, batch, rng)
        grad_norm = optax.global_norm(grads)
        new_state = state.apply_gradients(grads)
        # NaN guard (reference engine.py:68-71 aborts; SPMD equivalent: skip
        # the update, surface the flag in metrics for the host loop to abort).
        ok = jnp.isfinite(total)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_state, state,
            is_leaf=lambda x: isinstance(x, jnp.ndarray))
        metrics = {"loss": total, "grad_norm": grad_norm,
                   "finite": ok.astype(jnp.float32), **losses}
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# Host loops
# ---------------------------------------------------------------------------

def train_one_epoch(step_fn, state, data_loader, rng, epoch: int,
                    mesh=None, print_freq: int = 10,
                    debug: bool = False) -> Tuple[Any, Dict[str, float]]:
    """Host epoch loop (reference engine.py:25-95)."""
    logger = MetricLogger(print_freq=print_freq, debug=debug)
    header = f"Epoch: [{epoch}]"

    def drain(metrics_dev):
        host = {k: float(v) for k, v in
                jax.device_get(metrics_dev).items() if jnp.ndim(v) == 0}
        if host.get("finite", 1.0) < 1.0:
            raise FloatingPointError(
                f"Loss is not finite at epoch {epoch}: {host}")
        logger.update(**host)

    # Metrics are fetched one step late: step k+1 is dispatched (XLA runs it
    # asynchronously) before step k's scalars cross the tunnel, so host
    # batch prep overlaps device compute. The non-finite abort lags one step
    # — step_fn already skipped the param update for the bad step, so the
    # extra dispatched step runs on unchanged params and is discarded by the
    # raise (reference aborts immediately, engine.py:68-71).
    pending = None
    for batch in logger.log_every(data_loader, header=header):
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch, rng)
        if pending is not None:
            drain(pending)
        pending = metrics
    if pending is not None:
        drain(pending)
    # Printed/returned epoch stats cover ALL ranks (reference misc.py:199-210)
    logger.synchronize_between_processes()
    return state, {k: m.global_avg for k, m in logger.meters.items()}
