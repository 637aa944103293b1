"""Jitted training/eval steps + the two-group optimizer.

Replaces the reference's HF Trainer internals (SURVEY.md §2.7):
- optimizer: AdamW, linear warmup + linear decay, weight decay masked off
  bias/LayerNorm params, decoder ("peneo_decoder") updates scaled by
  ``peneo_downstream_speedup_ratio`` — exactly the reference's four param
  groups (pipeline/trainer.py:275-354): scaling the whole AdamW update
  (incl. its decoupled decay term) by s is identical to a group with lr×s.
- train_step: value_and_grad over the 5-head loss; runs under jit on a
  (dp, tp) mesh with sharded batch + param shardings from parallel/mesh.py —
  the gradient psum over dp is inserted by XLA, not hand-written.
- eval_step: inference path returning per-head argmax tags + scores (the
  small device→host tensors the host decoder consumes).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import PEneoConfig
from ..models.peneo import PEneoModel


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def linear_schedule(lr: float, total_steps: int, warmup_ratio: float = 0.1,
                    warmup_steps: Optional[int] = None):
    # HF rounds warmup steps UP (TrainingArguments.get_warmup_steps:
    # math.ceil(num_training_steps * warmup_ratio)); match it exactly —
    # e.g. 9 steps × ratio 0.3 → HF warms up 3 steps where int() gives 2.
    import math

    warmup = warmup_steps if warmup_steps is not None else math.ceil(
        total_steps * warmup_ratio)
    if warmup <= 0:
        return optax.linear_schedule(lr, 0.0, max(total_steps, 1))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup, 1)),
        ],
        [warmup],
    )


def _is_no_decay(path) -> bool:
    last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    # biases and LayerNorm scales are excluded from decay
    # (reference: pipeline/trainer.py:277-282 ALL_LAYERNORM_LAYERS + "bias")
    if last == "bias":
        return True
    parent = path[-2].key if len(path) > 1 and hasattr(path[-2], "key") else ""
    return parent == "LayerNorm" or (last == "scale" and "LayerNorm" in parent)


def _decay_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_no_decay(path), params)


def make_optimizer(
    params,
    lr: float,
    total_steps: int,
    warmup_ratio: float = 0.1,
    weight_decay: float = 0.01,
    downstream_speedup_ratio: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    schedule = linear_schedule(lr, total_steps, warmup_ratio)
    txs = []
    if max_grad_norm is not None and max_grad_norm > 0:
        txs.append(optax.clip_by_global_norm(max_grad_norm))
    txs.append(optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay, mask=_decay_mask))
    if downstream_speedup_ratio != 1.0:
        def scale_update(updates, state, params=None):
            def scale(path, u):
                names = [p.key if hasattr(p, "key") else str(p) for p in path]
                return u * downstream_speedup_ratio if "peneo_decoder" in names else u

            return jax.tree_util.tree_map_with_path(scale, updates), state

        txs.append(optax.GradientTransformation(
            init=lambda _: optax.EmptyState(), update=scale_update))
    return optax.chain(*txs)


def create_train_state(cfg: PEneoConfig, model: PEneoModel, optimizer,
                       sample_batch: Dict[str, Any], seed: int = 0,
                       params=None) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    needs_init = params is None or isinstance(params, dict)
    if needs_init:
        init_rng, rng = jax.random.split(rng)
        fresh = model.init(
            {"params": init_rng, "dropout": init_rng},
            sample_batch["input_ids"],
            sample_batch["bbox"],
            sample_batch.get("attention_mask"),
            image=sample_batch.get("image"),
            deterministic=True,
        )["params"]
        if params is not None:
            # partial overlay: e.g. generate_peneo_weights outputs only the
            # backbone subtree; the decoder keeps its fresh init
            from ..models.convert import merge_params

            params = merge_params(jax.device_get(fresh), params)
            params = jax.tree_util.tree_map(jnp.asarray, params)
        else:
            params = fresh
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, rng=rng)


def make_train_step(model: PEneoModel, optimizer):
    """Returns train_step(state, batch) -> (state, metrics). Jit at call site
    (with shardings) or via jax.jit directly for single-device."""

    def train_step(state: TrainState, batch: Dict[str, Any]):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            losses = model.apply(
                {"params": params},
                batch["input_ids"],
                batch["bbox"],
                batch.get("attention_mask"),
                image=batch.get("image"),
                labels=batch["labels"],
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            return losses["total"], losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=rng)
        return new_state, metrics

    return train_step


def make_eval_step(model: PEneoModel, with_loss: bool = False):
    """Inference step for eval. ``with_loss`` additionally returns the 5-head
    losses from the SAME forward (decoder ``also_decode``): one backbone +
    pair-head pass yields both the decode outputs and the eval losses. The
    reference reports eval losses too but only keeps the last batch's value
    (pipeline/trainer.py:185-200, a bug); here the trainer averages over the
    whole eval set — deliberate deviation."""

    def eval_step(params, batch: Dict[str, Any]):
        if with_loss:
            losses, out = model.apply(
                {"params": params},
                batch["input_ids"],
                batch["bbox"],
                batch.get("attention_mask"),
                image=batch.get("image"),
                labels=batch["labels"],
                also_decode=True,
                deterministic=True,
                # excludes the trainer's edge-padded duplicate rows (ragged
                # final eval batch) from the loss sums — exact eval losses
                label_row_mask=batch.get("row_mask"),
            )
            return out, losses
        return model.apply(
            {"params": params},
            batch["input_ids"],
            batch["bbox"],
            batch.get("attention_mask"),
            image=batch.get("image"),
            deterministic=True,
        )

    return eval_step


def jit_train_step(model, optimizer):
    """Jit the train step. Shardings flow from the *placement* of the inputs:
    put params with parallel.mesh.param_shardings and batches with
    batch_sharding before calling; jit + GSPMD propagate the rest (including
    the matching opt_state layout and the dp gradient psum)."""
    return jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))


def make_sp_train_step(model: PEneoModel, optimizer, mesh,
                       sp_block_size: int = 128, _jit: bool = True):
    """Training step with the pair grid sharded over the mesh's ``sp`` axis
    (parallel/seq_parallel.py): the backbone + shrink/combine run under
    dp/tp GSPMD as usual, then the O(L²) loss is computed row-sharded via
    partial-manual shard_map with a psum('sp') reduction. Long-context
    training (L ≫ 512) splits its dominant FLOPs across sp chips. OHEM
    streams per-shard top-k state and merges across shards
    (ops/losses.ohem_stream_merge) — identical to the single-device path.
    Classifier dropout draws from its own fold_in stream — same
    distribution, different draws than the single-shard module path."""
    from ..models.decoder import HEAD_NAMES
    from ..ops.pair_head import stack_head_weights
    from ..parallel.seq_parallel import sp_pair_losses

    cfg = model.cfg
    drop_p = (cfg.backbone_config or {}).get("hidden_dropout_prob", 0.1)
    ratios = cfg.peneo_loss_ratio or [1.0] * 5

    def train_step(state: TrainState, batch: Dict[str, Any]):
        rng, dropout_rng, head_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            pair_in = model.apply(
                {"params": params},
                batch["input_ids"],
                batch["bbox"],
                batch.get("attention_mask"),
                image=batch.get("image"),
                deterministic=False,
                rngs={"dropout": dropout_rng},
                return_pair_inputs=True,
            )
            weights = stack_head_weights(
                params["peneo_decoder"], HEAD_NAMES, model.dtype)
            losses = sp_pair_losses(
                pair_in["a"], pair_in["b"], weights, batch["labels"],
                cfg.peneo_category_weights, ratios, mesh,
                valid_len=int(pair_in["valid_len"]),
                block_size=sp_block_size,
                dropout_rng=head_rng, dropout_p=drop_p,
                num_hard_positive=cfg.peneo_ohem_num_positive,
                num_hard_negative=cfg.peneo_ohem_num_negative)
            return losses["total"], losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=rng)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,)) if _jit else train_step


def make_sp_eval_step(model: PEneoModel, mesh, with_loss: bool = False,
                      sp_block_size: int = 128):
    """Eval step with the pair grid row-sharded over the sp mesh axis:
    backbone under dp/tp GSPMD, then ONE fused grid pass (sp_pair_eval)
    producing both the compact spots and, with ``with_loss``, the 5-head
    losses from the same per-block logits — the sp twin of make_eval_step's
    ``also_decode``. Outputs are the per-head compact-spot dicts the host
    decoder consumes (identical to the module path; tests/test_seq_parallel)."""
    from ..models.decoder import HEAD_NAMES
    from ..ops.pair_head import stack_head_weights
    from ..parallel.seq_parallel import sp_pair_eval, sp_pair_spots

    cfg = model.cfg
    assert cfg.max_spots_per_head > 0, \
        "sp eval requires compact spot extraction"
    ratios = cfg.peneo_loss_ratio or [1.0] * 5

    def eval_step(params, batch: Dict[str, Any]):
        pair_in = model.apply(
            {"params": params},
            batch["input_ids"],
            batch["bbox"],
            batch.get("attention_mask"),
            image=batch.get("image"),
            deterministic=True,
            return_pair_inputs=True,
        )
        weights = stack_head_weights(
            params["peneo_decoder"], HEAD_NAMES, model.dtype)
        if not with_loss:
            return sp_pair_spots(
                pair_in["a"], pair_in["b"], weights, mesh,
                cfg.max_spots_per_head, valid_len=int(pair_in["valid_len"]),
                block_size=sp_block_size, topk_method=cfg.spot_topk)
        return sp_pair_eval(
            pair_in["a"], pair_in["b"], weights, batch["labels"],
            cfg.peneo_category_weights, ratios, mesh,
            cfg.max_spots_per_head, valid_len=int(pair_in["valid_len"]),
            block_size=sp_block_size, topk_method=cfg.spot_topk,
            num_hard_positive=cfg.peneo_ohem_num_positive,
            num_hard_negative=cfg.peneo_ohem_num_negative,
            row_mask=batch.get("row_mask"))

    return eval_step


def make_multi_train_step(model, optimizer, steps_per_call: int,
                          base_step=None):
    """K train steps per dispatch via lax.scan over a stacked batch
    (leading axis = step). Amortizes per-call dispatch/transfer overhead —
    on remote transports each call costs O(#state leaves); measured ~700 ms
    of overhead per step on the tunnel. Returns mean metrics over the K
    steps. ``base_step`` swaps in a different unjitted single-step fn (e.g.
    the sequence-parallel step)."""
    step = base_step if base_step is not None else make_train_step(
        model, optimizer)

    def multi_step(state: TrainState, stacked_batch):
        def body(s, b):
            s, metrics = step(s, b)
            return s, metrics

        state, metrics = jax.lax.scan(body, state, stacked_batch)
        return state, jax.tree_util.tree_map(lambda m: m.mean(axis=0), metrics)

    return jax.jit(multi_step, donate_argnums=(0,))


def shard_state(state: TrainState, mesh, shardings) -> TrainState:
    """Place a TrainState on the mesh: params (and mirrored opt_state
    moments) per the tp rules, scalars replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put_like_params(tree):
        # adam mu/nu pytrees mirror params; other leaves replicate
        def put(path, leaf):
            node = shardings
            try:
                for p in path:
                    key = p.key if hasattr(p, "key") else str(p)
                    node = node[key]
                return jax.device_put(leaf, node)
            except (KeyError, TypeError):
                return jax.device_put(leaf, repl)

        return jax.tree_util.tree_map_with_path(put, tree)

    params = put_like_params(state.params)

    def put_opt(leaf):
        return jax.device_put(leaf, repl)

    # opt_state: adam moments mirror the param tree under .mu/.nu; every
    # other leaf (e.g. the adam step count) replicates explicitly so restore
    # round-trips keep consistent committed placements
    def place_opt_state(os):
        if hasattr(os, "mu") and hasattr(os, "nu"):
            placed = {
                f: (put_like_params(getattr(os, f)) if f in ("mu", "nu")
                    else jax.tree_util.tree_map(put_opt, getattr(os, f)))
                for f in os._fields
            }
            return type(os)(**placed)
        if isinstance(os, tuple):
            parts = [place_opt_state(x) for x in os]
            return type(os)(*parts) if hasattr(os, "_fields") else tuple(parts)
        return jax.tree_util.tree_map(put_opt, os)

    opt_state = place_opt_state(state.opt_state)
    return TrainState(step=jax.device_put(state.step, repl), params=params,
                      opt_state=opt_state, rng=jax.device_put(state.rng, repl))

