"""Optimizer-trajectory parity vs the reference trainer (VERDICT r2 item 1).

Runs K real optimizer steps on a tiny LiLT PEneo in both stacks from
identical converted initial weights and identical batches:

- reference: its actual ``PEneoTrainer.create_optimizer`` (4 param groups —
  {decay, no-decay} × {decoder 30×, backbone}, /root/reference/pipeline/
  trainer.py:275-354) + the HF linear warmup/decay scheduler
  (``Trainer.create_scheduler``) + global-norm grad clipping, stepped
  manually exactly as the HF Trainer inner loop does (forward → backward →
  clip → optimizer.step → scheduler.step).
- ours: ``pipeline/train.make_optimizer`` (clip → adamw(decay mask) →
  30× decoder update scaling) via the jitted ``make_train_step``.

Asserts per-step losses and end-state param norms (global, decoder-only,
backbone-only) agree within fp32 tolerance — covering warmup rounding, the
decay mask, grad clipping, and the 30× decoder group in one trajectory.
"""

import numpy as np
import pytest

from tests.conftest import reference_available, enable_reference_imports
from tests.test_model_parity import (B, HEADS, L, TINY, _build_reference,
                                     _make_inputs, _our_model_and_params)
from peneo_tpu.data import tagging as tg

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")

K = 8            # optimizer steps
# Small enough that the trajectory is contractive: at lr 1e-3 (decoder 3e-2)
# the tiny model's loss bounces chaotically and fp32 round-off amplifies
# ~50×/step, drowning the parity signal. Semantic mismatches (warmup
# off-by-one, decay mask, clip, 30× group) remain visible far above fp drift
# at this lr because they scale the *update*, not the round-off.
LR = 2e-4
WARMUP_RATIO = 0.3   # ceil(8 * 0.3) = 3 warmup steps (HF rounds up)
WEIGHT_DECAY = 0.01
MAX_GRAD_NORM = 1.0
SPEEDUP = 30.0
CATEGORY_WEIGHTS = [1.0, 10.0, 10.0]


def _make_batches(n, seed=7):
    """n training batches (inputs + dense labels + reference tag tensors)."""
    rng = np.random.default_rng(seed)
    batches = []
    Ld = L - 1
    for bi in range(n):
        input_ids, attn, bbox = _make_inputs(seed=100 + bi)
        dense_labels, ref_tags = {}, {}
        for name, ref_key in HEADS:
            n_cls = 2 if name == "line_extraction" else 3
            spots_b = []
            for _ in range(B):
                spots = []
                for _ in range(4):
                    i = int(rng.integers(0, Ld))
                    j = int(rng.integers(i, Ld))
                    spots.append((i, j, int(rng.integers(1, n_cls))))
                spots_b.append(spots)
            dense_labels[name] = tg.batch_spots_to_matrix(spots_b, Ld)
            ref_tags[ref_key] = np.stack(
                [tg.flatten_triu(m) for m in dense_labels[name]])
        batches.append((input_ids, attn, bbox, dense_labels, ref_tags))
    return batches


def _reference_trajectory(ref, batches):
    """K steps through the reference's own optimizer/scheduler machinery."""
    import torch
    from transformers import TrainingArguments

    import sys
    sys.path.insert(0, "/root/reference")
    from pipeline.trainer import PEneoTrainer

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        args = TrainingArguments(
            output_dir=tmp,
            learning_rate=LR,
            warmup_ratio=WARMUP_RATIO,
            weight_decay=WEIGHT_DECAY,
            max_grad_norm=MAX_GRAD_NORM,
            per_device_train_batch_size=B,
            use_cpu=True,
            report_to=[],
        )
        trainer = PEneoTrainer(
            downstream_speedup_ratio=SPEEDUP, model=ref, args=args)
        optimizer = trainer.create_optimizer()
        scheduler = trainer.create_scheduler(
            num_training_steps=K, optimizer=optimizer)

    ref.train()
    losses = []
    for step in range(K):
        input_ids, attn, bbox, _, ref_tags = batches[step % len(batches)]
        out = ref(
            input_ids=torch.tensor(input_ids),
            bbox=torch.tensor(bbox),
            orig_bbox=torch.tensor(bbox),
            attention_mask=torch.tensor(attn),
            **{k: torch.tensor(v).long() for k, v in ref_tags.items()},
        )
        optimizer.zero_grad()
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), MAX_GRAD_NORM)
        optimizer.step()
        scheduler.step()
        losses.append(float(out.loss.detach()))

    def group_norm(pred):
        sq = sum((p.detach().double() ** 2).sum()
                 for n, p in ref.named_parameters() if pred(n))
        return float(sq ** 0.5)

    return losses, {
        "all": group_norm(lambda n: True),
        "decoder": group_norm(lambda n: "peneo_decoder" in n),
        "backbone": group_norm(lambda n: "peneo_decoder" not in n),
    }


def _our_trajectory(ref, batches):
    import jax
    import jax.numpy as jnp

    from peneo_tpu.pipeline.train import (create_train_state, jit_train_step,
                                          make_optimizer)

    model, params, cfg = _our_model_and_params(
        ref, dict(peneo_category_weights=CATEGORY_WEIGHTS))
    optimizer = make_optimizer(
        params, lr=LR, total_steps=K, warmup_ratio=WARMUP_RATIO,
        weight_decay=WEIGHT_DECAY, downstream_speedup_ratio=SPEEDUP,
        max_grad_norm=MAX_GRAD_NORM)
    sample = {"input_ids": batches[0][0], "bbox": batches[0][2],
              "attention_mask": batches[0][1]}
    state = create_train_state(cfg, model, optimizer, sample, params=params)
    step_fn = jit_train_step(model, optimizer)

    losses = []
    for step in range(K):
        input_ids, attn, bbox, dense_labels, _ = batches[step % len(batches)]
        batch = {
            "input_ids": jnp.asarray(input_ids),
            "bbox": jnp.asarray(bbox),
            "attention_mask": jnp.asarray(attn),
            "labels": {k: jnp.asarray(v) for k, v in dense_labels.items()},
        }
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["total"]))

    flat = jax.tree_util.tree_leaves_with_path(state.params)

    def group_norm(pred):
        sq = 0.0
        for path, leaf in flat:
            names = [p.key if hasattr(p, "key") else str(p) for p in path]
            if pred(names):
                sq += float((np.asarray(leaf, np.float64) ** 2).sum())
        return sq ** 0.5

    return losses, {
        "all": group_norm(lambda ns: True),
        "decoder": group_norm(lambda ns: "peneo_decoder" in ns),
        "backbone": group_norm(lambda ns: "peneo_decoder" not in ns),
    }


def test_optimizer_trajectory_parity():
    ref = _build_reference(dict(peneo_category_weights=CATEGORY_WEIGHTS))
    batches = _make_batches(3)

    ours_losses, ours_norms = _our_trajectory(ref, batches)
    # reference trajectory mutates ref's weights — run it second
    ref_losses, ref_norms = _reference_trajectory(ref, batches)

    # per-step losses: fp32 forward/backward drift accumulates over K steps
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=2e-3,
                               err_msg=f"ours={ours_losses} ref={ref_losses}")
    # step-1 loss is pre-update — must match the forward-parity tolerance
    np.testing.assert_allclose(ours_losses[0], ref_losses[0], rtol=3e-4)

    # end-state param norms: catches decay-mask, clip, warmup and 30×-group
    # divergences (decoder norm moves ~30× as far as backbone norm)
    for key in ("all", "decoder", "backbone"):
        np.testing.assert_allclose(ours_norms[key], ref_norms[key], rtol=1e-4,
                                   err_msg=key)


def test_warmup_rounding_matches_hf():
    """ceil rounding: 9 steps × 0.3 ratio = 2.7 — HF ceils to 3 warmup
    steps where int() would truncate to 2."""
    from transformers import TrainingArguments

    from peneo_tpu.pipeline.train import linear_schedule

    args = TrainingArguments(output_dir="/tmp/x", warmup_ratio=0.3,
                             use_cpu=True, report_to=[])
    hf_warmup = args.get_warmup_steps(9)
    assert hf_warmup == 3
    assert int(9 * 0.3) == 2  # the truncation the ceil fixes

    sched = linear_schedule(1.0, 9, warmup_ratio=0.3)
    # schedule(count) is the lr used on step count+1; peak at count=warmup
    assert float(sched(hf_warmup)) == pytest.approx(1.0)
    assert float(sched(hf_warmup - 1)) < 1.0
