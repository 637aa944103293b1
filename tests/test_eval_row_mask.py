"""Exact eval losses under ragged-batch edge padding.

The trainer pads the final ragged eval batch by repeating rows so the jitted
eval step compiles once (pipeline/trainer.py); ``label_row_mask`` /
``row_mask`` must exclude those duplicated rows from the loss sums so the
reported eval losses equal the losses of the unpadded batch exactly.
"""

import numpy as np

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.tagging import batch_spots_to_matrix
from peneo_tpu.models.decoder import HEAD_NAMES
from peneo_tpu.models.peneo import PEneoModel
from peneo_tpu.parallel import mesh as pmesh
from peneo_tpu.pipeline import train as T

B, L = 4, 19
REAL = 3  # rows 0..2 are real; row 3 is an edge-padded duplicate of row 2
TINY = dict(
    vocab_size=64, hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=96, max_position_embeddings=64, channel_shrink_ratio=4,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, pad_token_id=0,
)


def _cfg(**kw):
    return PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig.from_dict(TINY).to_dict(),
        pair_block_size=8,
        peneo_category_weights=[1.0, 10.0, 10.0],
        **kw,
    )


def _ragged_batch(seed=0):
    """A REAL-row batch edge-padded to B rows, exactly like the trainer."""
    rng = np.random.default_rng(seed)
    input_ids = rng.integers(2, 64, (REAL, L)).astype(np.int32)
    attn = np.ones((REAL, L), np.int32)
    x0 = rng.integers(0, 900, (REAL, L))
    y0 = rng.integers(0, 900, (REAL, L))
    bbox = np.stack([x0, y0, x0 + 50, y0 + 20], -1).astype(np.int32)
    Ld = L - 1
    labels = {}
    for name in HEAD_NAMES:
        c = 2 if name == "line_extraction" else 3
        spots_b = [[(int(i), int(rng.integers(i, Ld)),
                     int(rng.integers(1, c)))
                    for i in rng.integers(0, Ld, 3)] for _ in range(REAL)]
        labels[name] = batch_spots_to_matrix(spots_b, Ld)
    real = {"input_ids": input_ids, "bbox": bbox, "attention_mask": attn,
            "labels": labels}

    def pad(x):
        reps = [(0, B - REAL)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, reps, mode="edge")

    padded = jax.tree_util.tree_map(pad, real)
    padded["row_mask"] = np.array([1.0] * REAL + [0.0] * (B - REAL),
                                  np.float32)
    return real, padded


def test_module_eval_losses_ignore_padded_rows():
    cfg = _cfg(max_spots_per_head=64, spot_topk="exact")
    real, padded = _ragged_batch()
    model = PEneoModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), real["input_ids"],
                        real["bbox"], real["attention_mask"],
                        deterministic=True)["params"]
    step = jax.jit(T.make_eval_step(model, with_loss=True))
    _, ref_losses = step(params, real | {"row_mask": np.ones(REAL, np.float32)})
    _, got_losses = step(params, padded)
    for k in ref_losses:
        np.testing.assert_allclose(np.asarray(got_losses[k]),
                                   np.asarray(ref_losses[k]),
                                   rtol=1e-6, err_msg=k)


def test_module_eval_losses_biased_without_mask():
    """Sanity: dropping the mask really changes the losses (the bias the
    mask removes is nonzero for this batch)."""
    cfg = _cfg(max_spots_per_head=64, spot_topk="exact")
    real, padded = _ragged_batch()
    model = PEneoModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), real["input_ids"],
                        real["bbox"], real["attention_mask"],
                        deterministic=True)["params"]
    step = jax.jit(T.make_eval_step(model, with_loss=True))
    _, ref_losses = step(params, real | {"row_mask": np.ones(REAL, np.float32)})
    no_mask = {k: v for k, v in padded.items() if k != "row_mask"}
    _, biased = step(params, no_mask)
    assert abs(float(biased["total"]) - float(ref_losses["total"])) > 1e-9


def test_sp_eval_losses_ignore_padded_rows():
    cfg = _cfg(max_spots_per_head=64, spot_topk="exact")
    real, padded = _ragged_batch()
    model = PEneoModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), real["input_ids"],
                        real["bbox"], real["attention_mask"],
                        deterministic=True)["params"]
    # module-path reference on the unpadded batch
    _, ref_losses = jax.jit(T.make_eval_step(model, with_loss=True))(
        params, real | {"row_mask": np.ones(REAL, np.float32)})
    mesh = pmesh.make_mesh(dp=2, tp=2, sp=2)
    sp_out, sp_losses = T.make_sp_eval_step(model, mesh, with_loss=True)(
        params, padded)
    for k in ref_losses:
        np.testing.assert_allclose(np.asarray(sp_losses[k]),
                                   np.asarray(ref_losses[k]),
                                   rtol=1e-5, err_msg=k)
    # spots are still produced for every row (incl. padded; host drops them)
    assert np.asarray(sp_out[HEAD_NAMES[0]]["spot_idx"]).shape[0] == B
