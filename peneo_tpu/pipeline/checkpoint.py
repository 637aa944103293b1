"""Orbax checkpointing: params + optimizer state + step + rng + data-feed
position (epoch, batches consumed), keep-last-N and best-by-metric retention.

Replaces HF Trainer checkpointing (SURVEY.md §5: ``--save_strategy steps
--save_steps N --save_total_limit K --load_best_model_at_end
--metric_for_best_model f1``; reference: start/run_rfund.py:142-159 resume
via get_last_checkpoint).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        save_total_limit: Optional[int] = None,
        best_metric_key: Optional[str] = None,
    ) -> None:
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_total_limit,
            best_fn=(lambda m: m.get(best_metric_key, -1.0))
            if best_metric_key else None,
            best_mode="max",
            create=True,
            # synchronous saves: orbax's async thread runs its own multihost
            # sync collectives, which race the NEXT train step's psum on the
            # same channel in multi-process runs (observed as a gloo
            # size-mismatch abort in the 2-process CLI drive). Saves are
            # rare (save_steps cadence); determinism wins over overlap.
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, metrics: Optional[Dict[str, float]] = None,
             feed_state: Optional[Any] = None) -> None:
        """``feed_state`` is ``(epoch, batches_consumed)`` — restores the data
        iterator on resume so training continues on the batches an
        uninterrupted run would have seen (HF skips consumed batches too)."""
        e, b = feed_state if feed_state is not None else (0, 0)
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
            "feed": np.asarray([e, b], np.int64),
        }
        # drain in-flight device work before orbax's multihost barrier: on
        # backends that execute dispatched programs concurrently (CPU PJRT),
        # a still-running train step's gradient all-reduce and the barrier's
        # allgather otherwise interleave on the same collective channel
        # (observed: gloo size-mismatch abort in the 2-process CLI drive)
        jax.block_until_ready((payload["params"], payload["opt_state"]))
        self._mgr.save(step, args=ocp.args.StandardSave(payload),
                       metrics=metrics or {})
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the shape/sharding of ``state_template``. Returns the
        TrainState only; use :meth:`restore_with_feed` when the data-iterator
        position is needed too."""
        out = self.restore_with_feed(state_template, step=step)
        return None if out is None else out[0]

    def restore_with_feed(self, state_template, step: Optional[int] = None):
        """Restore → ``(state, (feed_epoch, feed_batches_consumed))``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        template = {
            "params": state_template.params,
            "opt_state": state_template.opt_state,
            "step": state_template.step,
            "rng": state_template.rng,
            "feed": np.zeros((2,), np.int64),
        }
        # abstract template with explicit shardings so arrays come back with
        # the same (dp, tp) placement they were saved from
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if isinstance(x, jax.Array) else x,
            template,
        )
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))
        state = state_template._replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            rng=restored["rng"],
        )
        feed = np.asarray(restored.get("feed", np.zeros((2,), np.int64)))
        return state, (int(feed[0]), int(feed[1]))

    def close(self):
        self._mgr.close()


def save_params_msgpack(params, path: str) -> None:
    """Small-footprint single-file param export (deployment artifact)."""
    from flax.serialization import to_bytes

    params = jax.tree_util.tree_map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(to_bytes(params))


def load_params_msgpack(template, path: str):
    from flax.serialization import from_bytes

    with open(path, "rb") as f:
        return from_bytes(template, f.read())
