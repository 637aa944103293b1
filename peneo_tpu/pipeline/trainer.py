"""PEneoTrainer: the full fine-tuning loop.

Replaces the reference's ``PEneoTrainer(transformers.Trainer)``
(pipeline/trainer.py:32-354) with a jitted-step loop:

train: feed → sharded train_step (dp×tp mesh) → metric logging → periodic
eval + checkpoint. eval: feed → jitted inference step (argmax tags + scores
on device) → host decode (pipeline/decode.py) → KVPE metrics with multihost
gather (pipeline/evaluation.py). Eval decodes incrementally per batch rather
than accumulating all logits in RAM (fixes the reference's unbounded eval
memory, pipeline/trainer.py:102-155).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..config import PEneoConfig
from ..models.peneo import PEneoModel
from ..parallel import mesh as pmesh
from . import decode as dec
from . import evaluation as ev
from . import train as T
from .checkpoint import CheckpointManager
from .loader import DataFeed, batch_to_device


@dataclass
class TrainingArguments:
    """Flag surface mirroring the reference's HF TrainingArguments subset
    actually used (README.md:206-241)."""

    output_dir: str = "output"
    learning_rate: float = 5e-5
    warmup_ratio: float = 0.1
    max_steps: int = 25000
    per_device_train_batch_size: int = 4
    per_device_eval_batch_size: int = 16
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    logging_steps: int = 100
    logging_dir: Optional[str] = None  # TensorBoard event files
    eval_steps: int = 1000
    save_steps: int = 1000
    save_total_limit: Optional[int] = 1
    metric_for_best_model: Optional[str] = "f1"
    start_eval_epoch: int = 0  # reference gates eval cost early in training
    seed: int = 42
    dp: Optional[int] = None
    tp: int = 1
    # sequence parallel: shard the O(L²) pair-grid rows over sp chips
    # (parallel/seq_parallel.py) — the long-context training axis
    sp: int = 1
    # ZeRO-3-style: shard params + adam moments over dp (parallel/mesh.py)
    fsdp: bool = False
    detail_eval: bool = False
    save_eval_detail: bool = False
    resume: bool = True
    # K optimizer steps per device dispatch (lax.scan over stacked batches);
    # amortizes per-call overhead on remote transports. max_steps rounds up
    # to a multiple of K.
    steps_per_call: int = 1
    # Use the TPU hardware RNG ('rbg') for dropout streams. The default
    # threefry impl generates dropout mask bits in software — measured
    # 137 → 330 ms/step at base geometry/B=8 with p=0.1 dropout (r3
    # attribution), i.e. the mask bits cost more than the whole model.
    # rbg keeps split/fold_in stable (threefry on key words) and draws the
    # bits with the hardware generator. Different stream than threefry —
    # same distribution; checkpoints store the key array, so resuming a
    # pre-rbg checkpoint needs fast_rng=False.
    fast_rng: bool = True


class PEneoTrainer:
    def __init__(
        self,
        cfg: PEneoConfig,
        model: PEneoModel,
        args: TrainingArguments,
        train_dataset=None,
        eval_dataset=None,
        collator=None,
        params=None,
        tokenizer=None,
        source_dir=None,
    ) -> None:
        self.cfg = cfg
        self.model = model
        self.args = args
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.collator = collator
        # for save_model(): tokenizer object to save_pretrained, or the
        # source model dir whose tokenizer files we copy (reference saves the
        # processor next to the weights, start/run_rfund.py:323-327)
        self.tokenizer = tokenizer
        self.source_dir = source_dir
        os.makedirs(args.output_dir, exist_ok=True)
        # multi-host: every process runs the trainer (collectives need all
        # of them); only process 0 owns log.jsonl / TensorBoard / final
        # artifacts — others log to log.rank{i}.jsonl (reference rank-gates
        # via local_rank, start/run_rfund.py:122-140)
        self._proc = jax.process_index() if jax.process_count() > 1 else 0
        if jax.process_count() > 1 and args.save_steps:
            # orbax's multihost save coordinates through the checkpoint
            # DIRECTORY; per-process dirs deadlock its barrier at the first
            # save. Catch the misconfiguration now with a clear error ON
            # EVERY RANK (an allgather — every process compares everyone's
            # hash, so no rank proceeds alone into a doomed collective).
            # The escape hatch for shared filesystems mounted at different
            # paths, PENEO_ALLOW_DIVERGENT_OUTPUT_DIR=1, is itself gathered
            # so a partially-set env cannot desynchronize the check; it
            # must be set (truthy) on EVERY process to take effect.
            import hashlib

            from jax.experimental import multihost_utils

            allow = os.environ.get(
                "PENEO_ALLOW_DIVERGENT_OUTPUT_DIR", "") not in ("", "0")
            h = np.frombuffer(hashlib.sha256(
                os.path.abspath(args.output_dir).encode()).digest(),
                np.uint8).astype(np.int32)
            probe = np.concatenate([h, [np.int32(allow)]])
            gathered = multihost_utils.process_allgather(probe)
            all_allow = bool(gathered[:, -1].all())
            dirs_match = bool((gathered[:, :-1] == probe[None, :-1]).all())
            if not dirs_match and not all_allow:
                raise ValueError(
                    "multi-process training with save_steps>0 requires the "
                    "SAME output_dir on every process (shared filesystem) — "
                    f"process {self._proc} has {args.output_dir!r}. If the "
                    "processes do reach one shared filesystem through "
                    "different paths, set PENEO_ALLOW_DIVERGENT_OUTPUT_DIR=1 "
                    "on EVERY process.")
        log_name = ("log.jsonl" if self._proc == 0
                    else f"log.rank{self._proc}.jsonl")
        self._log_file = open(os.path.join(args.output_dir, log_name), "a")
        self._tb = None
        if args.logging_dir and self._proc == 0:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(args.logging_dir)
            except Exception as e:  # TB is best-effort (needs tensorflow)
                print(f"[peneo] tensorboard disabled: {e}")

        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()  # resumed/restarted runs skip recompiles
        if args.fast_rng:
            jax.config.update("jax_default_prng_impl", "rbg")
        self.mesh = pmesh.make_mesh(dp=args.dp, tp=args.tp, sp=args.sp)
        self.batch_sharding = pmesh.batch_sharding(self.mesh)
        if (self.mesh.shape["dp"] * self.mesh.shape["tp"] > 1
                and (getattr(cfg, "use_fused_biacm", False)
                     or getattr(cfg, "use_fused_biacm_train", False)
                     or getattr(cfg, "use_fused_bias_attention", False)
                     or getattr(cfg, "use_fused_bias_attention_train",
                                False))):
            # fused pallas kernels under dp/tp run via shard_map
            # (models/lilt.py, models/layoutlmv3.py/v2); the module needs
            # the mesh to do that
            self.model = model = self.model.clone(mesh=self.mesh)

        self.optimizer = T.make_optimizer(
            None,
            lr=args.learning_rate,
            total_steps=args.max_steps,
            warmup_ratio=args.warmup_ratio,
            weight_decay=args.weight_decay,
            downstream_speedup_ratio=cfg.peneo_downstream_speedup_ratio,
            max_grad_norm=args.max_grad_norm,
        )
        base_step = None
        if args.sp > 1:
            base_step = T.make_sp_train_step(
                self.model, self.optimizer, self.mesh, _jit=False)
        if args.steps_per_call > 1:
            self._train_step = T.make_multi_train_step(
                self.model, self.optimizer, args.steps_per_call,
                base_step=base_step)
        elif base_step is not None:
            self._train_step = jax.jit(base_step, donate_argnums=(0,))
        else:
            self._train_step = T.jit_train_step(self.model, self.optimizer)
        # metric evals use exact top-k spot extraction: approx_max_k's 1%
        # recall tail is harmless on trained models (spots score ~1.0 vs the
        # empty filler) but can silently drop real spots on untrained /
        # high-entropy ones — eval cadence is rare enough that the ~13
        # ms/batch exact sort is free determinism (serving keeps "approx")
        import dataclasses as _dc

        self._eval_model = (model if cfg.spot_topk == "exact"
                            else model.clone(cfg=_dc.replace(
                                cfg, spot_topk="exact")))
        if args.sp > 1:
            self._eval_step = jax.jit(
                T.make_sp_eval_step(self._eval_model, self.mesh))
        else:
            self._eval_step = jax.jit(T.make_eval_step(self._eval_model))
        # losses + decode outputs from one forward (also_decode); compiled
        # lazily on first labeled eval
        self._eval_step_loss = None
        self._params_init = params
        self.state: Optional[T.TrainState] = None
        self.ckpt = CheckpointManager(
            os.path.join(args.output_dir, "checkpoints"),
            save_total_limit=args.save_total_limit,
            best_metric_key=args.metric_for_best_model,
        )

    # ------------------------------------------------------------------ utils
    def log(self, record: Dict[str, Any]) -> None:
        record = {k: (float(v) if hasattr(v, "item") else v)
                  for k, v in record.items()}
        record["time"] = time.time()
        self._log_file.write(json.dumps(record) + "\n")
        self._log_file.flush()
        if self._tb is not None and "step" in record:
            for k, v in record.items():
                if isinstance(v, (int, float)) and k not in ("step", "time"):
                    self._tb.scalar(k, v, record["step"])
            self._tb.flush()
        if jax.process_index() == 0:
            brief = {k: (round(v, 5) if isinstance(v, float) else v)
                     for k, v in record.items() if k != "time"}
            print(f"[peneo] {brief}", flush=True)

    def _global_batch(self, per_device: int) -> int:
        return per_device * self.mesh.shape["dp"]

    def _make_state(self, sample_batch) -> T.TrainState:
        state = T.create_train_state(self.cfg, self.model, self.optimizer,
                                     sample_batch, seed=self.args.seed,
                                     params=self._params_init)
        shardings = pmesh.param_shardings(state.params, self.mesh,
                                          fsdp=self.args.fsdp)
        return T.shard_state(state, self.mesh, shardings)

    # ------------------------------------------------------------------ train
    def train(self) -> None:
        args = self.args
        feed = DataFeed(
            self.train_dataset,
            self.collator,
            batch_size=self._global_batch(args.per_device_train_batch_size),
            shuffle=True,
            seed=args.seed,
        )
        # data-feed position (epoch, batches consumed this epoch) travels in
        # every checkpoint so resume continues on the batches an uninterrupted
        # run would have seen next (not an epoch-0 replay)
        pos = {"epoch": 0, "batch": 0}
        it = None

        def next_raw():
            nonlocal it
            for _ in range(2):  # at most one epoch wrap per call
                if it is None:
                    it = iter(feed)
                try:
                    b = next(it)
                    pos["batch"] += 1
                    return b
                except StopIteration:
                    it = None
                    pos["epoch"] += 1
                    pos["batch"] = 0
            raise RuntimeError(
                "empty train feed (dataset smaller than global batch?)")

        first = next_raw()
        dev_batch = batch_to_device(first, self.batch_sharding)
        if self.state is None:
            self.state = self._make_state(dev_batch)
            if args.resume:
                restored = self.ckpt.restore_with_feed(self.state)
                if restored is not None:
                    self.state, (fe, fb) = restored
                    self.log({"event": "resumed",
                              "step": int(jax.device_get(self.state.step)),
                              "feed_epoch": fe, "feed_batch": fb})
                    feed.set_state(fe, fb)
                    it = None
                    pos = {"epoch": fe, "batch": fb}
                    first = next_raw()
                    dev_batch = batch_to_device(first, self.batch_sharding)

        k = max(1, args.steps_per_call)
        step = int(jax.device_get(self.state.step))
        t_last = time.time()
        seen_since_log = 0

        # Group producer: host-side collate + (for K>1) group stacking +
        # device_put run in a background thread, double-buffered, so batch
        # prep for group i+1 overlaps device compute of group i. The
        # synchronous version spent ~120 ms/step of a 320 ms/step loop on
        # this path at base geometry / B=8 (r3 attribution: the raw jitted
        # step incl. optimizer is ~200 ms). Each queue item carries the feed
        # position AFTER its batches, so checkpoints resume on exactly the
        # next unconsumed group even while the producer runs ahead.
        import queue as _queue
        import threading as _threading

        from jax.sharding import NamedSharding, PartitionSpec as P

        from .loader import batch_arrays

        group_sharding = NamedSharding(self.mesh, P(None, "dp"))
        groups: _queue.Queue = _queue.Queue(maxsize=2)
        stop_feed = _threading.Event()
        leftover = [first]  # the batch used for state init starts group 1
        # Multi-process runs must NOT device_put from the producer thread:
        # a cross-process device_put issues channel traffic that races the
        # main thread's collectives on the same transport (minimal repro: a
        # background device_put to a P('dp') sharding spanning 2 CPU
        # processes gloo-aborts a concurrent psum loop). The producer then
        # stays host-side (collate + stack — the GIL-bound part) and the
        # main loop does the device_put between steps, where execution is
        # ordered. Single-process keeps the fully-async path.
        multiproc = jax.process_count() > 1

        def to_host(batches):
            # collate + stack (the GIL-bound python part) — always done in
            # the producer thread
            if k == 1:
                return batch_arrays(batches[0])
            host = [batch_arrays(b) for b in batches]
            return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *host)

        def put(host):
            sh = self.batch_sharding if k == 1 else group_sharding
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sh), host)

        def produce():
            try:
                while not stop_feed.is_set():
                    batches = leftover[:]
                    leftover.clear()
                    while len(batches) < k:
                        batches.append(next_raw())
                    dev = to_host(batches)
                    if not multiproc:
                        dev = put(dev)
                    n = sum(b.input_ids.shape[0] for b in batches)
                    item = (dev, n, (pos["epoch"], pos["batch"]))
                    while not stop_feed.is_set():
                        try:
                            groups.put(item, timeout=0.5)
                            break
                        except _queue.Full:
                            continue
            except BaseException as e:  # surface feed errors to the loop
                groups.put(e)

        feeder = _threading.Thread(target=produce, daemon=True)
        feeder.start()
        try:
            while step < args.max_steps:
                item = groups.get()
                if isinstance(item, BaseException):
                    raise item
                dev_batch, n_samples, feed_pos = item
                if multiproc:
                    dev_batch = put(dev_batch)

                self.state, metrics = self._train_step(self.state, dev_batch)
                prev = step
                step += k
                seen_since_log += n_samples

                def crossed(every):
                    return every and (step // every) > (prev // every)

                if crossed(args.logging_steps):
                    metrics = jax.device_get(metrics)
                    dt = time.time() - t_last
                    self.log({"step": step,
                              **{f"loss/{kk}": float(v)
                                 for kk, v in metrics.items()},
                              "throughput_samples_per_s": seen_since_log / dt})
                    t_last = time.time()
                    seen_since_log = 0

                # reference gates eval before start_eval_epoch
                # (start/run_rfund.py:243-304 compute_metrics closure). We
                # run a step-count loop, so the epoch gate is approximated as
                # start_eval_epoch × batches-per-epoch steps — equal to the
                # reference's gate when max_steps spans whole epochs.
                eval_allowed = step >= args.start_eval_epoch * max(len(feed), 1)
                if crossed(args.eval_steps) and self.eval_dataset is not None \
                        and eval_allowed:
                    eval_metrics = self.evaluate()
                    self.log({"step": step,
                              **{f"eval/{kk}": v
                                 for kk, v in eval_metrics.items()}})
                    if crossed(args.save_steps):
                        self.ckpt.save(step, self.state, metrics=eval_metrics,
                                       feed_state=feed_pos)
                elif crossed(args.save_steps):
                    self.ckpt.save(step, self.state, feed_state=feed_pos)
        finally:
            stop_feed.set()
            try:  # unblock a producer waiting on a full queue
                while True:
                    groups.get_nowait()
            except _queue.Empty:
                pass

        # load the best checkpoint at the end when tracking a metric
        # (reference: --load_best_model_at_end, README.md:277-278)
        if args.metric_for_best_model:
            best = self.ckpt.best_step()
            if best is not None and best != int(jax.device_get(self.state.step)):
                restored = self.ckpt.restore(self.state, step=best)
                if restored is not None:
                    self.state = restored
                    self.log({"event": "loaded_best", "step": best})

    # ------------------------------------------------------------------- eval
    @staticmethod
    def _eval_host(out, bsz: int):
        """Eval outputs device→host. Single-process: plain device_get (rows
        = None means "all"). Multi-process: a dp-sharded output can't be
        fetched wholesale (rows living on other processes aren't
        addressable) — fetch only this process's batch rows and return them
        with their global row indices; every process decodes its own rows
        and the global union is restored by the metric gather + fname dedup,
        exactly the reference's per-rank decode + all_gather_object pattern
        (reference pipeline/evaluation.py:149-177)."""
        if jax.process_count() == 1:
            return jax.device_get(out), None
        # a row is locally decodable iff EVERY leaf holds it (XLA may leave
        # some outputs replicated while others stay dp-sharded)
        row_sets = []
        for leaf in jax.tree_util.tree_leaves(out):
            row_sets.append({r for sh in leaf.addressable_shards
                             for r in range(*sh.index[0].indices(
                                 leaf.shape[0]))})
        rows = sorted(set.intersection(*row_sets))
        rows = [r for r in rows if r < bsz]  # drop edge-padded tail rows

        def fetch(x):
            parts = {}
            for sh in x.addressable_shards:
                start = sh.index[0].indices(x.shape[0])[0]
                data = np.asarray(sh.data)
                for j in range(data.shape[0]):
                    parts[start + j] = data[j]
            if not rows:
                return np.empty((0,) + x.shape[1:], x.dtype)
            return np.stack([parts[r] for r in rows])

        return jax.tree_util.tree_map(fetch, out), rows

    def evaluate(self, score_thresh: float = 0.0) -> Dict[str, float]:
        args = self.args
        feed = DataFeed(
            self.eval_dataset,
            self.collator,
            batch_size=self._global_batch(args.per_device_eval_batch_size),
            shuffle=False,
            drop_last=False,
        )
        params = self.state.params if self.state is not None else self._params_init
        if params is None:
            raise ValueError(
                "evaluate() has no parameters: run --do_train first or pass "
                "--model_name_or_path pointing at a trained model dir")
        all_pred, all_gt, all_fname = [], [], []
        n_eval = 0
        # eval losses are averaged over the whole eval set (weighted by true
        # batch size; the reference only reports the LAST batch's losses —
        # pipeline/trainer.py:185-200 — a bug we deliberately don't copy). The
        # final ragged batch is edge-padded for static shapes; a per-row mask
        # (``row_mask``) excludes the duplicated rows from the loss sums, so
        # the reported losses are exact (decoded metrics already drop them).
        loss_sums: Dict[str, float] = {}
        loss_weight = 0.0
        t0 = time.time()

        # Pipelined eval (the serving dispatch/collect pattern,
        # pipeline/infer.py): keep ONE batch in flight — dispatch batch i+1
        # before fetching batch i — and run the host chain-walk decode on a
        # small thread pool so decode of batch i overlaps device compute of
        # batch i+1. Decode futures are drained IN ORDER at the end, so
        # accumulated preds/gts/fnames (and thus metrics) are identical to
        # the old strictly-sequential loop. All device interaction
        # (device_put, dispatch, device_get) stays on the MAIN thread — the
        # multi-process collective rules (CLAUDE.md) forbid background-thread
        # device_puts, and the decode workers touch host arrays only.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=2,
                                  thread_name_prefix="eval-decode")
        in_flight: deque = deque()
        decode_futs: list = []
        # measurement hook: PENEO_EVAL_SEQUENTIAL=1 restores the round-4
        # strictly-sequential loop (fetch + decode each batch before
        # dispatching the next) for the pipelined-eval A/B — docs §8
        pipelined = os.environ.get("PENEO_EVAL_SEQUENTIAL") != "1"

        def _decode_task(texts, out, labels, seq_lens, fnames):
            return dec.decode_batch(texts, out, labels, seq_lens, fnames,
                                    score_thresh=score_thresh)

        def _collect_one():
            nonlocal loss_weight
            batch, bsz, out, losses = in_flight.popleft()
            if losses is not None:
                losses = jax.device_get(losses)
                for kk, v in losses.items():
                    loss_sums[kk] = loss_sums.get(kk, 0.0) + float(v) * bsz
                loss_weight += bsz
            out, rows = self._eval_host(out, bsz)
            if rows is None:
                decode_futs.append(pool.submit(
                    _decode_task, batch.texts, out, batch.labels,
                    [int(s) for s in batch.seq_len], batch.fnames))
            else:  # multi-process: decode only this process's rows
                sub_labels = {k: v[rows] for k, v in
                              (batch.labels or {}).items()}
                decode_futs.append(pool.submit(
                    _decode_task, [batch.texts[i] for i in rows], out,
                    sub_labels, [int(batch.seq_len[i]) for i in rows],
                    [batch.fnames[i] for i in rows]))

        for batch in feed:
            # static-shape jit: pad the ragged final batch up to full size by
            # repeating rows (decoded results beyond bsz are discarded), so
            # eval compiles exactly once
            bsz = batch.input_ids.shape[0]
            full = self._global_batch(args.per_device_eval_batch_size)
            if bsz != full:
                import numpy as _np

                from .loader import batch_arrays

                arrays = batch_arrays(batch)

                def _pad(x):
                    reps = [(0, full - bsz)] + [(0, 0)] * (x.ndim - 1)
                    return _np.pad(x, reps, mode="edge")

                arrays = jax.tree_util.tree_map(_pad, arrays)
                if batch.labels:
                    rm = _np.zeros((full,), _np.float32)
                    rm[:bsz] = 1.0
                    arrays["row_mask"] = rm
                dev_batch = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, self.batch_sharding), arrays)
            else:
                dev_batch = batch_to_device(batch, self.batch_sharding)
                if batch.labels:
                    # constant key keeps the jitted step's pytree (and so the
                    # compiled executable) identical across full/ragged batches
                    import numpy as _np

                    dev_batch["row_mask"] = jax.device_put(
                        _np.ones((full,), _np.float32), self.batch_sharding)
            if batch.labels:
                if self._eval_step_loss is None:
                    # sp: one fused shard_map pass (sp_pair_eval) yields
                    # spots + losses, mirroring the module path's also_decode
                    self._eval_step_loss = jax.jit(
                        T.make_sp_eval_step(self._eval_model, self.mesh,
                                            with_loss=True)
                        if args.sp > 1
                        else T.make_eval_step(self._eval_model,
                                              with_loss=True))
                out, losses = self._eval_step_loss(params, dev_batch)
            else:
                out, losses = self._eval_step(params, dev_batch), None
            in_flight.append((batch, bsz, out, losses))
            n_eval += bsz
            while len(in_flight) > (1 if pipelined else 0):
                _collect_one()
            if not pipelined:
                decode_futs[-1].result()  # decode inline, old behavior
        while in_flight:
            _collect_one()
        for fut in decode_futs:  # in dispatch order → identical accumulation
            preds, gts, fnames = fut.result()
            all_pred.extend(preds)
            all_gt.extend(gts)
            all_fname.extend(fnames)
        pool.shutdown(wait=True)  # decode drained BEFORE the multihost gather
        calc = (ev.calculate_detail_kvpe_metric if args.detail_eval
                else ev.calculate_kvpe_metric)
        summary, detail = calc(all_pred, all_gt, all_fname,
                               gather_fn=ev.multihost_gather)
        summary = dict(summary)
        # deduped global sample count — observability for distributed eval
        # (reference logs it in detail mode, pipeline/evaluation.py:646-665)
        summary["num_sample_processed"] = detail.get("num_sample_processed")
        if loss_weight > 0:
            for kk, v in loss_sums.items():
                summary[f"loss_{kk}"] = v / loss_weight
        summary["eval_samples_per_second"] = n_eval / (time.time() - t0)
        if args.save_eval_detail and jax.process_index() == 0:
            with open(os.path.join(args.output_dir, "detail.json"), "w",
                      encoding="utf-8") as f:
                json.dump(detail, f, ensure_ascii=False, indent=1)
        return summary

    # ------------------------------------------------------------------- save
    def save_model(self) -> None:
        """Write a self-contained servable model dir: config + params +
        tokenizer files, so ``InferenceService(output_dir)`` works on a fresh
        train output (reference: trainer.save_model() + processor
        .save_pretrained(), start/run_rfund.py:323-327)."""
        from .checkpoint import save_params_msgpack

        if self.state is None:
            return
        params = self.state.params
        if jax.process_count() > 1:
            # params may be cross-process sharded (fsdp over a multi-host dp
            # axis): EVERY process joins the gather, then only process 0
            # writes (shared-FS output_dir — one writer). Replicated leaves
            # read their local copy; only sharded leaves pay the allgather
            # (tiled=True reassembles the global value from process shards).
            from jax.experimental import multihost_utils

            def to_host(x):
                if isinstance(x, jax.Array) and x.is_fully_replicated:
                    return np.asarray(x.addressable_data(0))
                return multihost_utils.process_allgather(x, tiled=True)

            params = jax.tree_util.tree_map(to_host, params)
            if self._proc != 0:
                return
        else:
            params = jax.device_get(params)
        out_dir = self.args.output_dir
        self.cfg.save_pretrained(out_dir)
        save_params_msgpack(params, os.path.join(out_dir, "params.msgpack"))
        if self.tokenizer is not None and hasattr(self.tokenizer,
                                                  "save_pretrained"):
            try:
                self.tokenizer.save_pretrained(out_dir)
                return
            except Exception as e:
                print(f"[peneo] tokenizer.save_pretrained failed: {e}")
        if self.source_dir and os.path.isdir(self.source_dir):
            import shutil

            from ..registry import TOKENIZER_FILES

            for fname in TOKENIZER_FILES:
                src = os.path.join(self.source_dir, fname)
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(out_dir, fname))
