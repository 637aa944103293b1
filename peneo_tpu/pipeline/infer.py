"""Serving: image + line-level OCR → key/value pairs.

TPU-native equivalent of the reference's deploy/inference.py:110-464 (and its
onnxruntime twin deploy/inference_onnx.py): the deployment artifact is the
jitted apply function itself (fixed shapes, bf16) — no ONNX export step is
needed; see tools/export_artifact.py for the serialized-compilation path.

Preprocessing parity (deploy/inference.py:205-373): OCR JSON accepts
``text|ocr`` and ``bbox|box`` keys (4- or 8-point boxes), lines are
reading-order sorted, cleaned with the deploy-variant text replacement
(:182-203 — extends the RFUND cleanup with quotes/em-dash/™/§/¢), tokenized
per line, truncated at ``max_token_len`` with a strict ``>`` check (the
datasets use ``>=`` — both reproduced faithfully), empty lines skipped.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

from ..config import PEneoConfig
from ..registry import get_backbone_info
from . import decode as dec

# Preprocessing helpers live in the jax-free pipeline/preprocess.py so
# worker processes can import them without initializing a device client;
# re-exported here for compatibility.
from .preprocess import (  # noqa: F401
    PagePreprocessor,
    deploy_text_cleanup,
    read_ocr_json,
    tesseract_ocr,
)


class InferenceService:
    """Load a trained PEneo-TPU model and run page → kv-pair extraction."""

    # default for instances assembled attribute-by-attribute via __new__
    # (deploy/inference_artifact.py — exported artifacts have one fixed
    # shape, so bucketing stays a live-serving feature)
    bucket_lengths = None
    # raw uint8 image serving (device-side normalize) is a live-service
    # feature too: exported artifacts were traced with fp32 image inputs
    raw_image = False

    def __init__(
        self,
        model_name_or_path: str,
        tokenizer=None,
        max_seq_len: Optional[int] = None,
        batch_size: int = 1,
        dtype: str = "bfloat16",
        score_thresh: float = 0.0,
        dp: int = 1,
        tp: int = 1,
        sp: int = 1,
        fused_biacm: Optional[bool] = None,
        fused_bias_attention: Optional[bool] = None,
        int8_pair_head: Optional[bool] = None,
        int8_backbone: bool = False,
        bucket_lengths=None,
        spot_streaming: Optional[bool] = None,
    ) -> None:
        """``dp``/``tp``/``sp`` > 1 serve over a ``jax.sharding.Mesh``: the
        page batch shards over dp chips, the attention/MLP/pair-head kernels
        split Megatron-style over tp (parallel/mesh.py rules), and ``sp``
        shards the O(L²) pair grid's rows (parallel/seq_parallel.py) — the
        long-context axis: at L ≫ 512 the pair grid dominates, and sp chips
        each score 1/sp of it. One jitted forward scales from one chip to a
        pod slice. ``batch_size`` must be divisible by dp."""
        import jax
        import jax.numpy as jnp

        from ..models.peneo import PEneoModel
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()  # fresh serving processes skip the 1-6 min
        # full-model compile (reference torch eager has no cold start)
        self.cfg = PEneoConfig.from_pretrained(model_name_or_path)
        if int8_pair_head is None:
            # Auto = ON for TPU serving (round 4, measured): +6.9% at
            # L=512 (270.2 → 288.5 pages/s) / +9.1% at L=2048 repeated on
            # v5e, and decoded held-out P/R/F1 on a trained checkpoint are
            # BIT-IDENTICAL to bf16 (0.79581/0.79167/0.79373 both ways;
            # eval losses differ only ~0.3% rel — the quantization noise
            # never flips a decode decision; docs §8). Opt out via the
            # ctor / --no_int8_pair_head for exact bf16 logits.
            # Under sp > 1 auto stays OFF: the stacked-weight formulation
            # the sp shards run measured ≈neutral-to-losing in the
            # long-context regime sp exists for (0.99× at L=2048, 0.95× at
            # L=4096; 1.24× only at L=1024 — tools/bench_sp_pair.py,
            # docs §8). Explicit int8_pair_head=True is still honored.
            int8_pair_head = jax.default_backend() == "tpu" and sp == 1
        if int8_pair_head:
            # quantize the pair head's dominant matmuls to s8×s8→s32
            # (ops/quant.Int8Dense); under sp > 1 the stacked-weight
            # evaluation quantizes the first layers the same way
            # (ops/pair_head.stack_head_weights_int8). Measured: the
            # stacked formulation is ≈neutral at L=2048 B=1 (0.99×,
            # tools/bench_sp_pair.py, docs §8) — the stacked matmul is
            # already MXU-bound at 5× width — so under sp the flag mainly
            # buys uniformity with the module path, not speed.
            self.cfg.quantize_pair_head = "int8"
        if int8_backbone:
            self.cfg.quantize_backbone = "int8"
        if max_seq_len:
            self.cfg.max_seq_len = max_seq_len
        if spot_streaming is None:
            # Default OFF: the v5e A/B (docs §8, round 5) measured the dense
            # compact_spots path FASTER at 6 of 7 geometries (streaming won
            # only LiLT L=2048 B=8, +9.4%; it lost 15-31% at L=512/1024/4096)
            # — XLA already fuses the argmax/max into the pair-head epilogue,
            # while streaming adds a per-block top-k on the critical path.
            # Kept as an opt-in knob; spot sets are identical either way
            # (tests/test_spot_streaming.py).
            spot_streaming = False
        self.cfg.spot_streaming = bool(spot_streaming)
        self.info = get_backbone_info(self.cfg.backbone_name)
        # fused BiACM attention (ops/biacm_attention.py) is the serving
        # default on real TPUs: measured +7-8% end-to-end at L=512
        # (248.7 -> 265-269 pages/s, docs §8). Auto-off elsewhere — the
        # interpret-mode fallback exists for correctness tests, not speed.
        # Under dp/tp meshes the kernel runs via shard_map (batch over dp,
        # heads over tp — attention is independent per (batch, head), so
        # the per-chip blocks need zero collectives; models/lilt.py).
        if fused_biacm is None:
            import jax as _jax

            fused_biacm = (self.info.family == "lilt"
                           and _jax.default_backend() == "tpu")
        if fused_biacm:
            self.cfg.use_fused_biacm = True
        # the single-stream sibling for the rel-bias families
        # (ops/bias_attention.py). Auto = ON for TPU: measured on v5e
        # (docs §8) — LayoutLMv3 L=512(+197 img tokens) 97.5 → 114.5
        # pages/s (+17.5%), LayoutLMv2 L=512(+49) B=16 104.6 → 123.8
        # (+18.4%), v3 L=2048 9.8 → 12.2 (+24.7%); on-TPU parity
        # rel ≤ 7e-4 at the real serving shapes (tools/
        # check_bias_attention.py). Opt out via the ctor / CLI flag.
        if fused_bias_attention is None:
            import jax as _jax

            fused_bias_attention = _jax.default_backend() == "tpu"
        if (fused_bias_attention
                and self.info.family in ("layoutlmv3", "layoutlmv2")):
            self.cfg.use_fused_bias_attention = True
        self.max_token_len = min(
            self.info.max_token_len,
            self.cfg.max_seq_len - int(self.info.add_cls_token)
            - int(self.info.add_sep_token))
        self.score_thresh = score_thresh
        self.batch_size = batch_size
        # Length-bucketed serving: the pair grid is O(L²), so a page with
        # 150 tokens padded to L=512 pays ~11× its pair-head FLOPs. With
        # ``bucket_lengths`` the directory runner groups pages by real
        # token length and pads each batch only to the smallest bucket
        # that fits (one cached XLA executable per bucket — static shapes,
        # retraced once each). The reference always pads to 512
        # (deploy/inference.py:318-335). Buckets should be multiples of
        # 128 so the fused BiACM kernel stays engaged (models/lilt.py L%128
        # gate); others still run via the XLA attention path.
        if bucket_lengths:
            bl = sorted({int(b) for b in bucket_lengths
                         if 0 < int(b) <= self.cfg.max_seq_len})
            if not bl:
                raise ValueError(
                    f"bucket_lengths {bucket_lengths!r} has no entry in "
                    f"(0, max_seq_len={self.cfg.max_seq_len}]")
            if bl[-1] != self.cfg.max_seq_len:
                bl.append(self.cfg.max_seq_len)  # overflow bucket
            self.bucket_lengths = bl

        if tokenizer is None:
            from ..registry import load_tokenizer

            tokenizer = load_tokenizer(self.info, model_name_or_path)
        self.tokenizer = tokenizer
        self.fetcher = self.info.tokenizer_fetcher

        self.mesh = None
        self.batch_sharding = None
        self.sp = sp
        if dp * tp * sp > 1:
            assert batch_size % dp == 0, (batch_size, dp)
            from ..parallel import mesh as pmesh

            self.mesh = pmesh.make_mesh(dp=dp, tp=tp, sp=sp,
                                        devices=jax.devices()[:dp * tp * sp])
            self.batch_sharding = pmesh.batch_sharding(self.mesh)
        self.model = PEneoModel(
            self.cfg, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            mesh=self.mesh if dp * tp > 1 else None)
        params = load_params(model_name_or_path, self.cfg)
        if params is None:
            raise FileNotFoundError(
                f"no params.msgpack / pytorch_model.bin under {model_name_or_path}")
        if dp * tp * sp > 1:
            shardings = pmesh.param_shardings(params, self.mesh)
            self.params = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(jnp.asarray(x), s),
                params, shardings)
        else:
            # pin params on device once — host-resident numpy params would be
            # re-transferred on every forward call
            self.params = jax.tree_util.tree_map(jnp.asarray, params)

        self.image_loader = None
        if self.info.has_visual_embeds:
            from ..data.image_processing import make_image_loader

            # live serving ships resized uint8 pages and normalizes on
            # device (data/image_processing.device_image_normalize): the
            # host skips the float conversion/transpose and the per-batch
            # image upload drops 4× (fp32 602 KB → uint8 150 KB per page —
            # on this remote transport the upload is serial with dispatch).
            # Outputs are bit-identical (same IEEE fp32 ops, u8→f32 exact).
            self.raw_image = True
            self.image_loader = make_image_loader(self.cfg, raw=True)

        # pack the 25 compact-spot output arrays into 2 for the fetch
        # (models/decoder.pack_spots): fewer per-array RTTs on the remote
        # transport. Measured gain is modest at L=512 (the fetch overlaps
        # device compute under double buffering) but it removes the
        # per-array latency floor entirely for small batches.
        self._packed = self.cfg.max_spots_per_head > 0

        fam = self.info.family

        def _prep_image(image):
            # raw-uint8 serving: normalize/transpose in-jit (fuses into the
            # patch-conv / tower layout); fp32 inputs pass through untouched
            if image is not None and image.dtype == jnp.uint8:
                from ..data.image_processing import device_image_normalize

                return device_image_normalize(image, fam)
            return image

        if sp > 1:
            # sequence-parallel serving: the backbone runs under dp/tp GSPMD,
            # then the pair grid is row-sharded over sp via shard_map
            # (parallel/seq_parallel.py) — each sp shard uses the XLA
            # blockwise math.
            assert self.cfg.max_spots_per_head > 0, \
                "sp serving requires compact spot extraction"
            from ..models.decoder import HEAD_NAMES
            from ..ops.pair_head import (stack_head_weights,
                                         stack_head_weights_int8)
            from ..parallel.seq_parallel import sp_pair_spots

            quant_sp = getattr(self.cfg, "quantize_pair_head", None) == "int8"

            def _fwd(p, ids, bbox, attn, image):
                pair_in = self.model.apply(
                    {"params": p}, ids, bbox, attn, image=_prep_image(image),
                    deterministic=True, return_pair_inputs=True)
                stack = stack_head_weights_int8 if quant_sp \
                    else stack_head_weights
                weights = stack(
                    p["peneo_decoder"], HEAD_NAMES, self.model.dtype)
                out = sp_pair_spots(
                    pair_in["a"], pair_in["b"], weights, self.mesh,
                    self.cfg.max_spots_per_head,
                    valid_len=int(pair_in["valid_len"]),
                    topk_method=self.cfg.spot_topk)
                from ..models.decoder import pack_spots

                return pack_spots(out)
        else:
            def _fwd(p, ids, bbox, attn, image):
                out = self.model.apply(
                    {"params": p}, ids, bbox, attn, image=_prep_image(image),
                    deterministic=True)
                if self._packed:
                    from ..models.decoder import pack_spots

                    return pack_spots(out)
                return out

        self._forward = jax.jit(_fwd)
        self._jax = jax

    # ------------------------------------------------------------- preprocess
    def page_preprocessor(self) -> PagePreprocessor:
        """The picklable preprocessing pipeline for this service (see
        pipeline/preprocess.py). Built on demand so alternative construction
        paths (deploy/inference_artifact.py assembles the service attribute
        by attribute) keep working."""
        prep = PagePreprocessor(
            tokenizer=self.tokenizer, fetcher=self.fetcher,
            max_token_len=self.max_token_len,
            max_seq_len=self.cfg.max_seq_len,
            add_cls_token=self.info.add_cls_token,
            add_sep_token=self.info.add_sep_token,
            image_cfg=self.cfg if self.image_loader is not None else None,
            raw_image=self.raw_image,
            _image_loader=self.image_loader)
        return prep

    def preprocess_page(self, image_path: str, ocr_path: Optional[str]):
        """One page → (arrays dict, fetched token texts, per-token orig boxes)."""
        return self.page_preprocessor()(image_path, ocr_path)

    # --------------------------------------------------------------- pipeline
    def run_page(self, image_path: str, ocr_path: Optional[str]):
        arrays, texts, orig_bbox, seq_len = self.preprocess_page(image_path, ocr_path)
        if self.mesh is not None:
            # sharded serving: single pages ride the batch path (padded to
            # batch_size) so inputs/params share the mesh placement
            return self.run_batch([(arrays, texts, orig_bbox, seq_len)])[0]
        batched = {k: v[None] for k, v in arrays.items()}
        out = self._jax.device_get(self._forward(
            self.params, batched["input_ids"], batched["bbox"],
            batched["attention_mask"], batched.get("image")))
        if self._packed:
            out = dec.unpack_spots(*out)
        kv_pairs, lines, *_ = dec.decode_pred_sample(
            texts, out, 0, seq_len, bbox=orig_bbox,
            score_thresh=self.score_thresh)
        return kv_pairs, lines

    def _bucket_for(self, n_rows: int) -> int:
        """Smallest configured bucket covering ``n_rows`` real token rows
        (CLS/SEP included); the top bucket is always max_seq_len."""
        for b in self.bucket_lengths:
            if n_rows <= b:
                return b
        return self.bucket_lengths[-1]

    def dispatch_batch(self, page_inputs, bucket: Optional[int] = None):
        """Stack up to ``batch_size`` preprocessed pages and launch the
        forward asynchronously. Returns the in-flight device output; pair
        with :meth:`collect_batch`. Keeping one batch in flight while the
        previous one is fetched + host-decoded hides the dispatch RTT and
        overlaps host decode with device compute (double buffering).

        ``bucket`` truncates the sequence axis to that length before
        stacking (safe: preprocess pads at the tail, and every page in a
        bucketed batch has ≤ ``bucket`` real rows)."""
        n = len(page_inputs)
        assert 0 < n <= self.batch_size

        def cut(k, v):
            # input_ids (L,), bbox (L,4), attention_mask (L,) are L-leading;
            # image tensors are not sequence-shaped
            return v[:bucket] if bucket and k != "image" else v

        pads = self.batch_size - n
        stacked = {
            k: np.stack([cut(k, pi[0][k]) for pi in page_inputs]
                        + [cut(k, page_inputs[-1][0][k])] * pads)
            for k in page_inputs[0][0]
        }
        if self.batch_sharding is not None:
            stacked = {k: self._jax.device_put(v, self.batch_sharding)
                       for k, v in stacked.items()}
        # input packing was tried and measured SLOWER both ways: (B, L, 6)
        # pads 6 → 128 TPU lanes; (B, 6, L) forces a bbox relayout before the
        # embedding gathers. Three separate transfers win on this transport.
        return self._forward(
            self.params, stacked["input_ids"], stacked["bbox"],
            stacked["attention_mask"], stacked.get("image"))

    def collect_batch(self, out_device, page_inputs):
        """Fetch a dispatched forward and host-decode its pages (padded rows
        are discarded)."""
        out = self._jax.device_get(out_device)
        if self._packed:
            out = dec.unpack_spots(*out)
        results = []
        for i, (_, texts, orig_bbox, seq_len) in enumerate(page_inputs):
            kv_pairs, lines, *_ = dec.decode_pred_sample(
                texts, out, i, seq_len, bbox=orig_bbox,
                score_thresh=self.score_thresh)
            results.append((kv_pairs, lines))
        return results

    def run_batch(self, page_inputs):
        """Synchronous forward over preprocessed pages (see dispatch/collect
        for the pipelined form the directory runner uses)."""
        return self.collect_batch(self.dispatch_batch(page_inputs),
                                  page_inputs)

    def _decode_page(self, out_host, idx, page, dt, img_path, visualize_dir):
        """One page's host decode → result record (runs on the decode pool)."""
        _, texts, orig_bbox, seq_len = page
        return dec.decode_page_record(
            texts, out_host, idx, seq_len, dt, img_path, visualize_dir,
            self.score_thresh, orig_bbox)

    def run(self, image_dir: str, ocr_dir: Optional[str] = None,
            visualize_dir: Optional[str] = None,
            workers: int = 4, decode_workers: int = 2,
            preprocess_procs: int = 0,
            inflight_depth: int = 2) -> Dict[str, Dict]:
        """Batch inference over a directory: pages are preprocessed in a
        worker pool and fed ``batch_size`` at a time (the north-star
        batch-serving path; per-page mode is ``batch_size=1``).

        Pipelining: the main thread only dispatches forwards and fetches
        outputs (``inflight_depth`` batches in flight, default 2); per-page
        decode is submitted to a separate small pool so it never blocks the
        next dispatch — decode of batch i overlaps device compute of batch
        i+1 AND the fetch of batch i+1. A separate pool is required: the
        preprocess pool's queue holds every remaining page, so decode tasks
        submitted there would wait for all preprocessing to finish.

        ``inflight_depth=2`` keeps a second batch queued on the device so
        the accelerator never starves while the main thread waits for the
        GIL behind decode/preprocess threads: with depth 1 the measured
        steady-state cycle was 139 ms/batch vs a 118 ms compute-bound loop
        (tools/probe_overlap.py) — the ~21 ms/batch was late dispatch, not
        device time. Depth 2 absorbs that host jitter entirely.

        ``preprocess_procs`` > 0 preprocesses in spawned WORKER PROCESSES
        instead of ``workers`` threads. Measured guidance (docs §6): keep
        the thread default for text-only serving — preprocess is ~2
        ms/page there (not the bottleneck) and the parent's result
        unpickling caps a process pool at roughly serial throughput; use
        processes only when per-page host work is genuinely heavy (visual
        backbones decoding+resizing page images, slow tokenizers).
        Workers import only the jax-free pipeline/preprocess.py (never a
        device client).

        Decode stays on THREADS by measurement (docs §8 removal record):
        a decode process pool lost at every configuration (best 217 vs 233
        pages/s steady at 256 pages even with jax-free prespawned workers
        and one pickle per batch) — the native chain-walk already releases
        the GIL (ctypes.CDLL foreign calls drop it by construction), the
        dispatch thread is transfer/compute-bound, and IPC serialization
        costs more host CPU than the python decode slices it removes."""
        image_paths = sorted(
            os.path.join(image_dir, f) for f in os.listdir(image_dir)) \
            if os.path.isdir(image_dir) else [image_dir]
        if ocr_dir is None:
            ocr_paths = [None] * len(image_paths)  # tesseract apply_ocr mode
        elif os.path.isdir(ocr_dir):
            # pair OCR JSONs to images by basename stem — positional zip of
            # two sorted listings silently shifts every pairing after one
            # misnamed file; a missing stem is a hard error instead
            by_stem = {}
            for f in os.listdir(ocr_dir):
                stem = os.path.splitext(f)[0]
                if stem in by_stem:
                    raise ValueError(
                        f"duplicate OCR stem '{stem}' in {ocr_dir}: "
                        f"{by_stem[stem]} vs {f}")
                by_stem[stem] = f
            missing = [os.path.basename(p) for p in image_paths
                       if os.path.splitext(os.path.basename(p))[0]
                       not in by_stem]
            if missing:
                raise FileNotFoundError(
                    f"no OCR JSON for image(s) {missing[:5]}"
                    f"{'…' if len(missing) > 5 else ''} in {ocr_dir} "
                    "(matched by basename stem)")
            ocr_paths = [
                os.path.join(ocr_dir,
                             by_stem[os.path.splitext(os.path.basename(p))[0]])
                for p in image_paths]
        else:
            ocr_paths = [ocr_dir]
        assert len(image_paths) == len(ocr_paths), \
            "image/OCR counts differ"

        from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

        from .preprocess import jaxfree_spawn_env, prespawn

        if preprocess_procs > 0:
            import multiprocessing as mp

            from .preprocess import _init_worker, _preprocess_task

            # spawn (never fork): this process holds an initialized device
            # client, which must not leak into workers. Spawn eagerly with
            # the sitecustomize TPU gate off — a bare worker interpreter
            # starts ~8× faster and never dials the (serializing) tunnel.
            with jaxfree_spawn_env():
                pool = ProcessPoolExecutor(
                    max_workers=preprocess_procs,
                    mp_context=mp.get_context("spawn"),
                    initializer=_init_worker,
                    initargs=(self.page_preprocessor(),))
                prespawn(pool, preprocess_procs)
            prep_map = lambda pairs: pool.map(  # noqa: E731
                _preprocess_task, pairs, chunksize=2)
        else:
            pool = ThreadPoolExecutor(max_workers=workers)
            prep = self.page_preprocessor()
            prep_map = lambda pairs: pool.map(  # noqa: E731
                lambda pair: prep(*pair), pairs)

        from collections import deque

        dpool_cm = ThreadPoolExecutor(max_workers=decode_workers)

        results = {}
        pending = []  # (basename, future) in input order
        t_start = time.perf_counter()
        with pool, dpool_cm as dpool:
            prepped = prep_map(zip(image_paths, ocr_paths))
            # one (pages, paths) buffer per length bucket (a single None
            # bucket when bucketing is off); pages stream into the buffer
            # their length selects and each dispatches independently, so
            # the pipeline stays double-buffered across buckets
            bufs: Dict[Optional[int], tuple] = {}
            inflight = deque()  # (device_out, pages, paths, t_dispatch)

            def collect():
                out_dev, pages, paths, t0 = inflight.popleft()
                out = self._jax.device_get(out_dev)
                if self._packed:
                    out = dec.unpack_spots(*out)
                dt = (time.perf_counter() - t0) / len(pages)
                for i, (img, page) in enumerate(zip(paths, pages)):
                    fut = dpool.submit(self._decode_page, out, i,
                                       page, dt, img, visualize_dir)
                    pending.append((os.path.basename(img), fut))

            def flush(bucket):
                # launch this batch, THEN fetch the oldest in-flight one
                # while the device works — hides dispatch RTT and keeps
                # the device queue non-empty across host GIL stalls
                pages, paths = bufs.get(bucket, ((), ()))
                if not pages:
                    return
                out_dev = self.dispatch_batch(pages, bucket=bucket)
                inflight.append((out_dev, list(pages), list(paths),
                                 time.perf_counter()))
                pages.clear()
                paths.clear()
                if len(inflight) > max(1, inflight_depth):
                    collect()

            add_cls = int(self.info.add_cls_token)
            for img, page in zip(image_paths, prepped):
                # page[3] is seq_len (grid rows, CLS excluded; SEP already
                # counted) — total real rows = seq_len + add_cls
                bucket = (self._bucket_for(page[3] + add_cls)
                          if self.bucket_lengths else None)
                pages, paths = bufs.setdefault(bucket, ([], []))
                pages.append(page)
                paths.append(img)
                if len(pages) == self.batch_size:
                    flush(bucket)
            for bucket in sorted(bufs, key=lambda b: b or 0):
                flush(bucket)
            while inflight:
                collect()
            for name, fut in pending:
                results[name] = fut.result()
        n = len(image_paths)
        if n:
            total = time.perf_counter() - t_start
            print(f"[peneo] processed {n} pages, avg {total / n:.4f}s/page "
                  f"(batch_size={self.batch_size})")
        return results


def load_params(path: str, cfg: PEneoConfig):
    """Params from our msgpack export or a reference torch checkpoint."""
    mp = os.path.join(path, "params.msgpack")
    if os.path.exists(mp):
        from flax.serialization import msgpack_restore

        with open(mp, "rb") as f:
            return msgpack_restore(f.read())
    for name in ("model.safetensors", "pytorch_model.bin"):
        fp = os.path.join(path, name)
        if not os.path.exists(fp):
            continue
        from ..models.convert import convert_peneo_checkpoint, \
            torch_state_dict_to_numpy

        if name.endswith(".safetensors"):
            from safetensors.numpy import load_file

            sd = load_file(fp)
        else:
            import torch

            sd = torch_state_dict_to_numpy(
                torch.load(fp, map_location="cpu", weights_only=True))
        return convert_peneo_checkpoint(sd, cfg)
    return None
