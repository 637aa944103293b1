#!/usr/bin/env python
"""Fine-tune / evaluate PEneo-TPU on RFUND.

CLI surface mirrors the reference start/run_rfund.py (ModelArguments +
DataArguments + the used TrainingArguments subset, start/run_rfund.py:23-81)
so recipes transfer directly:

    python start/run_rfund.py \
        --model_name_or_path /path/to/peneo-weights \
        --data_dir /path/to/rfund --language en \
        --output_dir out --do_train --do_eval \
        --max_steps 25000 --learning_rate 5e-5 --warmup_ratio 0.1 \
        --per_device_train_batch_size 4 --per_device_eval_batch_size 16

Extra TPU-native flags: --dp/--tp mesh shape, --dtype, --synthetic_data (run
end-to-end on generated documents with the toy tokenizer — no downloads).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # model args (reference ModelArguments)
    p.add_argument("--model_name_or_path", type=str, default=None)
    p.add_argument("--backbone_name", type=str, default="lilt-infoxlm-base")
    # data args (reference DataArguments)
    p.add_argument("--data_dir", type=str, required=False)
    p.add_argument("--language", type=str, default="en")
    p.add_argument("--apply_box_aug", action="store_true")
    p.add_argument("--box_aug_quirk", action="store_true",
                   help="with --apply_box_aug: reproduce the reference's "
                        "always-down vertical jitter (data_utils.py:155-160) "
                        "for byte-identical training boxes; default honors "
                        "the drawn direction")
    p.add_argument("--detail_eval", action="store_true")
    p.add_argument("--save_eval_detail", action="store_true")
    p.add_argument("--start_eval_epoch", type=int, default=0)
    # training args (HF TrainingArguments subset actually used)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--max_steps", type=int, default=25000)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--per_device_train_batch_size", type=int, default=4)
    p.add_argument("--per_device_eval_batch_size", type=int, default=16)
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--logging_dir", type=str, default=None)
    p.add_argument("--eval_steps", type=int, default=1000)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--save_total_limit", type=int, default=1)
    p.add_argument("--metric_for_best_model", type=str, default="f1")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_resume", action="store_true")
    # TPU-native extensions
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel chips: pair-grid rows sharded "
                        "(long-context training; OHEM supported)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer state over dp (ZeRO-3)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--max_seq_len", type=int, default=512)
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="optimizer steps per device dispatch (lax.scan)")
    p.add_argument("--dense_labels", action="store_true",
                   help="ship dense label matrices instead of spot arrays")
    p.add_argument("--synthetic_data", action="store_true",
                   help="generate a synthetic RFUND corpus + toy tokenizer")
    p.add_argument("--synthetic_model", type=str, default="small",
                   choices=["tiny", "small", "base"],
                   help="backbone size for --synthetic_data runs")
    p.add_argument("--synthetic_vocab", type=int, default=None,
                   help="override the backbone vocab_size for "
                        "--synthetic_data runs (e.g. 250002 to measure "
                        "training cost at the real XLM vocab; the toy "
                        "tokenizer's ids stay valid)")
    p.add_argument("--fused_biacm_train", action="store_true", default=None,
                   help="train LiLT attention with the fused BiACM kernel "
                        "(custom VJP, in-kernel hardware-PRNG dropout; "
                        "measured 1.9x the XLA attention fwd+bwd). Default: "
                        "auto — on for single-device TPU LiLT runs with "
                        "max_seq_len %% 128 == 0")
    p.add_argument("--no_fused_biacm_train", dest="fused_biacm_train",
                   action="store_false")
    p.add_argument("--fused_bias_attention_train", action="store_true",
                   default=None,
                   help="train LayoutLMv3/v2 attention with the fused "
                        "rel-bias kernel (custom VJP, in-kernel hardware-"
                        "PRNG dropout, dbias into the trained bias tables; "
                        "ops/bias_attention). Default: auto — on for TPU "
                        "v3/v2 runs (the gate itself handles the +197/+49 "
                        "image-token pad and falls back to XLA attention "
                        "past a 10%% pad fraction)")
    p.add_argument("--no_fused_bias_attention_train",
                   dest="fused_bias_attention_train", action="store_false")
    p.add_argument("--quantize_pair_head", type=str, default=None,
                   choices=["int8"],
                   help="quantize the pair head's matmuls on eval forwards "
                        "(s8×s8→s32, ops/quant) — for measuring the decoded-"
                        "F1 delta of the int8 serving mode on a trained "
                        "checkpoint; training stays full precision")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host run: jax.distributed.initialize() with "
                        "auto-detected topology (TPU pods/GKE); the "
                        "torchrun-equivalent launch (one process per host, "
                        "shared output_dir; process 0 writes logs/artifacts)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (implies --distributed; "
                        "needed for manual CPU/GPU multi-process launches)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="override the JAX platform via jax.config (use with "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "for a virtual CPU mesh; setting the JAX_PLATFORMS "
                        "env var instead breaks the forced device count "
                        "under this environment's early PJRT registration)")
    return p


SYNTHETIC_MODEL_PRESETS = {
    "tiny": dict(hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
                 intermediate_size=96),
    "small": dict(hidden_size=240, num_hidden_layers=4, num_attention_heads=4,
                  intermediate_size=480),
    # full lilt-infoxlm-base geometry (sans the 250k real vocab) — for
    # training-throughput measurement on synthetic data
    "base": dict(hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072),
}


def resolve_fused_biacm_train(args, family: str,
                              backend=None, n_devices=None) -> bool:
    """Tri-state --fused_biacm_train → bool.

    Auto (None): on for TPU LiLT runs whose max_seq_len is a multiple of
    128 (the kernel's query-tile size). Every mesh shape is allowed:
    dp/tp shards run the kernel through shard_map (batch over dp, heads
    over tp, per-shard decorrelated dropout seeds — GSPMD itself cannot
    partition the pallas_call; ops/biacm_attention.py *_sharded); sp>1 is
    where the kernel wins most (2.7× at L=2048): the backbone is
    replicated across sp by design and the seeded hardware PRNG draws
    identical masks on every sp chip, so the replicated activations stay
    consistent
    (tests/test_seq_parallel.py::test_sp_train_step_with_fused_biacm_train).
    """
    if args.fused_biacm_train is not None:
        return bool(args.fused_biacm_train)
    import jax

    backend = backend or jax.default_backend()
    return (backend == "tpu" and family == "lilt"
            and args.max_seq_len % 128 == 0)


def resolve_fused_bias_attention_train(args, family: str,
                                       backend=None) -> bool:
    """Tri-state --fused_bias_attention_train → bool.

    Auto (None): on for TPU LayoutLMv3/v2 runs. No max_seq_len alignment
    requirement — maybe_fused_ctx_train pads to the next multiple of 64
    itself (the visual families always run unaligned: +197/+49 image
    tokens) and falls back to XLA attention past a 10% pad fraction, so
    the flag is safe to leave on for any geometry."""
    if getattr(args, "fused_bias_attention_train", None) is not None:
        return bool(args.fused_bias_attention_train)
    import jax

    backend = backend or jax.default_backend()
    return backend == "tpu" and family in ("layoutlmv3", "layoutlmv2")


def setup(args, dataset_cls_name="rfund"):
    """Shared run_rfund/run_sibr setup. Returns (cfg, model, datasets, collator,
    params)."""
    import jax.numpy as jnp

    from peneo_tpu.config import LiltConfig, PEneoConfig
    from peneo_tpu.data.collator import PEneoCollator
    from peneo_tpu.data.datasets import RFUNDDataset, SIBRDataset
    from peneo_tpu.registry import get_backbone_info, load_tokenizer

    params = None
    if args.synthetic_data:
        from peneo_tpu.data.synthetic import ToyTokenizer, write_rfund_dataset, \
            write_sibr_dataset

        info = get_backbone_info(args.backbone_name)
        data_dir = args.data_dir or os.path.join(args.output_dir, "synthetic_data")
        if dataset_cls_name == "rfund":
            if not os.path.exists(os.path.join(data_dir, f"{args.language}.train.json")):
                write_rfund_dataset(data_dir, args.language, n_train=64, n_val=16,
                                    with_images=info.has_visual_embeds)
        else:
            if not os.path.exists(os.path.join(data_dir, "train.txt")):
                write_sibr_dataset(data_dir, n_train=64, n_test=16)
        tokenizer = ToyTokenizer()
        vocab = args.synthetic_vocab or tokenizer.vocab_size
        from peneo_tpu.data.fetchers import fetch_xlm

        fetcher = fetch_xlm
        preset = SYNTHETIC_MODEL_PRESETS[args.synthetic_model]
        if info.family == "layoutlmv3":
            from peneo_tpu.config import LayoutLMv3Config

            backbone_config = LayoutLMv3Config(
                vocab_size=vocab, pad_token_id=0,
                coordinate_size=preset["hidden_size"] // 6,
                shape_size=preset["hidden_size"] // 6,
                input_size=64, **preset).to_dict()
            # concat spatial embeds must sum to hidden_size
            backbone_config["coordinate_size"] = preset["hidden_size"] // 6
            backbone_config["shape_size"] = (
                preset["hidden_size"] - 4 * backbone_config["coordinate_size"]) // 2
        elif info.family == "layoutlmv2":
            from peneo_tpu.config import LayoutLMv2Config

            h = preset["hidden_size"]
            c = h // 6
            full = args.synthetic_model == "base"
            backbone_config = LayoutLMv2Config(
                vocab_size=vocab, pad_token_id=0,
                # 4 coordinate + 2 shape embeds concat to hidden_size
                coordinate_size=c, shape_size=(h - 4 * c) // 2,
                visual_depths=[3, 4, 23, 3] if full else [1, 1, 1, 1],
                # stride-4 p2 must tile into the 7x7 pool grid: 56 -> 14
                input_size=224 if full else 56,
                **preset).to_dict()
        else:
            backbone_config = LiltConfig(
                vocab_size=vocab, pad_token_id=0,
                **preset).to_dict()
        if args.model_name_or_path:
            # synthetic DATA with a saved model (e.g. eval a finished
            # synthetic run): load config + params from the model dir —
            # previously params stayed None and eval crashed in apply
            cfg = PEneoConfig.from_pretrained(args.model_name_or_path)
            cfg.max_seq_len = args.max_seq_len
            cfg.dtype = args.dtype
            params = _load_params(args.model_name_or_path, cfg)
        else:
            cfg = PEneoConfig(
                backbone_name=args.backbone_name,
                backbone_config=backbone_config,
                peneo_category_weights=[1.0, 10.0, 10.0],
                peneo_downstream_speedup_ratio=30.0,
                max_seq_len=args.max_seq_len,
                dtype=args.dtype,
            )
    else:
        assert args.model_name_or_path, "--model_name_or_path required"
        cfg = PEneoConfig.from_pretrained(args.model_name_or_path)
        cfg.max_seq_len = args.max_seq_len
        cfg.dtype = args.dtype
        info = get_backbone_info(cfg.backbone_name or args.backbone_name)
        tokenizer = load_tokenizer(info, args.model_name_or_path)
        fetcher = info.tokenizer_fetcher
        params = _load_params(args.model_name_or_path, cfg)

    from peneo_tpu.models.peneo import PEneoModel

    cfg.use_fused_biacm_train = fused_train = resolve_fused_biacm_train(
        args, get_family(cfg))
    if fused_train:
        # same gate ⇒ eval/serving forwards (deterministic) also take the
        # fused kernel, via its no-dropout inference variant
        cfg.use_fused_biacm = True
    cfg.use_fused_bias_attention_train = fused_bias_train = \
        resolve_fused_bias_attention_train(args, get_family(cfg))
    if fused_bias_train:
        cfg.use_fused_bias_attention = True  # eval forwards, same rationale
    if getattr(args, "quantize_pair_head", None):
        # deterministic (eval) forwards only — the decoder gate keeps
        # training full precision (models/decoder.py)
        cfg.quantize_pair_head = args.quantize_pair_head

    model = PEneoModel(cfg, dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                       else jnp.float32)

    effective_budget = args.max_seq_len - int(info.add_cls_token) \
        - int(info.add_sep_token)
    ds_kwargs = dict(
        tokenizer=tokenizer, tokenizer_fetcher=fetcher,
        max_token_len=min(info.max_token_len, effective_budget + 1),
        add_cls_token=info.add_cls_token,
        add_sep_token=info.add_sep_token,
    )
    aug_kwargs = dict(apply_box_aug=args.apply_box_aug,
                      box_aug_quirk=args.box_aug_quirk)
    if dataset_cls_name == "rfund":
        data_dir = args.data_dir or os.path.join(args.output_dir, "synthetic_data")
        train_ds = RFUNDDataset(data_dir, "train", args.language,
                                **aug_kwargs, **ds_kwargs)
        eval_ds = RFUNDDataset(data_dir, "dev", args.language, **ds_kwargs)
    else:
        data_dir = args.data_dir or os.path.join(args.output_dir, "synthetic_data")
        train_ds = SIBRDataset(data_dir, "train", **aug_kwargs, **ds_kwargs)
        eval_ds = SIBRDataset(data_dir, "test", **ds_kwargs)

    image_loader = None
    if get_family(cfg) in ("layoutlmv3", "layoutlmv2"):
        from peneo_tpu.data.image_processing import make_image_loader

        image_loader = make_image_loader(cfg)
    collator = PEneoCollator(
        max_seq_len=args.max_seq_len,
        pad_token_id=getattr(tokenizer, "pad_token_id", 0) or 0,
        add_cls_token=info.add_cls_token,
        image_loader=image_loader,
        labels_as_spots=not args.dense_labels,
    )
    return cfg, model, train_ds, eval_ds, collator, params


def get_family(cfg):
    try:
        return cfg.backbone_family()
    except ValueError:
        return "lilt"


def _load_params(path, cfg):
    """Load params: our full/backbone-only msgpack exports or a reference
    torch checkpoint (both return dict trees; partial trees are overlaid on a
    fresh init by create_train_state)."""
    from flax.serialization import msgpack_restore

    for name in ("params.msgpack", "backbone_params.msgpack"):
        mp = os.path.join(path, name)
        if os.path.exists(mp):
            with open(mp, "rb") as f:
                return msgpack_restore(f.read())
    from peneo_tpu.pipeline.infer import load_params

    return load_params(path, cfg)


def main(argv=None, dataset_cls_name="rfund"):
    args = build_argparser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.distributed or args.coordinator_address:
        # multi-host launch (replaces the reference's torchrun,
        # README.md:218): with no explicit flags jax.distributed
        # auto-detects the topology on TPU pods / GKE; for manual CPU/GPU
        # launches pass coordinator/num_processes/process_id per process.
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id)
    os.makedirs(args.output_dir, exist_ok=True)
    import jax as _jax

    if _jax.process_index() == 0:
        with open(os.path.join(args.output_dir, "args.json"), "w") as f:
            json.dump(vars(args), f, indent=2)

    cfg, model, train_ds, eval_ds, collator, params = setup(args, dataset_cls_name)

    from peneo_tpu.pipeline.trainer import PEneoTrainer, TrainingArguments

    targs = TrainingArguments(
        output_dir=args.output_dir,
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        max_steps=args.max_steps,
        per_device_train_batch_size=args.per_device_train_batch_size,
        per_device_eval_batch_size=args.per_device_eval_batch_size,
        weight_decay=args.weight_decay,
        logging_steps=args.logging_steps,
        logging_dir=args.logging_dir,
        eval_steps=args.eval_steps,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        metric_for_best_model=args.metric_for_best_model,
        seed=args.seed,
        dp=args.dp,
        tp=args.tp,
        sp=args.sp,
        fsdp=args.fsdp,
        detail_eval=args.detail_eval,
        save_eval_detail=args.save_eval_detail,
        start_eval_epoch=args.start_eval_epoch,
        resume=not args.no_resume,
        steps_per_call=args.steps_per_call,
    )
    trainer = PEneoTrainer(cfg, model, targs, train_ds, eval_ds, collator,
                           params=params,
                           tokenizer=getattr(train_ds, "tokenizer", None),
                           source_dir=args.model_name_or_path)
    if args.do_train:
        trainer.train()
        trainer.save_model()
    if args.do_eval:
        metrics = trainer.evaluate()
        trainer.log({"event": "final_eval", **metrics})
        if _jax.process_index() == 0:  # one writer on the shared output_dir
            with open(os.path.join(args.output_dir,
                                   "eval_results.json"), "w") as f:
                json.dump(metrics, f, indent=2)
        return metrics


if __name__ == "__main__":
    main()
