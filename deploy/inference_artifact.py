#!/usr/bin/env python
"""Inference from an exported serving artifact (StableHLO + params) —
equivalent of the reference's onnxruntime service (deploy/inference_onnx.py):
the model program is loaded from the artifact, not rebuilt from python.

    python deploy/inference_artifact.py --artifact_dir ART \
        --dir_image IMGS --dir_ocr OCR --dir_save out.json [--score_thresh T]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ArtifactInferenceService:
    """Same preprocess/decode pipeline as pipeline.infer.InferenceService, but
    the forward pass is the deserialized exported computation."""

    def __init__(self, artifact_dir: str, tokenizer=None,
                 score_thresh: float = 0.0):
        from peneo_tpu.pipeline.infer import InferenceService
        from tools.export_artifact import load_artifact

        call, params, meta, cfg = load_artifact(artifact_dir)
        self._call = call
        self._params = params
        self._meta = meta

        # reuse the host-side pipeline by building the service around the
        # artifact's config/tokenizer, then swapping in the exported forward
        self._svc = InferenceService.__new__(InferenceService)
        svc = self._svc
        import jax

        from peneo_tpu.registry import get_backbone_info, load_tokenizer

        svc.cfg = cfg
        svc.cfg.max_seq_len = meta["max_seq_len"]
        svc.info = get_backbone_info(cfg.backbone_name)
        svc.max_token_len = min(
            svc.info.max_token_len,
            cfg.max_seq_len - int(svc.info.add_cls_token)
            - int(svc.info.add_sep_token))
        svc.score_thresh = score_thresh
        svc.batch_size = meta["batch_size"]
        svc.tokenizer = tokenizer if tokenizer is not None else load_tokenizer(
            svc.info, artifact_dir)
        svc.fetcher = svc.info.tokenizer_fetcher
        svc.image_loader = None
        if meta["has_image"]:
            from peneo_tpu.data.image_processing import make_image_loader

            svc.image_loader = make_image_loader(cfg)
        svc.params = params
        svc._jax = jax

        def forward(p, ids, bbox, attn, image=None):
            args = [p, ids, bbox, attn]
            if meta["has_image"]:
                args.append(image)
            return call(*args)

        svc._forward = forward
        # artifacts serialize the raw per-head dict (export predates the
        # packed-transport optimization); skip the unpack step
        svc._packed = False

    def run(self, *args, **kwargs):
        return self._svc.run(*args, **kwargs)

    def run_page(self, *args, **kwargs):
        return self._svc.run_page(*args, **kwargs)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact_dir", type=str, required=True)
    p.add_argument("--dir_image", type=str, required=True)
    p.add_argument("--dir_ocr", type=str, required=True)
    p.add_argument("--dir_save", type=str, default="inference_results.json")
    p.add_argument("--dir_visualize", type=str, default=None)
    p.add_argument("--score_thresh", type=float, default=0.0)
    args = p.parse_args(argv)

    service = ArtifactInferenceService(args.artifact_dir,
                                       score_thresh=args.score_thresh)
    results = service.run(args.dir_image, args.dir_ocr,
                          visualize_dir=args.dir_visualize)
    with open(args.dir_save, "w", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False, indent=1)
    print(f"[peneo] wrote {args.dir_save}")
    return results


if __name__ == "__main__":
    main()
