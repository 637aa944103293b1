"""End-to-end LayoutLMv2/XLM training through the CLI on synthetic data:
gradients flow through the native flax ResNeXt-FPN visual tower inside the
jitted train step (the reference fine-tunes layoutxlm via detectron2;
model/backbone_mapping.py:19-24). The lilt/v3 families have equivalent
coverage elsewhere; this closes the v2 gap."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from start import run_rfund


def test_layoutxlm_synthetic_train(tmp_path):
    out = str(tmp_path / "v2run")
    run_rfund.main([
        "--synthetic_data", "--synthetic_model", "tiny",
        "--backbone_name", "layoutxlm-base",
        "--do_train", "--max_steps", "4", "--logging_steps", "1",
        "--eval_steps", "100", "--save_steps", "100",
        "--per_device_train_batch_size", "2", "--max_seq_len", "64",
        "--learning_rate", "1e-3", "--no_resume",
        "--output_dir", out,
    ])
    log = [json.loads(l) for l in open(os.path.join(out, "log.jsonl"))]
    steps = [r for r in log if "loss/total" in r]
    assert len(steps) >= 2
    assert steps[-1]["loss/total"] < steps[0]["loss/total"]
    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["backbone_config"]["visual_depths"] == [1, 1, 1, 1]
    # the synthetic corpus was written with page images for the visual path
    assert os.path.isdir(os.path.join(out, "synthetic_data", "images"))
