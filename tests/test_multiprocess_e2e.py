"""Full trainer + eval under REAL 2-process jax.distributed (VERDICT r2
item 4/7): two CPU processes train on a dp=2 mesh over identical synthetic
batches, then run ``PEneoTrainer.evaluate()`` over an eval set whose files
appear TWICE (overlapping shards) — the case the reference's fname dedup
exists for (reference pipeline/evaluation.py:149-177). Asserts:

- both processes report identical metrics (same gathered, deduped counts);
- the deduped sample count equals the number of UNIQUE files;
- the 2-process training trajectory matches a 1-process run of the same
  global batches (losses within fp32 reduction-order tolerance).
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
port, nproc, pid, repo, data_root, outdir = sys.argv[1:7]
nproc, pid = int(nproc), int(pid)
if nproc > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
sys.path.insert(0, repo)
import jax.numpy as jnp
import numpy as np
from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.collator import PEneoCollator
from peneo_tpu.data.datasets import RFUNDDataset
from peneo_tpu.data.fetchers import fetch_xlm
from peneo_tpu.data.synthetic import ToyTokenizer
from peneo_tpu.models.peneo import PEneoModel
from peneo_tpu.pipeline.trainer import PEneoTrainer, TrainingArguments

tok = ToyTokenizer()
mk = lambda split: RFUNDDataset(data_root, split, "en", tok,
                                tokenizer_fetcher=fetch_xlm,
                                max_token_len=64, add_cls_token=True)
train_ds = mk("train")
val_ds = mk("dev")
# every eval file appears twice -> overlapping shards; dedup must count once
eval_items = [val_ds[i] for i in range(len(val_ds))] * 2

cfg = PEneoConfig(
    backbone_name="lilt-infoxlm-base",
    backbone_config=LiltConfig(
        vocab_size=tok.vocab_size, pad_token_id=0, hidden_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96).to_dict(),
    pair_block_size=16,
    peneo_category_weights=[1.0, 10.0, 10.0],
    peneo_downstream_speedup_ratio=30.0,
)
model = PEneoModel(cfg, dtype=jnp.float32)
args = TrainingArguments(
    output_dir=outdir, learning_rate=1e-3, warmup_ratio=0.0, max_steps=6,
    per_device_train_batch_size=4 // nproc,
    per_device_eval_batch_size=4 // nproc,
    logging_steps=1, eval_steps=0, save_steps=0, start_eval_epoch=0,
    resume=False, metric_for_best_model=None,
)
coll = PEneoCollator(max_seq_len=65, pad_token_id=0, add_cls_token=True)
trainer = PEneoTrainer(cfg, model, args, train_dataset=train_ds,
                       eval_dataset=eval_items, collator=coll)
losses = []
_orig_log = trainer.log
def capture(rec):
    if "loss/total" in rec:
        losses.append(rec["loss/total"])
    _orig_log(rec)
trainer.log = capture
trainer.train()
summary = trainer.evaluate()
print("RESULT " + json.dumps({
    "pid": pid,
    "losses": losses,
    "f1": summary["f1"],
    "precision": summary["precision"],
    "recall": summary["recall"],
    "n_samples": summary["num_sample_processed"],
}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(tmp_path, data_root, nproc):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 real CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(nproc), str(pid),
             REPO, data_root, str(tmp_path / f"out_{nproc}_{pid}")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(nproc)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    return results


def test_two_process_train_eval(tmp_path):
    from peneo_tpu.data.synthetic import write_rfund_dataset

    n_val = 5
    data_root = write_rfund_dataset(str(tmp_path / "rfund"), n_train=8,
                                    n_val=n_val, seed=11)

    dist = _run(tmp_path, data_root, nproc=2)
    solo = _run(tmp_path, data_root, nproc=1)[0]

    # both distributed workers must report the same gathered+deduped metrics
    assert dist[0]["f1"] == dist[1]["f1"]
    assert dist[0]["precision"] == dist[1]["precision"]
    assert dist[0]["n_samples"] == dist[1]["n_samples"]

    # every duplicated eval file counted exactly once
    assert dist[0]["n_samples"] == n_val
    assert solo["n_samples"] == n_val

    # dp=2 over the same global batches tracks the single-process trajectory
    # (differs only by fp32 reduction order in the gradient psum)
    import numpy as np

    np.testing.assert_allclose(dist[0]["losses"], solo["losses"], rtol=1e-4)


def test_two_process_multi_step_dispatch(tmp_path):
    """steps_per_call > 1 under 2 real processes: the group producer stacks
    batches host-side in its thread and the MAIN thread device_puts to the
    (group, dp) sharding — a background cross-process device_put races the
    step all-reduce on the collective channel (gloo abort; see the
    producer comment in pipeline/trainer.py). Asserts both workers finish
    and report identical losses."""
    from peneo_tpu.data.synthetic import write_rfund_dataset

    data_root = write_rfund_dataset(str(tmp_path / "rfund2"), n_train=8,
                                    n_val=2, seed=13)
    worker = WORKER.replace("max_steps=6", "max_steps=4") \
                   .replace("save_steps=0, start_eval_epoch=0,",
                            "save_steps=2, start_eval_epoch=0, "
                            "steps_per_call=2,")
    # a drifted anchor would silently leave the worker at K=1/no-saves and
    # this test green while guarding nothing
    assert "steps_per_call=2" in worker and "max_steps=4" in worker
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # ONE shared output_dir: orbax's multihost save coordinates through the
    # checkpoint directory — per-process dirs deadlock its barrier
    shared_out = str(tmp_path / "ms_out")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(port), "2", str(pid),
             REPO, data_root, shared_out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    assert results[0]["losses"] == results[1]["losses"]
    assert len(results[0]["losses"]) >= 1
