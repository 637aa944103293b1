#!/usr/bin/env python
"""Probe: does async dispatch actually start device compute on this
transport, or is execution deferred until the blocking fetch?

Three measurements on the same warmed jitted forward (B=32, L=512):
  A) dispatch -> immediate device_get           (sequential baseline)
  B) dispatch -> host sleep 150 ms -> device_get (if compute overlapped
     the sleep, fetch should be ~transfer-only)
  C) dispatch k+1 -> device_get k                (the serving double buffer)
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_serving import build_assets  # noqa: E402


def main():
    pages, batch, L = 8, 32, 512
    root = tempfile.mkdtemp(prefix="peneo_probe_")
    wdir, img_dir, ocr_dir, _ = build_assets(root, pages, L, 24)

    from peneo_tpu.data.synthetic import ToyTokenizer
    from peneo_tpu.pipeline.infer import InferenceService

    svc = InferenceService(wdir, tokenizer=ToyTokenizer(),
                           batch_size=batch, dtype="bfloat16")
    imgs = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    ocrs = sorted(os.path.join(ocr_dir, f) for f in os.listdir(ocr_dir))
    prep = svc.page_preprocessor()
    page = prep(imgs[0], ocrs[0])
    buf = [page] * batch

    # warm the B=32 compile
    svc._jax.device_get(svc.dispatch_batch(buf))

    def t(f):
        t0 = time.perf_counter()
        r = f()
        return r, time.perf_counter() - t0

    for name, sleep_s in (("A_seq", 0.0), ("B_sleep150", 0.15)):
        ds, fs = [], []
        for _ in range(6):
            _, d = t(lambda: svc.dispatch_batch(buf))
            if sleep_s:
                time.sleep(sleep_s)
            out = None
            t0 = time.perf_counter()
            out = svc._jax.device_get(out if out else _)
            fs.append(time.perf_counter() - t0)
            ds.append(d)
        print(f"{name}: dispatch {sorted(ds)[3]*1e3:.1f} ms  "
              f"fetch {sorted(fs)[3]*1e3:.1f} ms (p50 of 6)")

    # C: double buffered
    ds, fs, cyc = [], [], []
    inflight = svc.dispatch_batch(buf)
    for _ in range(6):
        tc = time.perf_counter()
        nxt, d = t(lambda: svc.dispatch_batch(buf))
        _, f = t(lambda: svc._jax.device_get(inflight))
        inflight = nxt
        ds.append(d)
        fs.append(f)
        cyc.append(time.perf_counter() - tc)
    svc._jax.device_get(inflight)
    print(f"C_dblbuf: dispatch {sorted(ds)[3]*1e3:.1f} ms  "
          f"fetch {sorted(fs)[3]*1e3:.1f} ms  cycle {sorted(cyc)[3]*1e3:.1f} ms")

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
