"""Steady-state VAECF epoch time at Netflix shape for the r5 sparse-
coordinate redesign (models/vaecf.py): dense 34 GB matrix never exists —
the CSR coordinates (~0.8 GB int32) upload once and every batch densifies
on device with a masked scatter, so a whole multi-epoch chunk is one
compiled program with zero per-step transfer.

Differential timing per this rig's rules (benchmarks/README.md): epoch
cost = (t(fit 1+k epochs) - t(fit 1 epoch)) / k, both warm. The r4
dense-streaming baseline measured 242 s/epoch with 95% of it tunnel
transfer of f32 zeros (PERF.md Netflix table).

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
from scale_netflix import build_dataset  # noqa: E402

K_EXTRA = 3


def main():
    bench._enable_compile_cache()
    from cornac_tpu.models import VAECF

    t0 = time.time()
    ds = build_dataset()
    print(f"[data] built in {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    kw = dict(k=32, autoencoder_structure=[100], batch_size=1024,
              learning_rate=0.001, seed=1, verbose=False)

    t0 = time.time()
    VAECF(n_epochs=1, **kw).fit(ds)
    t1 = time.time() - t0  # upload + trace/compile (cache-warm) + 1 epoch

    t0 = time.time()
    VAECF(n_epochs=1 + K_EXTRA, **kw).fit(ds)
    tk = time.time() - t0

    per_epoch = (tk - t1) / K_EXTRA
    print(json.dumps({
        "metric": "netflix_vaecf_epoch_steady",
        "value": round(per_epoch, 1),
        "unit": "s/epoch",
        "detail": {
            "fit1_wallclock_s": round(t1, 1),
            "fit4_wallclock_s": round(tk, 1),
            "r4_dense_stream_baseline_s": 242.0,
            "speedup_vs_r4": round(242.0 / per_epoch, 1),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
