"""Netflix-shape scale run: 480k users x 17.7k items x ~100M interactions
(the largest dataset the reference ships loaders for,
``cornac/datasets/README.md``; the reference itself tops out here on CPU).

Measures, on the single v5e chip:
  - BPR sampled-SGD training throughput (samples/s) + achieved HBM
    bandwidth vs the v5e peak (embedding SGD is bandwidth-bound: ~3 factor
    rows read+written per sample; MXU utilization is near zero by design),
  - WMF blocked-ALS sweep time + an MXU MFU estimate from the analytic
    FLOP count (2*nnz*k^2 per side + k^3/3 per entity solve),
  - VAECF dense-tower epoch time + MFU (encoder/decoder matmuls dominate:
    ~4*nnz_dense*h per epoch where the user batch matrix is dense),
  - HBM occupancy after each model (device memory_stats).

Prints one JSON line per model. v5e peaks used: 197 TFLOP/s bf16 /
~49 TFLOP/s f32 (4:1), 819 GB/s HBM.
"""

import json
import os
import sys
import time
from collections import OrderedDict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402

V5E_HBM_GBS = 819.0
V5E_F32_TFLOPS = 49.0

N_USERS, N_ITEMS, N_RATINGS = 480_000, 17_700, 100_000_000


def hbm_bytes():
    """Measured device bytes in use, or None when the backend exposes no
    memory stats (the axon remote-compile plugin returns an empty dict, so
    on this rig every occupancy figure in PERF.md is analytic — sizes
    computed from array shapes — not telemetry; rows record null here to
    make that explicit)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        v = int(stats.get("bytes_in_use", 0))
        return v if v > 0 else None
    except Exception:
        return None


def build_dataset(n_r=N_RATINGS, zipf=False):
    from cornac_tpu.data import Dataset

    rng = np.random.RandomState(0)
    u = rng.randint(N_USERS, size=n_r).astype(np.int64)
    if zipf:
        # realistic popularity skew (rank^-0.8 over the catalog; Netflix's
        # most-rated title holds ~0.23% of all ratings — this gives ~1%):
        # item degrees then span 4+ orders of magnitude, the regime where
        # uniform max-degree padding is impossible (see WMF bucketing)
        p = (1.0 + np.arange(N_ITEMS)) ** -0.8
        p /= p.sum()
        i = rng.choice(N_ITEMS, size=n_r, p=p).astype(np.int64)
    else:
        i = rng.randint(N_ITEMS, size=n_r).astype(np.int64)
    key = u * N_ITEMS + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]
    return Dataset(
        num_users=N_USERS,
        num_items=N_ITEMS,
        uid_map=OrderedDict((x, x) for x in range(N_USERS)),
        iid_map=OrderedDict((x, x) for x in range(N_ITEMS)),
        uir_tuple=(u, i, np.ones(len(u), dtype=np.float64)),
        seed=0,
    )


def emit(metric, value, unit, **detail):
    print(
        json.dumps(
            {"metric": metric, "value": value, "unit": unit, "detail": detail}
        ),
        flush=True,
    )


def run_bpr(ds, k=32, epochs=6, batch_size=65536):
    # 6-epoch differential: each fit carries ~45-70 s of host prep +
    # tunnel transfer whose run-to-run noise swamps a 3-epoch delta
    # (observed 13.1 vs 9.1 M samples/s across two 3-epoch runs)
    from cornac_tpu.models import BPR

    nnz = len(ds.uir_tuple[0])
    # verbose=True chunks the fit per epoch: one ~minute device execution
    # per epoch instead of a single multi-minute one, which the tunneled
    # worker kills ("TPU worker process crashed") somewhere past ~1-2 min.
    # Differential timing (fit(1+epochs) - fit(1)) cancels the per-fit
    # host work + tunnel transfers and reports steady-state epoch cost.
    # distinct seeds per fit: the tunnel memoizes identical executions
    # (same program + same args return the cached result near-instantly),
    # which would zero out the baseline fit's timing
    BPR(k=k, max_iter=1, seed=1, batch_size=batch_size, verbose=True).fit(ds)
    t0 = time.time()
    BPR(k=k, max_iter=1, seed=2, batch_size=batch_size, verbose=True).fit(ds)
    t1 = time.time() - t0
    t0 = time.time()
    BPR(k=k, max_iter=1 + epochs, seed=3, batch_size=batch_size,
        verbose=True).fit(ds)
    dt = max(time.time() - t0 - t1, 1e-9)
    sps = epochs * nnz / dt
    # bytes per SGD sample: 3 factor rows (u, i, j) read + written in f32,
    # plus the sampled-id reads (negligible); membership check reads CSR
    bytes_per_sample = 3 * k * 4 * 2
    bw = sps * bytes_per_sample / 1e9
    emit(
        "netflix_bpr_train_throughput",
        round(sps / 1e6, 2),
        "M samples/s",
        interactions=nnz, epochs=epochs, k=k,
        wallclock_s=round(dt, 1),
        fit_overhead_s=round(t1, 1),
        achieved_hbm_gbs=round(bw, 1),
        hbm_bw_utilization=round(bw / V5E_HBM_GBS, 3),
        hbm_bytes_in_use=hbm_bytes(),
    )


def run_wmf(ds, k=64, sweeps=4, batch_size=256):
    """batch_size is the per-solve chunk width — a framework knob: at 128
    the sweep is per-chunk-latency-bound (3889 sequential dispatches,
    33 s/sweep measured); 256 halves the chunk count. Larger widths OOM at
    this shape: the item-side gather temporary is
    (width, max_item_degree~5900, k) f32 — 2048 needs 18 GB of HBM."""
    from cornac_tpu.models import WMF

    nnz = len(ds.uir_tuple[0])
    # verbose=True chunks per sweep (one device execution each — the
    # tunneled worker kills executions past ~2 min)
    # distinct seeds per fit (the tunnel memoizes identical executions),
    # and a WIDE differential: each fit carries ~100 s of host prep +
    # tunnel transfer whose run-to-run noise swamps a 2-sweep delta
    # (observed 6.9/13.8/42 s "per sweep" across three 2-sweep runs;
    # the 4-sweep differential is stable at ~2.5 s)
    kw = dict(k=k, batch_size=batch_size, verbose=True)
    WMF(max_iter=1, seed=1, **kw).fit(ds)
    t0 = time.time()
    WMF(max_iter=1, seed=2, **kw).fit(ds)
    t1 = time.time() - t0
    t0 = time.time()
    WMF(max_iter=1 + sweeps, seed=3, **kw).fit(ds)
    dt = max(time.time() - t0 - t1, 1e-9)
    # analytic FLOPs per sweep: both half-sweeps accumulate sum(v v^T) over
    # observed entries (2*nnz*k^2 each) + one k^3/3 Cholesky-ish solve per
    # entity; rhs/gather terms are lower order
    flops_per_sweep = 2 * 2 * nnz * k * k + (N_USERS + N_ITEMS) * (k ** 3) / 3
    tflops = sweeps * flops_per_sweep / dt / 1e12
    emit(
        "netflix_wmf_als_sweep",
        round(dt / sweeps, 1),
        "s/sweep",
        interactions=nnz, k=k, sweeps=sweeps,
        wallclock_s=round(dt, 1),
        achieved_tflops=round(tflops, 2),
        mfu_vs_f32_peak=round(tflops / V5E_F32_TFLOPS, 3),
        hbm_bytes_in_use=hbm_bytes(),
    )


def run_vaecf(ds, k=32, h=100, epochs=1, batch_size=1024):
    from cornac_tpu.models import VAECF

    t0 = time.time()
    VAECF(
        k=k, autoencoder_structure=[h], n_epochs=epochs,
        batch_size=batch_size, learning_rate=0.001, seed=1, verbose=False,
    ).fit(ds)
    dt = time.time() - t0
    # encoder+decoder fwd+bwd over the dense user-batch matrix:
    # ~3 matmul passes x 2 layers x (n_items*h) per user per epoch
    flops = epochs * N_USERS * (6 * N_ITEMS * h + 6 * h * 2 * k)
    tflops = flops / dt / 1e12
    emit(
        "netflix_vaecf_epoch",
        round(dt / epochs, 1),
        "s/epoch",
        epochs=epochs, h=h, k=k,
        wallclock_s=round(dt, 1),
        achieved_tflops=round(tflops, 2),
        mfu_vs_f32_peak=round(tflops / V5E_F32_TFLOPS, 3),
        hbm_bytes_in_use=hbm_bytes(),
    )


def run_ref_cpu(ds, k=32, epochs=1, threads=0):
    """Same-host CPU baseline: the reference-semantics C++/OpenMP hogwild
    BPR kernel (benchmarks/ref_native/bpr_ref.cpp) on the same data."""
    import ctypes

    import scipy.sparse as sp

    from ref_native import load_kernel

    lib = load_kernel()
    u, i, _ = ds.uir_tuple
    nnz = len(u)
    csr = sp.csr_matrix(
        (np.ones(nnz, np.float32), (u, i)), shape=(N_USERS, N_ITEMS)
    )
    csr.sort_indices()
    indptr = np.asarray(csr.indptr, np.int32)
    item_ids = np.asarray(csr.indices, np.int32)
    user_ids = np.repeat(
        np.arange(N_USERS, dtype=np.int32), np.diff(csr.indptr)
    )
    rng = np.random.RandomState(1)
    U = rng.uniform(size=(N_USERS, k)).astype(np.float32)
    V = rng.uniform(size=(N_ITEMS, k)).astype(np.float32)
    B = np.zeros(N_ITEMS, np.float32)
    p32 = ctypes.POINTER(ctypes.c_int32)
    pf = ctypes.POINTER(ctypes.c_float)
    t0 = time.time()
    lib.bpr_fit_sgd(
        indptr.ctypes.data_as(p32), item_ids.ctypes.data_as(p32),
        user_ids.ctypes.data_as(p32), nnz, N_ITEMS,
        U.ctypes.data_as(pf), V.ctypes.data_as(pf), B.ctypes.data_as(pf),
        k, 0.01, 0.01, 1, 123, 456, threads, epochs,
    )
    dt = time.time() - t0
    emit(
        "netflix_refcpu_bpr_train_throughput",
        round(epochs * nnz / dt / 1e6, 2),
        "M samples/s",
        interactions=nnz, epochs=epochs, k=k, threads=threads or "all",
        wallclock_s=round(dt, 1),
    )


def main():
    bench._enable_compile_cache()
    which = set((sys.argv[1] if len(sys.argv) > 1 else "bpr,wmf,vaecf").split(","))
    # optional 2nd arg: interactions drawn, in millions (default the full
    # Netflix ~100M) — lets a crashed/flaky tunnel session bisect the scale
    n_r = int(float(sys.argv[2]) * 1e6) if len(sys.argv) > 2 else N_RATINGS
    zipf = "zipf" in sys.argv[3:]
    t0 = time.time()
    ds = build_dataset(n_r, zipf=zipf)
    if zipf:
        deg = np.bincount(ds.uir_tuple[1].astype(np.int64), minlength=N_ITEMS)
        print(
            f"[zipf] item degree max={deg.max()} mean={deg.mean():.0f}",
            file=sys.stderr, flush=True,
        )
    print(
        f"[data] {len(ds.uir_tuple[0])} unique interactions, "
        f"{N_USERS}x{N_ITEMS}, built in {time.time()-t0:.0f}s",
        file=sys.stderr, flush=True,
    )
    if "bpr" in which:
        run_bpr(ds)
    if "refcpu" in which:
        run_ref_cpu(ds)
    if "wmf" in which:
        run_wmf(ds)
    if "vaecf" in which:
        run_vaecf(ds)


if __name__ == "__main__":
    main()
