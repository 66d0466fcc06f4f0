"""Force-run the Pallas kernels on the real TPU once (VERDICT r2 #7).

Attempts, under a hard per-step alarm timeout, to compile + run:
  1. a trivial pl.pallas_call copy kernel (the canary: if Mosaic cannot
     compile this through the rig's remote-compile tunnel, nothing else
     will work),
  2. ops/pallas_ranking.fused_topk vs the XLA fallback,
  3. ops/pallas_similarity blocked similarity vs the XLA fallback,
each timed (compile and warm step separately). Writes
benchmarks/pallas_silicon.json with either the measured table or the
blocker record (step that hung + timeout used) — the one-command repro
for the "Mosaic hangs through the axon tunnel" environment note.

Usage:  python benchmarks/pallas_on_silicon.py [--timeout 240]
"""

import argparse
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["CORNAC_TPU_PALLAS"] = "1"  # force the Pallas path everywhere

import numpy as np


class StepTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise StepTimeout()


def timed(fn, timeout):
    """Run fn() with a SIGALRM timeout; returns (seconds | None, error)."""
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(timeout)
    t0 = time.time()
    try:
        fn()
        return time.time() - t0, None
    except StepTimeout:
        return None, f"timed out after {timeout}s"
    except Exception as e:  # compile errors etc.
        return None, f"{type(e).__name__}: {e}"
    finally:
        signal.alarm(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=240)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    out = {
        "platform": str(jax.devices()[0].platform),
        "device": str(jax.devices()[0]),
        "timeout_s": args.timeout,
        "steps": {},
    }

    # -- 1. canary: trivial pallas_call ------------------------------------
    def canary():
        from jax.experimental import pallas as pl

        def copy_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        x = jnp.ones((128, 128), jnp.float32)
        y = pl.pallas_call(
            copy_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
        )(x)
        jax.block_until_ready(y)
        assert float(y[0, 0]) == 2.0

    dt, err = timed(canary, args.timeout)
    out["steps"]["canary_pallas_copy"] = {"seconds": dt, "error": err}
    print(f"[canary] {dt=} {err=}", file=sys.stderr, flush=True)

    if err is None:
        # -- 2. fused top-k vs XLA ----------------------------------------
        from cornac_tpu.ops.pallas_ranking import fused_topk

        rng = np.random.RandomState(0)
        U = jnp.asarray(rng.randn(256, 64).astype(np.float32))
        V = jnp.asarray(rng.randn(8192, 64).astype(np.float32))

        def pallas_topk():
            s, i = fused_topk(U, V, k=100, force="pallas")
            jax.block_until_ready((s, i))

        def xla_topk():
            s, i = fused_topk(U, V, k=100, force="xla")
            jax.block_until_ready((s, i))

        for name, fn in [("pallas_topk", pallas_topk), ("xla_topk", xla_topk)]:
            dt_c, err_c = timed(fn, args.timeout)  # cold (compile)
            dt_w, err_w = (timed(fn, args.timeout) if err_c is None
                           else (None, "skipped"))
            out["steps"][name] = {
                "compile_plus_run_s": dt_c, "warm_s": dt_w,
                "error": err_c or err_w,
            }
            print(f"[{name}] cold={dt_c} warm={dt_w} err={err_c or err_w}",
                  file=sys.stderr, flush=True)

        # -- 3. similarity kernel vs XLA ----------------------------------
        from cornac_tpu.ops.pallas_similarity import cosine_topk

        W = jnp.asarray(rng.randn(2048, 128).astype(np.float32))

        def pallas_sim():
            s, i = cosine_topk(W, k=20, force="pallas")
            jax.block_until_ready((s, i))

        def xla_sim():
            s, i = cosine_topk(W, k=20, force="xla")
            jax.block_until_ready((s, i))

        for name, fn in [("pallas_sim", pallas_sim), ("xla_sim", xla_sim)]:
            dt_c, err_c = timed(fn, args.timeout)
            dt_w, err_w = (timed(fn, args.timeout) if err_c is None
                           else (None, "skipped"))
            out["steps"][name] = {
                "compile_plus_run_s": dt_c, "warm_s": dt_w,
                "error": err_c or err_w,
            }
            print(f"[{name}] cold={dt_c} warm={dt_w} err={err_c or err_w}",
                  file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(__file__), "pallas_silicon.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
