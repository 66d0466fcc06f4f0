"""Kernel dispatch policy: when do the Pallas kernels run?

Replaces per-call-site guesswork with one resolved policy:

* ``CORNAC_TPU_PALLAS=1`` (or ``on``)  — always use the Pallas kernels.
* ``CORNAC_TPU_PALLAS=0`` (or ``off``) — always use the XLA fallbacks.
* unset / ``auto`` — use Pallas on a directly-attached TPU backend, XLA
  everywhere else. The axon remote-compile PJRT plugin (tunneled
  single-chip rigs) stays on XLA: through r4 Mosaic compilation hung
  indefinitely there; the r5 re-run found the hang gone (canary compiles
  in ~36 s, both kernels execute and the top-k kernel is exact on
  silicon — benchmarks/pallas_silicon.json, pallas_serving_race.py), but
  the measured throughput is 0.42x the XLA path at Netflix serving shape
  (the k-round streaming merge is VPU-serial), so XLA remains the right
  default on that platform either way.

Resolved once per process and cached; tests can override via the env var
or by passing ``force=`` to the kernels directly.
"""

import os

_cached = None


def _resolve():
    env = os.environ.get("CORNAC_TPU_PALLAS", "auto").strip().lower()
    if env in ("1", "on", "true", "yes"):
        return True
    if env in ("0", "off", "false", "no"):
        return False

    import jax

    # the axon plugin registers itself in jax_platforms (sitecustomize sets
    # "axon,cpu"); its devices also report a non-"tpu"/"TPU vX"-style
    # platform. Either signal disables the auto-Pallas path.
    platforms = str(getattr(jax.config, "jax_platforms", "") or "")
    if "axon" in platforms:
        return False
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return dev.platform == "tpu"


def use_pallas():
    """True when kernels should take their Pallas path by default."""
    global _cached
    if _cached is None:
        _cached = _resolve()
    return _cached


def _reset_for_tests():
    global _cached
    _cached = None
