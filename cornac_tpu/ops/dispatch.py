"""Kernel dispatch policy: when do the Pallas kernels run?

Replaces per-call-site guesswork with one resolved policy:

* ``CORNAC_TPU_PALLAS=1`` (or ``on``)  — always use the Pallas kernels.
* ``CORNAC_TPU_PALLAS=0`` (or ``off``) — always use the XLA fallbacks.
* unset / ``auto`` — XLA everywhere, because that is what measurement
  says: r5 was the first round able to run the Pallas kernels on real
  silicon (through r4 Mosaic compilation hung on this rig's tunnel; the
  r5 re-run found the hang gone — canary ~36 s cold, both kernels
  execute, and the top-k kernel is exact after the tie-break fix,
  benchmarks/pallas_silicon.json + pallas_serving_race.py), and the
  measured throughput on the v5e is 0.42x the XLA TopK path at Netflix
  serving shape (the k-round streaming merge is VPU-serial). Until a
  backend is measured where the streaming kernel wins (its advantage is
  HBM frugality — no (B, N) score matrix — not speed), Pallas stays
  opt-in via the env var or ``force="pallas"``.

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

    # auto = XLA on every backend measured so far (see module docstring);
    # flip per-process with CORNAC_TPU_PALLAS=1 or per-call with force=
    return False


def use_pallas():
    """True when kernels should take their Pallas path by default."""
    global _cached
    if _cached is None:
        _cached = _resolve()
    return _cached


def _reset_for_tests():
    global _cached
    _cached = None
