"""Runtime configuration (SURVEY §5: "kwargs-as-config for API parity;
add a small dataclass config layer for the runtime").

Model hyperparameters stay constructor kwargs exactly like the reference
(``clone()``/hyperopt introspect them); this module configures the things
the reference never had — the device runtime: mesh shape, matmul
precision, and the persistent compilation cache.

Usage::

    from cornac_tpu.config import RuntimeConfig

    cfg = RuntimeConfig(data_parallel=4, matmul_precision="bfloat16",
                        compilation_cache_dir="/tmp/jaxcache")
    cfg.apply()
    mesh = cfg.make_mesh()
"""

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class RuntimeConfig:
    """Device-runtime knobs, applied process-wide."""

    #: size of the mesh's data axis (None = all devices on data)
    data_parallel: Optional[int] = None
    #: default matmul precision: "highest" | "float32" | "bfloat16"
    matmul_precision: str = "highest"
    #: persistent XLA compilation cache directory (None = disabled).
    #: Strongly recommended on remote-compile backends where first
    #: compiles are slow or flaky — retries then hit the local cache.
    compilation_cache_dir: Optional[str] = None
    #: force a platform ("cpu"/"tpu"); None keeps jax's default
    platform: Optional[str] = None
    #: host-device count override for CPU simulation of multi-chip runs
    host_device_count: Optional[int] = None
    #: multi-host: coordinator address "host:port" triggers
    #: ``jax.distributed.initialize`` (SURVEY §7.4); None = single host
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    #: minimum score-matrix cells before per-user order-based metrics
    #: offload rank/tie computation to the device (None keeps the default
    #: tuned for remote-tunnel dispatch latency; lower it on local chips)
    device_metrics_min_cells: Optional[int] = None

    def apply(self):
        """Apply to the current process. Call before the first jax use for
        ``platform``/``host_device_count`` to take effect."""
        import jax

        if self.host_device_count:
            flags = os.environ.get("XLA_FLAGS", "")
            token = f"--xla_force_host_platform_device_count={self.host_device_count}"
            if token not in flags:
                os.environ["XLA_FLAGS"] = (flags + " " + token).strip()
        if self.platform:
            jax.config.update("jax_platforms", self.platform)
        if self.coordinator_address:
            jax.distributed.initialize(
                coordinator_address=self.coordinator_address,
                num_processes=self.num_processes,
                process_id=self.process_id,
            )
        if self.matmul_precision in ("highest", "float32", "bfloat16"):
            jax.config.update(
                "jax_default_matmul_precision",
                {
                    "highest": "highest",
                    "float32": "float32",
                    "bfloat16": "bfloat16",
                }[self.matmul_precision],
            )
        else:
            raise ValueError(
                "matmul_precision must be highest/float32/bfloat16"
            )
        if self.device_metrics_min_cells is not None:
            from .metrics.ranking import set_device_metrics_min_cells

            set_device_metrics_min_cells(self.device_metrics_min_cells)
        if self.compilation_cache_dir:
            os.makedirs(self.compilation_cache_dir, exist_ok=True)
            jax.config.update(
                "jax_compilation_cache_dir", self.compilation_cache_dir
            )
            # cache everything, however small/fast to compile
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        return self

    def make_mesh(self):
        from .parallel import make_mesh

        return make_mesh(data_parallel=self.data_parallel)
