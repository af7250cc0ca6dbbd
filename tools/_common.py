"""Shared bench-tool setup: TPU probe + compilation cache.

The axon backend can hang indefinitely at init when the tunnel is down,
so every tool probes it in a subprocess with a timeout and degrades to
CPU (same pattern as bench.py's _ensure_platform). Import and call
setup_backend() BEFORE any other jax use.
"""

import os
import subprocess
import sys


def setup_backend(timeout: int = 300) -> None:
    import jax

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True)
        if r.returncode != 0:
            raise RuntimeError
    except Exception:
        print("# TPU backend unavailable; falling back to CPU", flush=True)
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
