"""Tracing / profiling utilities.

The reference's observability is per-epoch wall-clock history and tqdm
postfixes (SURVEY.md §5).  This rebuild adds ``jax.profiler`` traces and a
structured per-stage timer that the pipeline and benchmarks share.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

__all__ = ["StageTimer", "trace", "device_memory_stats"]


class StageTimer:
    """Accumulates named wall-clock spans; ``.summary()`` is JSON-friendly."""

    def __init__(self):
        self.spans: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.spans[name] = self.spans.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {name: {"total_s": round(self.spans[name], 4),
                       "calls": self.counts[name],
                       "mean_s": round(self.spans[name]
                                       / max(1, self.counts[name]), 4)}
                for name in self.spans}

    def dump(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fgk_jax_trace"):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Optional[Dict]:
    """Per-device memory stats when the backend exposes them."""
    import jax
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", None)
        if callable(stats):
            try:
                s = stats()
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
            except Exception:
                pass
    return out or None


_CACHE_DIR = "/tmp/fgk_jax_cache"


def enable_compilation_cache(path: str = _CACHE_DIR) -> None:
    """Enable JAX's persistent compilation cache (first compiles on the
    axon tunnel cost 15-60 s each; cached reruns skip them)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def clear_compilation_cache(path: str = _CACHE_DIR) -> None:
    """Wipe the persistent compile cache (stale AOT artifacts from a
    libtpu/host-feature skew raise FAILED_PRECONDITION on reload)."""
    import shutil
    shutil.rmtree(path, ignore_errors=True)


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` actually stick.

    The axon TPU plugin registers itself regardless of the env var, so a
    CLI run under ``JAX_PLATFORMS=cpu`` still places every jnp array on
    the TPU tunnel (and can block forever if a previous client is
    draining).  Mirroring the env var into ``jax.config`` — what
    tests/conftest.py already does — forces the requested platform for
    the example CLIs too."""
    import os
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        try:
            import jax
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass


def run_with_cache_retry(fn, *args, **kwargs):
    """Run fn; on a FAILED_PRECONDITION / compile-cache-skew error, clear
    the persistent cache and retry once with fresh compiles."""
    honor_platform_env()
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001 - intentional broad retry gate
        msg = str(e)
        if ("FAILED_PRECONDITION" in msg or "compilation cache" in msg
                or "AOT" in msg):
            clear_compilation_cache()
            return fn(*args, **kwargs)
        raise
