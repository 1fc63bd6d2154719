"""Timing and device-memory monitoring.

TPU-era counterpart of reference ssak/utils/monitoring.py (tic/toc:85-113,
vram_peak:209): named wall-clock timers with cumulative totals, JAX
device-memory statistics instead of py3nvml, and audio-seconds-per-second
throughput meters for ASR workloads.
"""

import logging
import time

logger = logging.getLogger("ssak_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(levelname)s|ssak_tpu] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

_CLOCKS = {}
_TOTALS = {}


def tic(name: str = "") -> float:
    """Start (or restart) a named wall-clock timer."""
    t = time.perf_counter()
    _CLOCKS[name] = t
    return t


def toc(name: str = "", stream=None, log_total: bool = False) -> float:
    """Elapsed seconds since tic(name); accumulates per-name totals."""
    t = time.perf_counter() - _CLOCKS.get(name, time.perf_counter())
    _TOTALS[name] = _TOTALS.get(name, 0.0) + t
    if stream is not None:
        msg = f"TIMING {name}: {t:.3f}s"
        if log_total:
            msg += f" (total {_TOTALS[name]:.3f}s)"
        print(msg, file=stream)
    return t


def toc_total(name: str = "") -> float:
    return _TOTALS.get(name, 0.0)


def reset_timers():
    _CLOCKS.clear()
    _TOTALS.clear()


def device_memory_stats(device=None) -> dict:
    """Per-device memory statistics (bytes). Empty dict when unavailable.

    Replaces the reference's py3nvml VRAM polling (monitoring.py:149-209)
    with the TPU runtime's own allocator stats.
    """
    import jax

    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


class profile_trace:
    """Context manager around jax.profiler for TPU timeline captures —
    replaces the reference's manual tic/toc + py3nvml polling with real
    profiler traces viewable in TensorBoard/Perfetto.

        with profile_trace("/tmp/ssak-trace"):
            train_step(...)
    """

    def __init__(self, log_dir: str, create_perfetto_link: bool = False):
        self.log_dir = log_dir
        self.create_perfetto_link = create_perfetto_link

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir, create_perfetto_link=self.create_perfetto_link)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {self.log_dir}")
        return False


def annotate(name: str):
    """Named region for profiler timelines (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Tracks audio-seconds processed per wall-clock second."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.audio_seconds = 0.0
        self.steps = 0

    def update(self, audio_seconds: float, steps: int = 1):
        self.audio_seconds += audio_seconds
        self.steps += steps

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def audio_seconds_per_second(self) -> float:
        e = self.elapsed
        return self.audio_seconds / e if e > 0 else 0.0

    def summary(self) -> dict:
        return {
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(self.elapsed, 3),
            "audio_seconds_per_second": round(self.audio_seconds_per_second, 3),
            "steps": self.steps,
        }
