"""Observability: structured build/render stats, rays/s counters, profiling.

The reference's observability is printf-based: SBVH build reports fragment
count / depth / SAH cost (SBVH.h:405), renderers print per-export elapsed
time (PathTracingRenderer.cpp:86-89), and the driver prints scene read/build
times (main.cpp:43-49). Here the same signals flow through the standard
`logging` module (logger "slr_tpu"), plus:

* `RenderMeter` — wall-clock + derived rays/s for render passes;
* `profile_trace` — context manager around `jax.profiler.trace` for
  per-kernel timing on device (SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

logger = logging.getLogger("slr_tpu")


def log_build_stats(kind: str, **stats) -> None:
    """One structured line per build event (BVH/TLAS/scene)."""
    parts = " ".join(f"{k}={v}" for k, v in stats.items())
    logger.info("[build] %s %s", kind, parts)


@dataclass
class RenderMeter:
    """Accumulates ray-cast counts and wall time across passes.

    Ray accounting matches bench.py: one closest-hit cast for the camera ray
    plus (closest + one shared NEE shadow cast) per bounce.
    """

    width: int
    height: int
    max_depth: int
    has_env: bool = True
    samples: int = 0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def casts_per_sample(self) -> int:
        return self.width * self.height * (1 + 2 * self.max_depth)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, samples: int) -> None:
        self.seconds += time.perf_counter() - self._t0
        self.samples += samples

    @property
    def rays(self) -> int:
        return self.casts_per_sample() * self.samples

    @property
    def mrays_per_s(self) -> float:
        return self.rays / max(self.seconds, 1e-9) / 1e6

    def report(self) -> str:
        return (f"{self.samples} spp in {self.seconds:.2f}s — "
                f"{self.mrays_per_s:.3f} Mrays/s "
                f"({self.rays / 1e6:.1f}M casts)")


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Wrap a block in a jax.profiler trace (viewable with tensorboard /
    xprof). No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
    logger.info("[profile] trace written to %s", log_dir)
