"""Timing spans + structured stage tracing.

Parity target: the reference's getTickCount()/LOGLN stage timers captured to
resultTime*.txt (SURVEY §5.1) — upgraded to a structured tracer: named spans,
aggregation, and a machine-readable report.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        self.elapsed = 0.0
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


class Tracer:
    """Collects named spans; .report() mirrors the reference's per-stage log
    lines ('Finding features, time:', ...) in structured form."""

    def __init__(self):
        self.spans: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name].append(time.perf_counter() - t0)

    def report(self) -> Dict[str, dict]:
        return {
            name: {
                "count": len(v),
                "total_s": sum(v),
                "mean_s": sum(v) / len(v),
                "last_s": v[-1],
            }
            for name, v in self.spans.items()
        }

    def dumps(self) -> str:
        return json.dumps(self.report(), indent=2, sort_keys=True)


GLOBAL_TRACER = Tracer()

# Sync-at-span-ends (default ON; STITCH_SYNC_SPANS=0 opts out). Two reasons:
# 1. Attribution: JAX dispatch is asynchronous — without syncing, a span's
#    device cost surfaces at the next host fetch and the report misleads.
# 2. Cold-start correctness on the remote TPU relay: letting the host race
#    ahead overlaps several executable loads/compiles in flight, and
#    concurrent loads through the relay poison each other (measured: the
#    same cold registration is 414 s free-running vs 31 s synced — each
#    stage's load is solo-fast but 10-100x slower when another load is in
#    flight). Registration stages are seconds long, so the sync itself
#    costs microseconds relative to the work; the per-frame hot loop does
#    NOT use these spans and keeps full async pipelining.
import os as _os  # noqa: E402

_SYNC_ENV = _os.environ.get("STITCH_SYNC_SPANS", "")
SYNC_SPANS = _SYNC_ENV != "0"


def set_sync_spans(on: bool) -> None:
    """Adaptive sync policy: the load-poisoning hazard above only exists
    while executables are still being loaded, i.e. the FIRST registration of
    a process. Once every program is resident, warm re-registration runs
    faster free-running (host orchestration overlaps device work — measured
    ~3 s vs ~6 s synced). VideoStitcher flips this off after its first
    successful registration. An explicit STITCH_SYNC_SPANS env pins the
    behavior and makes this a no-op."""
    global SYNC_SPANS
    if _SYNC_ENV == "":
        SYNC_SPANS = bool(on)


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache (jax_compilation_cache_dir).

    Cold registration compiles ~10 programs; on the remote TPU relay each
    costs seconds to minutes. The persistent cache makes every process after
    the first start warm — a fresh process with a warm cache cold-registers
    in ~12 s vs ~140 s with an empty one. The default directory is the
    REPO-LOCAL `.jax_cache/` (committed, pre-warmed for the v5e bench
    programs) so a fresh container that has the repo is warm from its very
    first process; falls back to ~/.cache when the package is installed
    somewhere read-only. Opt out with STITCH_JAX_CACHE=0; override the
    directory with STITCH_JAX_CACHE.
    """
    import jax
    env = _os.environ.get("STITCH_JAX_CACHE", "")
    if env == "0":
        return
    try:
        # CPU artifacts are AOT-compiled for the build machine's exact
        # feature set and can SIGILL elsewhere; the cache's value is the
        # remote-TPU compiles, so only enable it there
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return
    cache = path or env
    if not cache:
        repo_cache = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__)))), ".jax_cache")
        parent = _os.path.dirname(repo_cache)
        if _os.path.isdir(repo_cache) or _os.access(parent, _os.W_OK):
            cache = repo_cache
        else:
            cache = _os.path.expanduser("~/.cache/stitchingvideo_tpu/jax")
    try:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def maybe_sync(*arrays) -> None:
    if not SYNC_SPANS:
        return
    import jax
    for a in arrays:
        try:
            jax.block_until_ready(a)
        except Exception:
            pass
