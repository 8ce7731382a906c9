"""Observability: structured profiling, throughput counters, memory stats.

The reference's tracing is ad hoc (wall timers, psutil RAM prints,
commented-out CUDA memory snapshots — SURVEY.md §5). Here the framework
exposes first-class hooks:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory (per-op device timeline);
* :class:`Throughput` — rolling columns/s + step-time accounting with the
  compute/IO split the reference logs per report interval
  (rnn/utils.py:892,1592-1623);
* :func:`device_memory_stats` — live HBM usage per device;
* :class:`JsonlLogger` — the wandb replacement: structured per-step/epoch
  records to JSONL (reference metric names preserved by callers).
"""
from __future__ import annotations

import contextlib
import json
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region: ``with trace('/tmp/tb'): step()``. View with
    TensorBoard or xprof."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for profiler timelines."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def host_memory_stats() -> dict:
    """Host RAM usage (the reference's psutil prints, driver :80-82)."""
    try:
        import psutil
        vm = psutil.virtual_memory()
        return {"total_gb": vm.total / 2**30, "used_gb": vm.used / 2**30,
                "percent": vm.percent}
    except ImportError:
        import resource
        ru = resource.getrusage(resource.RUSAGE_SELF)
        return {"maxrss_gb": ru.ru_maxrss / 2**20}


def device_memory_stats() -> list[dict]:
    import jax
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append({"device": str(d),
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit")})
    return out


class Throughput:
    """Rolling throughput/step-time accounting.

    Mirrors the reference's per-report-interval timers with separate
    compute-time bookkeeping (rnn/utils.py:1592-1623)."""

    def __init__(self, report_every: int = 100):
        self.report_every = report_every
        self.reset()

    def reset(self):
        self.n_steps = 0
        self.n_items = 0
        self.compute_s = 0.0
        self.t0 = time.perf_counter()

    @contextlib.contextmanager
    def step(self, items: int = 1):
        t = time.perf_counter()
        yield
        self.compute_s += time.perf_counter() - t
        self.n_steps += 1
        self.n_items += items

    @property
    def should_report(self) -> bool:
        return self.n_steps > 0 and self.n_steps % self.report_every == 0

    def report(self) -> dict:
        wall = time.perf_counter() - self.t0
        rec = {
            "steps": self.n_steps,
            "items_per_s": self.n_items / max(wall, 1e-9),
            "step_ms": 1e3 * wall / max(self.n_steps, 1),
            "compute_frac": self.compute_s / max(wall, 1e-9),
        }
        return rec


class JsonlLogger:
    """Append-only structured metric log (the wandb role,
    driver :925-977)."""

    def __init__(self, path: str):
        self.path = path

    def log(self, record: dict, step: int | None = None):
        if step is not None:
            record = {"step": step, **record}
        record.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")

    def read(self) -> list[dict]:
        out = []
        try:
            with open(self.path) as f:
                for line in f:
                    out.append(json.loads(line))
        except FileNotFoundError:
            pass
        return out


def flop_analysis(fn, *args, **kwargs) -> dict:
    """Compiler-reported cost analysis of a jittable fn on example args:
    FLOPs, bytes accessed, and arithmetic intensity (FLOPs/byte) — the
    roofline coordinates. First-class replacement for the reference's
    FLOP-calculation notebook (baseline_models/MLP/.../FLOP_calculation).

    Returns {} when the backend does not report cost analysis.
    """
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    try:
        cost = compiled.cost_analysis()
    except Exception:
        return {}
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    if not cost:
        return {}
    flops = float(cost.get("flops", 0.0))
    byt = float(cost.get("bytes accessed", 0.0))
    out = {"flops": flops, "bytes_accessed": byt}
    if byt > 0:
        out["arithmetic_intensity"] = flops / byt
    return out


def achieved_flops(fn, *args, peak_flops: float | None = None,
                   iters: int = 10, **kwargs) -> dict:
    """Measure achieved FLOP/s of a jitted fn (walltime over ``iters``
    calls after warmup) against the compiler FLOP count; with
    ``peak_flops`` also reports the fraction of peak (MFU)."""
    import time as _time

    import jax

    cost = flop_analysis(fn, *args, **kwargs)
    jfn = jax.jit(fn)
    out = jfn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = _time.perf_counter()
    for _ in range(iters):
        out = jfn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (_time.perf_counter() - t0) / iters
    res = {"seconds_per_call": dt, **cost}
    if cost.get("flops"):
        res["achieved_flops_per_s"] = cost["flops"] / dt
        if peak_flops:
            res["mfu"] = res["achieved_flops_per_s"] / peak_flops
    return res
