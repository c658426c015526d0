"""Observability: logging, progress/MLUPS metering, profiler traces.

The reference's entire observability story is `cout << t << "\\t\\r"`
(free_stream_test.cpp:82) and an interactive y/n gate before long runs
(src/utils.cpp:7-19).  Replacements:
  * structured logger (stderr, rate-limited progress lines),
  * StepMeter: per-chunk wall time -> MLUPS, cells/s,
  * profile(): context manager around jax.profiler traces,
  * confirm(): the continue_execution gate with a --yes override
    (never blocks in non-interactive runs).
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time

logger = logging.getLogger("lbm_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("[%(asctime)s lbm_tpu] %(message)s",
                                      datefmt="%H:%M:%S"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def confirm(auto_yes: bool = True, prompt: str = "Do you want to continue (y/n)? ") -> bool:
    """The reference's interactive gate (src/utils.cpp:7-19) behind a flag;
    defaults to proceeding so batch runs never hang."""
    if auto_yes or not sys.stdin.isatty():
        return True
    while True:
        choice = input(prompt).strip().lower()
        if choice in ("y", "yes"):
            return True
        if choice in ("n", "no"):
            return False
        print("Invalid input. Please enter 'y' or 'n'.")


class StepMeter:
    """Tracks steps/s and MLUPS across chunked execution."""

    def __init__(self, cells: int, total_steps: int | None = None,
                 log_every_s: float = 10.0, start_steps: int = 0):
        self.cells = cells
        self.total = total_steps
        self.log_every_s = log_every_s
        # ``steps`` is the absolute step counter (seed with start_steps when
        # resuming from a checkpoint); the rate only counts steps run here
        self.steps = start_steps
        self.start = start_steps
        self.t0 = time.perf_counter()
        self._last_log = self.t0

    def update(self, n_steps: int) -> None:
        self.steps += n_steps
        now = time.perf_counter()
        if now - self._last_log >= self.log_every_s:
            self._last_log = now
            logger.info(self.summary())

    def mlups(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.cells * (self.steps - self.start) / max(dt, 1e-9) / 1e6

    def summary(self) -> str:
        frac = f"/{self.total}" if self.total else ""
        return (f"step {self.steps}{frac}  "
                f"{self.mlups():.3g} MLUPS  "
                f"{time.perf_counter() - self.t0:.1f}s elapsed")


@contextlib.contextmanager
def profile(trace_dir: str | None):
    """jax.profiler trace around a region (no-op when trace_dir is None)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    logger.info(f"profiler trace written to {trace_dir}")


import functools


@functools.cache
def _finite_checker():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def all_finite(state):
        flags = [jnp.isfinite(leaf).all()
                 for leaf in jax.tree.leaves(state)
                 if hasattr(leaf, "dtype")
                 and jnp.issubdtype(leaf.dtype, jnp.floating)]
        return jnp.all(jnp.stack(flags)) if flags else jnp.bool_(True)

    return all_finite


def check_finite(state, step_count: int) -> None:
    """Failure detection the reference lacks (SURVEY.md section 5.3): raise
    with a diagnosable message the moment a chunk produces non-finite
    fields, naming the step count so a checkpointed run can be resumed
    from the last good state (io.checkpoint) with adjusted parameters.
    One jitted all-leaves isfinite reduce and one host sync per chunk
    (amortised over >=1000 steps)."""
    if not bool(_finite_checker()(state)):
        raise FloatingPointError(
            f"non-finite fields after step {step_count}: the run left the "
            "lattice stability envelope (see the scene docstring). Resume "
            "from the last checkpoint with a smaller force/velocity or "
            "switch to f64 (--x64).")


def drive_chunked(step, carry, T: int, record_every: int, n_cells: int,
                  per_cell_ns: float, record_fn,
                  checkpoint_dir: str | None = None,
                  checkpoint_every: int = 10000):
    """Chunked host loop for scene time-stepping (falling-body, thermal,
    shan_chen, channel and 3-D scenes).

    Bounds every launch below the axon relay's ~2 s single-launch hang
    ceiling (utils.xmath.launch_cap with the chain's measured per-cell
    cost) and runs the NaN watchdog on every chunk boundary, in BOTH
    the recording and non-recording modes.  ``record_fn(carry)`` maps
    the carry to the row recorded every ``record_every`` steps; carry[0]
    (or the carry itself when it is a single array) is the watchdog
    target.  Returns ``(carry, series | None)`` with ``series`` stacked
    along axis 0.

    ``checkpoint_dir`` turns on uniform checkpoint/resume (the reference
    has no restart path at all, SURVEY.md section 5.4): the carry — and,
    in recording mode, the series recorded so far — is written atomically
    every >=``checkpoint_every`` steps via io.checkpoint.Checkpointer,
    and a pre-existing checkpoint in the directory resumes the run from
    its step, reproducing the uninterrupted result exactly (same chunk
    boundaries are NOT required: the step function is a pure map, so only
    the carry matters)."""
    import jax
    import numpy as np

    from .xmath import launch_cap

    watchdog = (lambda c: c[0]) if isinstance(carry, (tuple, list)) \
        else (lambda c: c)
    ckpt, done, series = None, 0, []
    if checkpoint_dir:
        from ..io.checkpoint import Checkpointer

        ckpt = Checkpointer(checkpoint_dir, every=checkpoint_every)
        restored, at_step = ckpt.restore_latest(
            (carry, np.zeros((0,), np.float64)))
        if restored is not None:
            import jax.numpy as jnp

            saved_carry, saved_series = restored

            def _restore(like, leaf):
                leaf = jnp.asarray(leaf, like.dtype)
                if getattr(like, "sharding", None) is not None:
                    leaf = jax.device_put(leaf, like.sharding)
                return leaf

            carry = jax.tree.map(_restore, carry, saved_carry)
            done = int(at_step)
            if record_every and saved_series.size:
                series = [np.asarray(saved_series)]
            logger.info(f"resumed from {checkpoint_dir} at step {done}")
    last_ckpt = done
    meter = StepMeter(n_cells, total_steps=T, start_steps=done)

    def maybe_checkpoint(done):
        nonlocal last_ckpt
        if ckpt is not None and done - last_ckpt >= checkpoint_every:
            stacked = np.concatenate(series) if series \
                else np.zeros((0,), np.float64)
            ckpt.force_save(done, (jax.tree.map(np.asarray, carry), stacked))
            last_ckpt = done

    if not record_every:
        chunk = jax.jit(
            lambda c, n: jax.lax.fori_loop(0, n, lambda _, x: step(x), c),
            static_argnums=1)
        while done < T:
            n = min(launch_cap(n_cells, per_cell_ns), T - done)
            carry = chunk(carry, n)
            done += n
            meter.update(n)
            check_finite(watchdog(carry), done)
            maybe_checkpoint(done)
        return carry, None
    if T % record_every:
        raise ValueError("T must be a multiple of record_every")

    def outer(c, _):
        c2 = jax.lax.fori_loop(0, record_every, lambda _, x: step(x), c)
        return c2, record_fn(c2)

    scan = jax.jit(lambda c, n: jax.lax.scan(outer, c, None, length=n),
                   static_argnums=1)
    while done < T:
        n = min(launch_cap(n_cells, per_cell_ns) // record_every or 1,
                (T - done) // record_every)
        carry, tr = scan(carry, n)
        series.append(np.asarray(tr))
        done += n * record_every
        meter.update(n * record_every)
        check_finite(watchdog(carry), done)
        maybe_checkpoint(done)
    return carry, np.concatenate(series)
