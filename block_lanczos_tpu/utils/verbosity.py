"""Progress / ETA reporting ("verbosity engine").

Reproduces the reference's behavior (reference:
sequential/lanczos_modp.c:494-529, checkpoint-aware MPI variant
mpi/lanczos_modp.c:1526-1561): at most one progress line per second with
seconds-per-iteration and a wall-clock ETA, plus a one-time expected-duration
print; `extra_time` accounts for time consumed before a checkpoint resume.
"""

from __future__ import annotations

import time


def format_duration(seconds: float) -> str:
    d, rem = divmod(int(seconds), 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    parts = []
    if d:
        parts.append(f"{d} j")
    if h:
        parts.append(f"{h} h")
    if m:
        parts.append(f"{m} min")
    parts.append(f"{s} s")
    return " ".join(parts)


class VerbosityEngine:
    def __init__(self, expected_iterations: int, extra_time: float = 0.0,
                 min_interval_s: float = 1.0, out=None):
        self.expected_iterations = expected_iterations
        self.extra_time = extra_time
        self.min_interval = min_interval_s
        self.n_iterations = 0
        self._eta_printed = False
        self._last_print = 0.0
        self._out = out

    def _print(self, msg, end="\n"):
        print(msg, end=end, flush=True, file=self._out)

    def tick(self, start_time: float):
        self.n_iterations += 1
        # Instances that converge at iteration 0 (e.g. a matrix whose
        # coefficients are all ≡ 0 mod p) reach here with a non-positive
        # count: there is no per-iteration rate to report, and the reference
        # prints no progress line either — it goes straight to the final
        # check (reference: sequential/lanczos_modp.c:649-663).
        if self.n_iterations <= 0:
            self.n_iterations = 0
            return
        elapsed = (time.time() - start_time) + self.extra_time
        if elapsed - self._last_print < self.min_interval:
            return
        self._last_print = elapsed
        per_iteration = elapsed / self.n_iterations
        estimated = self.expected_iterations * per_iteration
        if not self._eta_printed:
            self._print(f"    - Expected duration : {format_duration(estimated)}")
            self._eta_printed = True
        eta = time.ctime(start_time + estimated)
        self._print(
            f"\r    - iteration {self.n_iterations} / "
            f"{self.expected_iterations}. {per_iteration:.3f}s per iteration. "
            f"ETA: {eta}", end="")
