"""Best-effort control of OpenBLAS's runtime thread pool.

Driver-side trainers (classify.train_lr, similarity k-means/PQ) run
many TINY matmuls; with OpenBLAS's default pool (= all host cores)
every call fans out to N threads that then spin-wait, charging up to
tens of fake cpu-seconds per 300-iteration train loop to the process
tree (measured: quality_classifier_margins 39 cpu-s with the pool vs
<2 cpu-s of real work — bench.py's calibrate() hit the same artifact
in round 12).  At these shapes (≤4096×≤64) one thread is also
wall-faster: the sync overhead exceeds the arithmetic.

``single_threaded_blas()`` pins the pool to 1 inside the context and
restores the previous value on exit.  No-op when OpenBLAS (or its
thread-control symbols) cannot be found — the trainer then runs
threaded, exactly as before.

This image ships no threadpoolctl, so the already-loaded library is
located via /proc/self/maps and driven through ctypes (same approach
as bench.calibrate, now shared).
"""

from __future__ import annotations

import contextlib


def openblas_threads(n: "int | None") -> "int | None":
    """Get (and when ``n`` is given, set) OpenBLAS's runtime thread
    count via the already-loaded library.  Returns the PREVIOUS value,
    or None when the library or its symbols can't be found."""
    import ctypes

    try:
        path = None
        with open("/proc/self/maps") as f:
            for line in f:
                if "openblas" in line:
                    path = line.rsplit(None, 1)[-1]
                    break
        if not path:
            return None
        lib = ctypes.CDLL(path)
        for suffix in ("64_", "", "_"):
            get = getattr(lib, f"openblas_get_num_threads{suffix}", None)
            set_ = getattr(lib, f"openblas_set_num_threads{suffix}", None)
            if get is None or set_ is None:
                continue
            prev = int(get())
            if n is not None:
                set_(ctypes.c_int(n))
            return prev
    except OSError:
        pass
    return None


@contextlib.contextmanager
def single_threaded_blas():
    """Pin OpenBLAS to one thread for the duration of the block;
    restore the previous pool size afterwards (no-op when OpenBLAS
    isn't loadable)."""
    prev = openblas_threads(1)
    try:
        yield
    finally:
        if prev:
            openblas_threads(prev)
