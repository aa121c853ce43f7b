"""CpuTracker (bench.py): per-query cpu attribution must survive
worker death (VERDICT r11 item 2 — the old two-sample /proc scheme
lost a dying worker's whole accumulated utime and the clamp-at-0 hid
it, observed as a 3.1 s-wall / 0.0-cpu headline row on a quiet host)."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_tracker_banks_cpu_of_exiting_child():
    """A child that burns ~0.6 cpu-s and EXITS before the end sample
    must still be attributed ≥ half its burn — the exact scenario the
    clamp used to zero out."""
    tracker = bench.CpuTracker(interval_s=0.05)
    try:
        c0 = tracker.read()
        t0 = time.time()
        subprocess.run(
            [
                sys.executable,
                "-c",
                "import time\n"
                "t = time.process_time()\n"
                "while time.process_time() - t < 0.6:\n"
                "    sum(i * i for i in range(1000))\n",
            ],
            check=True,
            timeout=120,
        )
        # child has exited; give the sampler one more tick to notice
        time.sleep(0.2)
        dc = tracker.read() - c0
        wall = time.time() - t0
        assert dc >= 0.3, (
            f"exiting child's cpu lost: delta {dc:.3f}s over {wall:.2f}s wall"
        )
    finally:
        tracker.close()


def test_tracker_monotone_and_nonnegative_deltas():
    """read() is monotone nondecreasing across arbitrary child churn —
    the property that makes the per-query delta clamp unnecessary."""
    tracker = bench.CpuTracker(interval_s=0.05)
    try:
        prev = tracker.read()
        for _ in range(3):
            subprocess.run(
                [sys.executable, "-c", "sum(i*i for i in range(200000))"],
                check=True,
                timeout=60,
            )
            cur = tracker.read()
            assert cur >= prev
            prev = cur
    finally:
        tracker.close()


def test_tracker_counts_own_process_work():
    """Work done in the tracked root itself registers (sanity: the
    tree walk includes the root, not just descendants)."""
    tracker = bench.CpuTracker(interval_s=0.05)
    try:
        c0 = tracker.read()
        t = time.process_time()
        while time.process_time() - t < 0.3:
            sum(i * i for i in range(1000))
        dc = tracker.read() - c0
        assert dc >= 0.2, dc
    finally:
        tracker.close()


def test_bench_json_normalized_block_shape():
    """The normalized/ratios computation in bench.py must keep its
    contract: dimensionless per-row cpu ÷ same-run calibration, both
    normalizers present (VERDICT r11 item 1 — a contended artifact
    must still carry a gateable relative signal).  Pure-math replica
    of the main() block so CI catches contract drift without a 25-row
    Spark run."""
    extras = {
        # start cpu probe polluted by BLAS spin-up (the r11/r12
        # outlier mode): min-of-probes must shrug it off
        "calib_start": {"cpu_ms": 4907.3, "membw_ms": 60.0},
        "calib_start_retry": {"cpu_ms": 10.0, "membw_ms": 15.0},
        "calib_end": {"cpu_ms": 12.0, "membw_ms": 17.0},
    }
    cpu_timings = {"q1": 2.2, "q2": 0.0}
    probes = [
        extras["calib_start"],
        extras.get("calib_start_retry", extras["calib_start"]),
        extras["calib_end"],
    ]
    calib_cpu_s = min(p["cpu_ms"] for p in probes) / 1000.0
    calib_membw_s = min(p["membw_ms"] for p in probes) / 1000.0
    assert calib_cpu_s == 10.0 / 1000.0
    assert calib_membw_s == 15.0 / 1000.0
    norm = {k: round(v / calib_cpu_s, 1) for k, v in cpu_timings.items()}
    assert norm["q1"] == 220.0 and norm["q2"] == 0.0
