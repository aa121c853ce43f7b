"""Protocol tests for the shared identity-keyed staging helper
(hadoop_pcap_spark/staging.py) — the contract bench.py and the layout/
streaming demo queries rely on for safe concurrent reuse."""

import os
import time

from hadoop_pcap_spark import staging


def _mk_src(tmp_path, name="src.parquet", content=b"x" * 100):
    p = tmp_path / name
    p.write_bytes(content)
    return str(p)


def test_key_tracks_source_identity(tmp_path):
    src = _mk_src(tmp_path)
    k1 = staging.source_key(src)
    # same content, same stat → same key
    assert staging.source_key(src) == k1
    # rewriting the file (new mtime_ns) must change the key, or a
    # regenerated table would silently serve the stale stage
    time.sleep(0.01)
    with open(src, "wb") as f:
        f.write(b"y" * 100)
    assert staging.source_key(src) != k1


def test_staged_dir_keeps_fresh_siblings_drops_idle(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    try:
        src = _mk_src(tmp_path)
        prefix = "stage_test_"
        fresh = tmp_path / (prefix + "freshkey")
        idle = tmp_path / (prefix + "idlekey")
        other = tmp_path / "other_prefix_dir"
        for d in (fresh, idle, other):
            d.mkdir()
        old = time.time() - 7200
        os.utime(idle, (old, old))

        d = staging.staged_dir(prefix, src)
        # a <1h-idle sibling (a CONCURRENT run's stage) survives
        assert fresh.exists()
        # a >1h-idle superseded sibling is reclaimed
        assert not idle.exists()
        # unrelated prefixes are never touched
        assert other.exists()
        assert not staging.is_complete(d)

        # reuse touches the kept dir so a long-running READER can't
        # go idle-stale under another process's cleanup
        os.makedirs(d, exist_ok=True)
        stale = time.time() - 7200
        os.utime(d, (stale, stale))
        staging.staged_dir(prefix, src)
        assert time.time() - os.stat(d).st_mtime < 60

        (tmp_path / os.path.basename(d) / "_SUCCESS").touch()
        assert staging.is_complete(d)
    finally:
        tempfile.tempdir = None


def _writer(payload=b"data", succeed=True):
    """A fake Spark write: materialize a dir with a part file and
    (optionally) the _SUCCESS witness."""
    calls = []

    def write(tmp_dir):
        calls.append(tmp_dir)
        os.makedirs(tmp_dir)
        with open(os.path.join(tmp_dir, "part-00000"), "wb") as f:
            f.write(payload)
        if succeed:
            open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()

    write.calls = calls
    return write


def test_ensure_staged_publishes_atomically_and_reuses(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        src = _mk_src(tmp_path)
        w = _writer()
        d = staging.ensure_staged("ens_test_", src, w)
        assert staging.is_complete(d)
        assert len(w.calls) == 1
        # the write went to a UNIQUE tmp dir, renamed into place —
        # never directly into the final path (delete-while-writing
        # race of the old protocol, ADVICE r6)
        assert w.calls[0] != d and ".tmp." in w.calls[0]
        assert not os.path.exists(w.calls[0])
        # reuse: complete stage short-circuits, writer not called again
        assert staging.ensure_staged("ens_test_", src, w) == d
        assert len(w.calls) == 1
    finally:
        tempfile.tempdir = None


def test_ensure_staged_rejects_witnessless_write(tmp_path, monkeypatch):
    """A write that produces no _SUCCESS must not be published — the
    final path stays absent so the next caller retries."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    import pytest

    tempfile.tempdir = None
    try:
        src = _mk_src(tmp_path)
        with pytest.raises(RuntimeError, match="_SUCCESS"):
            staging.ensure_staged("ens_fail_", src, _writer(succeed=False))
        d = staging.staged_dir("ens_fail_", src)
        assert not os.path.exists(d)
        # and a subsequent good write publishes normally
        d2 = staging.ensure_staged("ens_fail_", src, _writer())
        assert staging.is_complete(d2)
    finally:
        tempfile.tempdir = None


def test_ensure_staged_replaces_incomplete_leftover(tmp_path, monkeypatch):
    """A crashed pre-protocol dir (exists, no _SUCCESS) is replaced
    under the lock, not reused and not mixed with the new write."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        src = _mk_src(tmp_path)
        d = staging.staged_dir("ens_left_", src)
        os.makedirs(d)
        with open(os.path.join(d, "part-stale"), "wb") as f:
            f.write(b"stale")
        out = staging.ensure_staged("ens_left_", src, _writer(b"fresh"))
        assert out == d and staging.is_complete(out)
        # no mixing: the stale writer's file is gone
        assert not os.path.exists(os.path.join(out, "part-stale"))
        assert os.path.exists(os.path.join(out, "part-00000"))
    finally:
        tempfile.tempdir = None


def test_sweep_skips_sibling_with_held_lock(tmp_path, monkeypatch):
    """An idle-looking sibling whose .lock is currently flocked (an
    active writer or a long reader holding a lease) survives the
    sweep; once the lock is released it is reclaimable again."""
    import fcntl
    import tempfile

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None
    try:
        src = _mk_src(tmp_path)
        prefix = "ens_sweep_"
        busy = tmp_path / (prefix + "busykey")
        busy.mkdir()
        old = time.time() - 7200
        os.utime(busy, (old, old))
        lock = open(str(busy) + ".lock", "w")
        fcntl.flock(lock, fcntl.LOCK_SH)
        try:
            staging.staged_dir(prefix, src)
            assert busy.exists()  # lock held → spared despite idleness
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
            lock.close()
        os.utime(busy, (old, old))
        os.utime(str(busy) + ".lock", (old, old))
        staging.staged_dir(prefix, src)
        assert not busy.exists()  # released + idle → reclaimed
    finally:
        tempfile.tempdir = None


def test_keyed_tmp_dir_unique_per_key_and_swept(tmp_path, monkeypatch):
    import tempfile

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None
    try:
        a = staging.keyed_tmp_dir("ktd_test_", "query|app|run1")
        b = staging.keyed_tmp_dir("ktd_test_", "query|app|run2")
        assert a != b  # distinct keys → distinct dirs (no overwrite race)
        os.makedirs(a)
        old = time.time() - 7200
        os.utime(a, (old, old))
        staging.keyed_tmp_dir("ktd_test_", "query|app|run3")
        assert not os.path.exists(a)  # idle spill reclaimed
    finally:
        tempfile.tempdir = None


def test_hold_stage_pins_dir_through_forced_sweep(tmp_path, monkeypatch):
    """VERDICT r7 item 4: a reader inside hold_stage() keeps its stage
    even when the dir looks >1h idle to a concurrent sweep; the lease
    released, the same sweep reclaims it."""
    import tempfile

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None
    try:
        src = _mk_src(tmp_path)
        prefix = "hold_test_"
        held = staging.ensure_staged(prefix, src, _writer())
        # make it look abandoned: 2h idle on the dir AND its lock,
        # and resolved under a DIFFERENT (superseded-key) name so the
        # sweep sees it as a reclaimable sibling
        other = tmp_path / "other.parquet"
        other.write_bytes(b"other source")
        old = time.time() - 7200
        os.utime(held, (old, old))
        os.utime(held + ".lock", (old, old))
        with staging.hold_stage(held):
            staging.staged_dir(prefix, str(other))  # sweep runs here
            assert os.path.isdir(held), "held lease must pin the stage"
        os.utime(held, (old, old))
        os.utime(held + ".lock", (old, old))
        staging.staged_dir(prefix, str(other))
        assert not os.path.exists(held), "released + idle → reclaimed"
    finally:
        tempfile.tempdir = None


def test_hold_stage_allows_concurrent_readers(tmp_path, monkeypatch):
    """The lease is SHARED: two readers can hold one stage at once
    (an exclusive lease would serialize bench stages pointlessly)."""
    import tempfile

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None
    try:
        src = _mk_src(tmp_path)
        d = staging.ensure_staged("hold2_test_", src, _writer())
        with staging.hold_stage(d):
            with staging.hold_stage(d):
                assert staging.is_complete(d)
    finally:
        tempfile.tempdir = None


def test_sweep_reclaims_current_keys_orphaned_tmp(tmp_path, monkeypatch):
    """ADVICE r7: a crashed writer's <final>.tmp.<rand> for a STILL-
    LIVE source key must be reclaimed once idle (>1h, lock free) —
    the old sweep skipped the whole keep_name* family forever.  A
    fresh tmp dir (a live writer's) still survives."""
    import tempfile

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None
    try:
        src = _mk_src(tmp_path)
        prefix = "orph_test_"
        final = staging.staged_dir(prefix, src)
        crashed = final + ".tmp.deadbeef"
        live = final + ".tmp.11c0ffee"
        os.makedirs(crashed)
        os.makedirs(live)
        old = time.time() - 7200
        os.utime(crashed, (old, old))
        staging.staged_dir(prefix, src)
        assert not os.path.exists(crashed), "idle orphan of live key reclaimed"
        assert os.path.isdir(live), "fresh writer tmp survives"
        # an idle tmp whose stage lock is HELD (writer mid-flight on a
        # slow write) is spared
        import fcntl

        os.utime(live, (old, old))
        lock = open(final + ".lock", "w")
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            staging.staged_dir(prefix, src)
            assert os.path.isdir(live)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
            lock.close()
    finally:
        tempfile.tempdir = None
