"""Identity-keyed tmp staging for derived copies of source tables.

Several surfaces (bench.py's streaming stages, the layout demo
queries) need a derived parquet copy of a source table that is
expensive enough to reuse but must never be served stale or
half-written.  The protocol, grown across rounds (ADVICE r4/r5) and
now in ONE place:

* the dir name is keyed by the SOURCE's identity — abspath + mtime_ns
  + size — so a regenerated table or a different dataset root
  re-stages instead of silently serving other data;
* Spark's ``_SUCCESS`` marker is the completion witness — a crashed
  mid-write dir passes ``isdir`` but never gets reused;
* superseded sibling dirs (same prefix, different key) are dropped
  only after >1h idle: a CONCURRENT process using a sibling keeps it
  alive — an active writer refreshes its dir's mtime, and the touch
  below keeps a pure READER's dir fresh too (reuse never rewrites,
  so without the touch a long run could lose its stage to another
  process's cleanup mid-read);
* callers scope ``prefix`` by dataset basename (e.g.
  ``f"bench_stream_docs_{os.path.basename(sf)}_"``) so tmp stays
  legible per dataset — the idle guard, not the prefix, is what makes
  eviction safe.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time

__all__ = ["source_key", "staged_dir", "is_complete"]


def source_key(src_path: str, n: int = 12) -> str:
    """Identity key of a source file: md5(abspath | mtime_ns | size)."""
    st = os.stat(src_path)
    return hashlib.md5(
        f"{os.path.abspath(src_path)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:n]


def is_complete(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_SUCCESS"))


def staged_dir(prefix: str, src_path: str) -> str:
    """Resolve the staging dir for ``prefix`` + ``src_path``'s identity,
    touch it if it already exists (reader keep-alive), and drop
    superseded same-prefix siblings idle >1h.  The caller checks
    :func:`is_complete` and (re)writes the copy if absent — writes go
    through Spark, whose ``_SUCCESS`` is the completion witness."""
    tmp = tempfile.gettempdir()
    name = prefix + source_key(src_path)
    keep = os.path.join(tmp, name)
    if os.path.isdir(keep):
        try:
            os.utime(keep, None)
        except OSError:
            pass
    now = time.time()
    for old in os.listdir(tmp):
        if not old.startswith(prefix) or old == name:
            continue
        p = os.path.join(tmp, old)
        try:
            idle = now - os.stat(p).st_mtime
        except OSError:
            continue
        if idle > 3600:
            shutil.rmtree(p, ignore_errors=True)
    return keep
