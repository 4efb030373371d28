"""Versioned-directory swap protocol shared by the persisted indexes.

A rebuild used to overwrite the live index directories in place
(lists/, postings/, ...) while serving paths take no lock: a search
concurrent with a rebuild could hit deleted files mid-overwrite or pair
a cached quantizer with half-written lists (ADVICE r4,
operators/ann_index.py:193). The store tables avoid exactly this with
staging + atomic swap; this module gives the indexes the same
protocol:

    <index>/_CURRENT      tiny text file naming the live version dir
    <index>/v<N>/...      one complete, immutable index build
    <index>/v<N-1>/...    the previous build, retained for in-flight
                          readers (handles resolve _CURRENT once at
                          load and keep reading their snapshot)

- build() writes the ENTIRE new index (lists/centroids/meta, or
  postings/stats, plus fresh empty segments/tombstones state) under a
  new v<N> dir that no reader resolves yet, then commits by an
  fsync-ed rename onto _CURRENT — the single atomic commit point, the
  same primitive the stores' swap/commit-claim protocols use.
- readers resolve _CURRENT at load time; a handle created before a
  swap keeps serving its own version's files, which the swap never
  touches (snapshot isolation). Version dirs older than the previous
  one are removed at swap time.
- pre-versioning FLAT layouts (index files directly under <index>/)
  keep working: resolution falls back to the index root when _CURRENT
  is absent, and the flat files are garbage-collected once they are
  two builds stale.
"""

from __future__ import annotations

import os
import re
import shutil

CURRENT_FILE = "_CURRENT"
_VDIR = re.compile(r"^v(\d+)$")


def resolve_vroot(path: str) -> str:
    """Directory holding the LIVE index files: the _CURRENT version dir,
    or the index root itself for pre-versioning flat layouts."""
    try:
        with open(os.path.join(path, CURRENT_FILE)) as f:
            return os.path.join(path, f.read().strip())
    except OSError:
        return path


def begin_version(path: str) -> tuple[str, str | None]:
    """Start a new build: returns (new version dir abspath, previous
    version NAME or None when the index was flat/absent). The new dir
    is created empty; nothing resolves it until commit_version."""
    prev = None
    n = 1
    try:
        with open(os.path.join(path, CURRENT_FILE)) as f:
            prev = f.read().strip()
        m = _VDIR.match(prev)
        n = (int(m.group(1)) if m else 0) + 1
    except OSError:
        pass
    vname = f"v{n}"
    vdir = os.path.join(path, vname)
    shutil.rmtree(vdir, ignore_errors=True)  # crashed prior attempt
    os.makedirs(vdir, exist_ok=True)
    return vdir, prev


def commit_version(path: str, vdir: str, prev: str | None,
                   flat_subdirs: tuple[str, ...]) -> None:
    """Atomically swap _CURRENT to the freshly built version, then GC:
    keep the new and previous versions (in-flight readers), drop older
    ones, and drop flat-layout leftovers once a previous VERSIONED
    build exists (they were superseded at least one build ago)."""
    vname = os.path.basename(vdir)
    tmp = os.path.join(path, CURRENT_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(vname)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(path, CURRENT_FILE))  # COMMIT POINT
    keep = {vname} | ({prev} if prev else set())
    for d in os.listdir(path):
        if _VDIR.match(d) and d not in keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    if prev is not None:
        for d in flat_subdirs:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
