"""Maintenance locking for on-disk state/index directories.

Compaction and rebucketing mutate a directory other processes may be
reading (the CLI state-lookup serving read is explicitly out-of-band),
and the round-13 repair-on-read design let a PURE READER apply a pending
compaction plan concurrently with a live compactor — two processes
racing rmtree/rename on the same staging dir (ADVICE r13).  The fix is
an ordinary advisory file lock:

- maintenance ops (compact_entity_state, rebucket_state, compact_index,
  stream-start repair) take the EXCLUSIVE lock for their whole
  stage->plan->apply critical section;
- pure readers never repair; the serving read takes the SHARED lock
  only while it materializes, so it can never observe a bucket
  mid-swap;
- index-stream sinks take the SHARED lock per micro-batch, so an
  out-of-band compact_index serializes against live probes/folds at
  micro-batch boundaries instead of racing them.

``flock`` is single-host advisory locking — exactly right for the
local/POSIX deployments this repo runs, and for the test harness.  On a
production object store there is no flock; the contract there is the
table-service one (Hudi/Delta run compaction from the writer's own
timeline or a coordinated maintenance job), which the entity stream
already implements via the inline ``compact_every`` hook.  SCALE.md
§locking states the deployment rule.
"""

from __future__ import annotations

import errno
import fcntl
import os
from contextlib import contextmanager

_LOCK_NAME = ".maintenance.lock"


@contextmanager
def maintenance_lock(root: str, shared: bool = False):
    """Advisory flock on ``<root>/.maintenance.lock``.  Exclusive by
    default (maintenance ops); ``shared=True`` for readers that must not
    overlap a swap.  Blocking: a reader waits out a compaction (seconds)
    rather than failing; a compactor waits for in-flight readers.
    Reentrancy is NOT supported — never take the exclusive lock while
    holding the shared one in the same process (flock self-deadlocks);
    the call graph keeps maintenance and serving strictly sequential."""
    os.makedirs(root, exist_ok=True)
    fd = os.open(os.path.join(root, _LOCK_NAME), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_SH if shared else fcntl.LOCK_EX)
        yield
    finally:
        os.close(fd)  # closing the fd releases the flock


@contextmanager
def try_maintenance_lock(root: str):
    """Non-blocking exclusive variant: yields True if the lock was
    taken, False if another holder exists.  For the one read-path repair
    that remains (a base directory missing entirely after a replace_all
    crash): a BLOCKING acquire there could self-deadlock when the caller
    already holds the exclusive lock on another fd (flock treats two fds
    in one process as independent owners), so the read path tries, and
    if someone else holds the lock, that someone is fixing the state."""
    os.makedirs(root, exist_ok=True)
    fd = os.open(os.path.join(root, _LOCK_NAME), os.O_CREAT | os.O_RDWR)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            got = True
        except OSError as e:
            # only CONTENTION means "someone else is fixing the state";
            # any other flock failure (ENOLCK on an NFS mount, EBADF)
            # must surface, or the caller silently skips crash repair
            # and proceeds on possibly-broken state (ADVICE r14)
            if e.errno not in (errno.EWOULDBLOCK, errno.EAGAIN):
                raise
            got = False
        yield got
    finally:
        os.close(fd)
