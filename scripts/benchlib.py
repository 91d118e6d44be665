"""Shared timing helpers for the scripts/ measurement harnesses.

ONE home for the axon-platform timing convention (CLAUDE.md gotcha:
``jax.block_until_ready`` returns early on the relay, so every
measurement must sync with ``jax.device_get``) — previously copy-pasted
verbatim into six profiling scripts, where a methodology fix would have
had to land six times.

Scripts run as ``python scripts/<name>.py``, so this module resolves via
the script directory that Python puts at ``sys.path[0]``:
``from benchlib import sync_time, note``.
"""

import json
import time

import jax


def sync_time(fn, args, iters, warmup=2):
    """Mean seconds/call, synced with device_get (NOT block_until_ready —
    it returns early on the axon relay and reads ~100x too fast)."""
    for _ in range(warmup):
        jax.device_get(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def note(**kw):
    print(json.dumps(kw), flush=True)
