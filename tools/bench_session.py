"""Shared session marker for the bench artifacts (round-9 verdict #5).

BENCH_WIRE is only meaningful as "the session's CPU-speed reference"
when it ran adjacent to bench.py — same host, same boot, same load
profile. Round 9's artifacts contradicted each other (wire kernel
slower than r8 while bench.py was 31% faster) precisely because the
runs were not provably adjacent. Every bench tool now stamps:

- ``session``: the kernel boot id prefix — identical for every process
  in one container/host session, different across sessions, with no
  clock or coordination needed. Override with
  ``$SPARK_GRAFT_BENCH_SESSION`` to group runs explicitly.
- ``ran_at_unix``: wall-clock seconds, so back-to-back runs inside a
  shared session are visibly adjacent (minutes apart, not hours).

Reading rule: treat BENCH_WIRE_rN as rN's CPU reference only when its
``session`` matches BENCH_rN's.
"""

from __future__ import annotations

import os
import time


def session_info() -> dict:
    sid = os.environ.get("SPARK_GRAFT_BENCH_SESSION")
    if not sid:
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                sid = f.read().strip()[:8]
        except OSError:
            sid = "unknown"
    return {"session": sid, "ran_at_unix": int(time.time())}
