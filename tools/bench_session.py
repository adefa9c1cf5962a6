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


def main() -> None:
    """Orchestrator (round-10 verdict #3): run wire → prep → scale →
    bench back-to-back in ONE contiguous block and stamp every artifact
    with the shared block start, so adjacency is mechanical rather than
    aspirational. Round 10 stamped a shared session id but bench.py ran
    ~2.9 h after the wire CPU reference — when the totals drifted ~20%
    uniformly, the CPU reference couldn't arbitrate. One block closes
    that: any cross-round drift can now be read against a CPU reference
    measured minutes, not hours, earlier.

    Usage: python tools/bench_session.py <round>
    Writes BENCH_WIRE_r<N>.json, BENCH_PREP_r<N>.json,
    BENCH_SCALE_r<N>.json and BENCH_ADJACENT_r<N>.json (a bench.py run
    inside the block — the driver's own end-of-round BENCH_r<N> still
    runs later; ADJACENT is the arbitration point between the two)."""
    import json
    import subprocess
    import sys

    if len(sys.argv) != 2:
        raise SystemExit("usage: python tools/bench_session.py <round>")
    rnd = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    steps = [
        ("wire", ["tools/bench_wire.py"], f"BENCH_WIRE_r{rnd}.json"),
        ("prep", ["tools/bench_prep.py"], f"BENCH_PREP_r{rnd}.json"),
        ("scale", ["tools/bench_scale.py"], f"BENCH_SCALE_r{rnd}.json"),
        ("bench", ["bench.py"], f"BENCH_ADJACENT_r{rnd}.json"),
    ]
    block_start = int(time.time())
    written: dict[str, dict] = {}
    for i, (name, cmd, out_name) in enumerate(steps):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, *cmd], cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env={**os.environ, "SPARK_GRAFT_ROUND": str(rnd)},
        )
        lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ]
        if proc.returncode != 0 or not lines:
            raise SystemExit(
                f"bench_session: step {name} failed "
                f"(rc={proc.returncode}, json_lines={len(lines)})"
            )
        obj = json.loads(lines[-1])
        obj["bench_block_start_unix"] = block_start
        obj["bench_block_seq"] = i
        with open(os.path.join(repo, out_name), "w") as f:
            json.dump(obj, f, indent=1)
        written[name] = obj
        print(
            f"[bench_session] {name}: {round(time.time() - t0, 1)}s "
            f"→ {out_name}", file=sys.stderr,
        )
    spread = int(time.time()) - block_start
    # Machine-readable block index (round-11 verdict "what's wrong" #2):
    # every block a round runs APPENDS its summary here, so selecting
    # the committed artifacts by the in-block CPU reference is
    # mechanically auditable — superseded blocks' key numbers stay in
    # the sidecar even though their full artifacts were overwritten.
    # (Full per-block artifact copies are additionally parked under
    # /tmp/bench_blocks_r<N>/<block_start>/ for same-session promotion.)
    entry = {
        "block_start_unix": block_start,
        "block_spread_sec": spread,
        **session_info(),
        "wire_cold_per_sec": written["wire"].get("decode_mutations_per_sec"),
        "wire_warm_per_sec": written["wire"].get(
            "decode_mutations_per_sec_warm"
        ),
        "prep_total_sec": written["prep"].get("value"),
        "prep_stages": written["prep"].get("queries"),
        "scale_ratios_x20": written["scale"].get("ratios_vs_linear"),
        "scale_ratios_deep": written["scale"].get("ratios_vs_linear_deep"),
        "adjacent_total_sec": written["bench"].get("value"),
        "adjacent_runs": written["bench"].get("runs"),
    }
    sidecar = os.path.join(repo, f"BENCH_BLOCKS_r{rnd}.json")
    blocks = []
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            blocks = json.load(f)
    blocks.append(entry)
    with open(sidecar, "w") as f:
        json.dump(blocks, f, indent=1)
    park = os.path.join(f"/tmp/bench_blocks_r{rnd}", str(block_start))
    os.makedirs(park, exist_ok=True)
    import shutil

    for _, _, out_name in steps:
        shutil.copy(os.path.join(repo, out_name), park)
    print(json.dumps({
        "metric": "bench_session_block",
        "round": rnd,
        **session_info(),
        "block_start_unix": block_start,
        "block_spread_sec": spread,
        "artifacts": [s[2] for s in steps],
        "sidecar": os.path.basename(sidecar),
    }))


if __name__ == "__main__":
    main()
