"""Kill TPU campaign processes wedged by a relay drop (round-5 tool).

The axon relay's failure mode (BENCH_NOTES round 5): the remote side
goes silent and the client process freezes at its next device contact —
all threads in futex/epoll wait, CPU time frozen — while `timeout 7200`
keeps the campaign stage occupied for hours. This watchdog scans /proc
every 60 s for campaign processes (cmdline contains `training.cli` +
`fit`, or `items10m_serve.py`), skips CPU-backend runs
(JAX_PLATFORMS=cpu in environ), and SIGKILLs a specific PID only after
its cumulative CPU time has not advanced for >= THRESHOLD_S (600 s —
far above any remote-compile quiet window, far below the 2 h stage
timeout). The campaign scripts are idempotent, so a killed run is
retried by the next queue pass.
"""

from __future__ import annotations

import os
import time

THRESHOLD_S = 600
TICK_S = 60
state: dict[int, tuple[int, float]] = {}  # pid -> (jiffies, first_seen_frozen)


def cpu_jiffies(pid: int) -> int | None:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split(")")[-1].split()
        return int(parts[11]) + int(parts[12])  # utime + stime
    except (OSError, ValueError, IndexError):
        return None


def campaign_pids() -> list[int]:
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        pid = int(entry)
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                raw = f.read()
            argv = raw.decode("utf-8", "replace").split("\x00")
            cmd = " ".join(argv)
            # argv[0] must be the python interpreter itself — a `timeout`
            # wrapper's cmdline contains the same strings but its CPU
            # time is legitimately frozen while it waits
            if not argv or "python" not in os.path.basename(argv[0]):
                continue
            is_fit = "training.cli" in cmd and "fit" in cmd
            is_serve = "items10m_serve.py" in cmd
            if not (is_fit or is_serve):
                continue
            with open(f"/proc/{pid}/environ", "rb") as f:
                env = f.read().decode("utf-8", "replace")
            if "JAX_PLATFORMS=cpu" in env or "PALLAS_AXON_POOL_IPS=\x00" in env:
                continue  # CPU-mesh run, not relay-bound
            pids.append(pid)
        except OSError:
            continue
    return pids


def main() -> None:
    while True:
        now = time.time()
        live = campaign_pids()
        for pid in list(state):
            if pid not in live:
                del state[pid]
        for pid in live:
            j = cpu_jiffies(pid)
            if j is None:
                continue
            prev = state.get(pid)
            if prev is None or prev[0] != j:
                state[pid] = (j, now)
                continue
            frozen_for = now - prev[1]
            if frozen_for >= THRESHOLD_S:
                print(
                    f"{time.strftime('%H:%M:%S')} pid {pid} CPU frozen "
                    f"{frozen_for:.0f}s — killing (relay wedge)",
                    flush=True,
                )
                try:
                    os.kill(pid, 9)
                except OSError:
                    pass
                del state[pid]
        time.sleep(TICK_S)


if __name__ == "__main__":
    main()
