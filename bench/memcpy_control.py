"""Pure-memcpy platform-ceiling control (nothing of ours in the loop).

Workers synchronize on a start Event AFTER their private buffer setup
(round-5 review finding: without the barrier each worker's timed window
began as soon as its own 256 MB random-bytes setup finished, so parts of
every window ran with fewer than n concurrent copiers and the summed
aggregate overstated true n-process bandwidth — inflating the scaling
ceiling this control exists to measure)."""
import json
import multiprocessing as mp
import time

import numpy as np


def worker(q, start, seconds, nbytes):
    src = np.random.bytes(nbytes)
    a = np.frombuffer(src, dtype=np.uint8).copy()
    b = np.empty_like(a)
    start.wait()                      # all workers copy CONCURRENTLY
    t0 = time.perf_counter()
    moved = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(b, a)
        moved += nbytes
    q.put(moved / (time.perf_counter() - t0))


def run(n, seconds=6, nbytes=256 << 20, settle=3.0):
    q = mp.Queue()
    start = mp.Event()
    ps = [mp.Process(target=worker, args=(q, start, seconds, nbytes))
          for _ in range(n)]
    [p.start() for p in ps]
    time.sleep(settle)                # let every worker finish setup
    start.set()
    rates = [q.get() for _ in ps]
    [p.join() for p in ps]
    return sum(rates) / 1e9


if __name__ == "__main__":
    r1 = run(1)
    r4 = run(4)
    print(json.dumps({"memcpy_gbps_1": round(r1, 3),
                      "memcpy_gbps_4": round(r4, 3),
                      "memcpy_scaling_eff_1_to_4": round(r4 / r1 / 4, 4)}))
