import multiprocessing as mp, numpy as np, time, sys, json

def worker(q, seconds, nbytes):
    src = np.random.bytes(nbytes)
    a = np.frombuffer(src, dtype=np.uint8).copy()
    b = np.empty_like(a)
    t0 = time.perf_counter(); moved = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(b, a); moved += nbytes
    q.put(moved / (time.perf_counter() - t0))

def run(n, seconds=6, nbytes=256 << 20):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, seconds, nbytes)) for _ in range(n)]
    [p.start() for p in ps]; rates = [q.get() for _ in ps]; [p.join() for p in ps]
    return sum(rates) / 1e9

if __name__ == "__main__":
    r1 = run(1); r4 = run(4)
    print(json.dumps({"memcpy_gbps_1": round(r1,3), "memcpy_gbps_4": round(r4,3),
                      "memcpy_scaling_eff_1_to_4": round(r4/r1/4, 4)}))
