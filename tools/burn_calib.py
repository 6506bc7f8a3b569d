"""Pure-CPU burn calibration for bench interpretation on shared hosts.

Measures aggregate arithmetic throughput of 32 processes vs 8. A
healthy box reads ~3.2-3.6; readings below ~2.5 mean the host itself
is throttled. The documented interference pattern on this box
(BASELINE.md) is BURSTY and hits Ray's IPC/scheduling rather than
arithmetic — so a healthy burn alongside slow Ray wall-times means
"re-run later", while a low burn explains slow readings directly. Run
before and after bench.py / bench.py --scaling and treat single runs
that disagree with the healthy-window record as lottery draws."""
import multiprocessing as mp
import time


def burn(q):
    t0 = time.perf_counter()
    n = 0
    x = 1.0
    while time.perf_counter() - t0 < 3.0:
        for _ in range(10000):
            x = x * 1.0000001 % 10.0
        n += 10000
    q.put(n)


def agg(procs: int) -> int:
    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    tot = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return tot


if __name__ == "__main__":
    a8 = agg(8)
    a32 = agg(32)
    print(
        f"burn: 8proc={a8} 32proc={a32} "
        f"ratio={a32 / a8:.2f} (healthy ~3.2-3.6)"
    )
