"""Profile the async end-to-end pipeline stage by stage.

Runs the same workload as ``bench.py``'s e2e-async leg (warm pass + timed
pass) and prints the ``glim_tpu.utils.profiling`` scope table, so stage
stalls (blocking device fetches, queue serialization) show up with names.
Plays the role of the reference's easy_profiler dumps when chasing
end-to-end throughput (SURVEY.md §5 profiling).

Usage: python -m glim_tpu.tools.profile_e2e [duration_s] [scan_hz]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    scan_hz = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

    from glim_tpu.io.synthetic import generate_sequence
    from glim_tpu.pipeline import GlimTPU
    from glim_tpu.utils import profiling

    seq = generate_sequence(duration=duration, scan_hz=scan_hz,
                            n_scan_points=20000, noise=0.01, seed=17,
                            scene_points=120000)

    def run_pass(n_warm: int):
        import jax
        glim = GlimTPU(async_mode=True)
        imu_idx = 0

        def feed(raw):
            nonlocal imu_idx
            while (imu_idx < len(seq.imu)
                   and seq.imu[imu_idx, 0] <= raw.stamp + 0.12):
                r = seq.imu[imu_idx]
                glim.insert_imu(r[0], r[1:4], r[4:7])
                imu_idx += 1
            while glim.workload() > 4:
                time.sleep(0.005)
                glim._pump()
            glim.insert_frame(raw)

        for k, raw in enumerate(seq.scans[:n_warm]):
            feed(raw)
            if k % 10 == 0:
                print(f"  warm scan {k}", flush=True)
        while glim.workload() > 0:
            time.sleep(0.02)
            glim._pump()
        odom = glim.odometry.odometry
        if getattr(odom, "window", None) is not None:
            jax.block_until_ready(odom.window.T)

        t0 = time.perf_counter()
        for k, raw in enumerate(seq.scans[n_warm:]):
            feed(raw)
            if k % 20 == 0:
                print(f"  scan {k}", flush=True)
        while glim.workload() > 0:
            time.sleep(0.005)
            glim._pump()
        t1 = time.perf_counter()
        from glim_tpu.utils import profiling as _prof
        _prof.report(reset=True)          # split: sustained vs drain scopes
        glim.wait()
        t2 = time.perf_counter()
        print("drain-phase scopes:", flush=True)
        for name, row in _prof.report(reset=False).items():
            print(f"  [drain] {name:28s} n={row['n']:<4d} "
                  f"total={row['total_s']:7.2f}s mean={row['mean_ms']:7.2f}ms",
                  flush=True)
        return t1 - t0, t2 - t1, len(seq.scans) - n_warm

    print("warm pass ...", flush=True)
    run_pass(n_warm=16)
    profiling.report(reset=True)
    print("timed pass ...", flush=True)
    sustained_s, drain_s, n = run_pass(n_warm=16)
    print(f"\nsustained: {n / sustained_s:.2f} scans/s "
          f"({sustained_s:.2f}s for {n} scans), drain {drain_s:.2f}s, "
          f"with-drain {n / (sustained_s + drain_s):.2f} scans/s\n",
          flush=True)
    for name, row in profiling.report(reset=True).items():
        print(f"{name:32s} n={row['n']:<5d} total={row['total_s']:8.2f}s "
              f"mean={row['mean_ms']:8.2f}ms max={row['max_ms']:8.2f}ms")


if __name__ == "__main__":
    main()
