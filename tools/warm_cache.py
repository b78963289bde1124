"""Pre-compile the bench's expensive XLA programs into the persistent
compilation cache (.jax_bench_cache) so `python bench.py` pays step time,
not compile time (VERDICT r3 item 1/5: compile cost is a product metric —
the round-3 flagship row recompiled ~35 min cold and timed the bench out).

Run on the target device (TPU) after any edit to jitted step code:

    python tools/warm_cache.py            # everything incl. flagship
    python tools/warm_cache.py --fast     # skip the flagship AutoTS row

The cache is content-addressed, so re-warming after an edit only
recompiles the programs the edit touched.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true",
                   help="skip the flagship AutoTS row")
    p.add_argument("--priority", action="store_true",
                   help="warm the expensive AutoTS rows FIRST (mini, "
                        "then flagship) so a wall-clock-bounded session "
                        "caches the programs that matter most")
    args = p.parse_args()

    jobs = [
        ("rfo_lj", bench.bench_rfo_lj),
        ("sqm_neb32", bench.bench_sqm_neb32),
        ("aldol_neb_f32", bench.bench_aldol_neb_fixture),
        ("sqm_f64", bench.bench_sqm_f64_tight),
        ("aldol_neb_sqm2_f64", bench.bench_aldol_neb_sqm2_f64),
        ("sqm2_scale", bench.bench_sqm2_scale_ab),
        ("autots_mini_ours", bench._our_autots_mini),
    ]
    if not args.fast:
        jobs.append(("autots_flagship", bench.bench_autots_flagship))
    if args.priority:
        front = [j for j in jobs
                 if j[0] in ("autots_mini_ours", "autots_flagship")]
        jobs = front + [j for j in jobs if j not in front]

    cache = "/root/repo/.jax_bench_cache"
    for name, fn in jobs:
        n0 = len(os.listdir(cache)) if os.path.isdir(cache) else 0
        t0 = time.perf_counter()
        try:
            fn()
            status = "ok"
        except Exception as exc:  # keep warming the rest
            status = f"ERROR {exc!r}"[:200]
        n1 = len(os.listdir(cache)) if os.path.isdir(cache) else 0
        print(f"[warm] {name}: {time.perf_counter() - t0:.1f}s, "
              f"+{n1 - n0} cached programs, {status}", flush=True)


if __name__ == "__main__":
    main()
