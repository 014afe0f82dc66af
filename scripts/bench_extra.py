"""Targeted BENCH_ALL tail: the large-curve / extra-scheme metric lines
that the budgeted default run cuts (BrainpoolP512, SM2, GOST-512, Ed448).

Run standalone on hardware; stdout metric lines are appended to
BENCH_ALL_r{N}.json. Same emit/diag machinery as bench.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    n = int(os.environ.get("BENCH_BATCH", "8192"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "3000"))
    bench._diag("startup_extra", budget_s=budget_s, batch=n, iters=iters)
    bench._start_watchdog(budget_s)
    import jax
    import jax.numpy as jnp

    plan = [
        (bench.bench_verify, ("BRAINPOOLP512R1", n, iters)),
        (bench.bench_verify, ("SM2P256V1", n, iters)),
        (bench.bench_verify, ("GOST512", n, iters)),
        (bench.bench_ed_verify, ("ed448", n, iters)),
    ]
    for fn, fargs in plan:
        if bench._elapsed() + 120.0 > budget_s * 0.9:
            bench._diag("skipping_remaining", reason="budget")
            break
        bench._safe(fn, jax, jnp, *fargs)
    bench._diag("extra_done", elapsed_s=round(bench._elapsed(), 1))
    os._exit(0)


if __name__ == "__main__":
    main()
