#!/usr/bin/env python
"""cProfile the fused extraction kernel on the bench corpus (no Spark).

Usage: python scripts/profile_kernel.py [N_DOCS] [--time-only]

Runs ``extract_document`` over the same deterministic corpus the bench
uses (pages.build_page, seed 42) single-threaded, printing either a
cumulative-time profile or a plain wall-time measurement (for pinned
A/B runs).  Guide §1: measure first, isolate the computation.
"""
from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from exstruct_spark.kernels.extract import extract_document  # noqa: E402
from exstruct_spark.pages import build_page  # noqa: E402


def corpus(n: int) -> list:
    return [build_page(i) for i in range(n)]


def run(docs: list) -> int:
    acc = 0
    for d in docs:
        r = extract_document(d["url"], d["html"])
        acc += len(r["main_text"])
    return acc


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    time_only = "--time-only" in sys.argv
    docs = corpus(n)
    # warm-up (regex compile, imports)
    run(docs[:50])
    if time_only:
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            run(docs)
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        print(f"docs={n} best_wall={best:.3f}s "
              f"docs_per_sec_1thread={n / best:.1f}")
        return
    pr = cProfile.Profile()
    t0 = time.monotonic()
    pr.enable()
    run(docs)
    pr.disable()
    dt = time.monotonic() - t0
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())
    print(f"docs={n} wall={dt:.3f}s docs_per_sec_1thread={n / dt:.1f}")


if __name__ == "__main__":
    main()
