"""cProfile dump viewer (parity with the reference's profiling helper,
/root/reference/scripts/cprof_stat.py): loads a profile dump and prints the
top entries by cumulative time. For device-side profiling use
``yabpe-train --profile-dir`` (jax.profiler traces, viewable in
XProf/TensorBoard) instead — see yabpe_tpu.utils.profiling.

Usage: python scripts/cprof_stat.py [prof.out] [top_n]
"""

from __future__ import annotations

import pstats
import sys


def analyze_profile_data(path: str = "./prof.out", top_n: int = 20) -> None:
    stats = pstats.Stats(path)
    stats.sort_stats("cumulative")
    stats.print_stats(top_n)


if __name__ == "__main__":
    analyze_profile_data(
        sys.argv[1] if len(sys.argv) > 1 else "./prof.out",
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
    )
