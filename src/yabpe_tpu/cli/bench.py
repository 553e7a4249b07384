"""Benchmark CLI: delegates to the repo-root ``bench.py`` harness.

Kept thin so the driver-facing harness (repo root, prints one JSON line)
stays the single source of truth. Mirrors the reference's benchmark
scripts (/root/reference/tests/benchmark_trainer.py, benchmark_tokenizer.py).
"""

from __future__ import annotations

import runpy
import sys
from pathlib import Path


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="yabpe-bench",
        description=(
            "Run the benchmark harness (training + encode workloads; "
            "prints one JSON headline line to stdout, details to stderr)."
        ),
    )
    parser.parse_args()
    root = Path(__file__).resolve().parents[3]
    bench = root / "bench.py"
    if not bench.exists():
        print("bench.py not found (installed package without repo checkout)",
              file=sys.stderr)
        return 1
    runpy.run_path(str(bench), run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
