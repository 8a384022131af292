"""Measure the CPU reference-class baseline for BASELINE config 1.

Builds native/reference_pipeline.cpp (single-threaded C++, -O3), runs it on
the exact genomes bench.py uses (seed 37, 1 Mbp pair at ~1% divergence), and
writes BASELINE_MEASURED.json at the repo root.  bench.py reads that file
for its vs_baseline denominator; without it, it falls back to the historical
estimate.

The C++ pipeline is a conservative LOWER bound on the actual reference
(libMems + MUSCLE subprocess) wall-clock: it replaces the per-gap MUSCLE
fork/exec with plain Gotoh DP and omits recursive re-anchoring / LCB
extension (see the header of native/reference_pipeline.cpp).

Usage: python scripts/measure_baseline.py [genome_size] [repeats]
"""

import json
import os
import platform
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SRC = os.path.join(ROOT, "native", "reference_pipeline.cpp")
BIN = os.path.join(ROOT, "native", "reference_pipeline")


def build() -> str:
    if not (
        os.path.exists(BIN) and os.path.getmtime(BIN) >= os.path.getmtime(SRC)
    ):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", SRC, "-o", BIN],
            check=True,
        )
    return BIN


def measure(genome_size: int = 1_000_000, repeats: int = 3) -> dict:
    from mauvealigner_tpu.seeds import default_mer_size, get_seed
    from mauvealigner_tpu.utils import simulate

    rng = np.random.default_rng(37)
    anc = simulate.random_genome(rng, genome_size)
    der, _ = simulate.evolve(
        anc, rng, sub_rate=0.01, ins_rate=0.0005, del_rate=0.0005
    )
    avg = (len(anc) + len(der)) // 2
    seed = get_seed(default_mer_size(avg), 0)
    binary = build()

    def run_mode(extra, reps):
        runs = []
        for _ in range(reps):
            t0 = time.time()
            out = subprocess.run(
                [binary, seed.pattern, fa, fb] + extra,
                check=True,
                capture_output=True,
                text=True,
            )
            rec = json.loads(out.stdout)
            rec["wallclock_s"] = round(time.time() - t0, 3)
            runs.append(rec)
        return min(runs, key=lambda r: r["total_s"]), runs

    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "a.raw")
        fb = os.path.join(td, "b.raw")
        anc.codes.astype(np.uint8).tofile(fa)
        der.codes.astype(np.uint8).tofile(fb)
        lower, lower_runs = run_mode([], repeats)
        # the reference ARCHITECTURE: one fork/exec'd DP child per
        # inter-anchor gap, regions shipped through temp files, exactly as
        # MuscleInterface drives muscle_aed (SURVEY.md §3.1 process boundary)
        arch, arch_runs = run_mode(["--fork-closure"], repeats)
    return {
        "metric": "pairwise_1mbp_cpu_reference_class",
        "value": round(arch["total_s"], 3),
        "unit": "s",
        "lower_bound_s": round(lower["total_s"], 3),
        "architecture_s": round(arch["total_s"], 3),
        "genome_size": genome_size,
        "seed_pattern": seed.pattern,
        "detail_lower_bound": lower,
        "detail_architecture": arch,
        "all_lower_bound_totals_s": [round(r["total_s"], 3) for r in lower_runs],
        "all_architecture_totals_s": [round(r["total_s"], 3) for r in arch_runs],
        "host": platform.processor() or platform.machine(),
        "hostname": platform.node(),
        "note": (
            "single-threaded C++ -O3 reference-class pipeline "
            "(native/reference_pipeline.cpp), both measured on this host: "
            "lower_bound_s runs the gap DP in-process (strictly faster than "
            "any real reference run); architecture_s fork/execs a DP child "
            "per inter-anchor gap through temp files, which is the "
            "reference's actual closure architecture (MUSCLE subprocess per "
            "region).  Both omit recursion and LCB extension (conservative)."
        ),
    }


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rec = measure(size, reps)
    out_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    print(json.dumps(rec))
