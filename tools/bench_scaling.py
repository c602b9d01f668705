"""Two-cluster-size scaling evidence (north_rule).

The rule's N → 4N executor criterion is evidenced in this sandbox by running
the SAME fuse job at two parallelism levels — local[8] vs local[32] — on the
SAME deterministic input, in fresh JVMs (subprocess per level), reporting
throughput at both plus scaling efficiency = (T_8 / T_32) / 4.

Writes BENCH/BASELINE.md. Usage: python tools/bench_scaling.py [pairs] [tile]
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 96
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 64

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); pairs = int(sys.argv[2]); tile = int(sys.argv[3])
from homonim_spark.session import get_spark
from homonim_spark import datagen
from homonim_spark.operators.fuse import fuse
spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
specs = datagen.default_specs(scale=pairs, bands=1, tile=tile)
docs_pdf, tiles_pdf = datagen.build_fixture_tables(specs)
docs, tiles = datagen.to_spark(spark, docs_pdf, tiles_pdf, partitions=max(cpus, 8))
docs.cache().count(); tiles.cache().count()
# warm-up: spin up every python worker + JIT before timing
fuse(docs.limit(4 * cpus).repartition(cpus), tiles,
     model="gain-blk-offset", kernel_shape=(5, 5)).count()
t0 = time.perf_counter()
n = fuse(docs, tiles, model="gain-blk-offset", kernel_shape=(5, 5)).count()
dt = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "sec": dt, "tiles": n,
                  "tiles_per_sec": n / dt}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, str(cpus), str(PAIRS), str(TILE)],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"level {cpus} produced no result:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    r8 = run_level(8)
    r32 = run_level(32)
    eff = (r8["sec"] / r32["sec"]) / 4
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    md = f"""# BENCH/BASELINE — measured throughput & scaling efficiency

Job: fuse gain-blk-offset, 5×5 kernel (BASELINE.json `.metric`) over the
deterministic synthetic interleaved-documents table
({PAIRS} image pairs × 16 cells, tile={TILE}px ref / {2*TILE}px src,
{r32['tiles']} corrected tiles). Same input, two parallelism levels,
fresh JVM each (sandbox stand-in for N vs 4N executors per the task brief).

| parallelism | wall sec | tiles corrected/sec |
|---|---|---|
| local[8]  (N)  | {r8['sec']:.2f} | {r8['tiles_per_sec']:.1f} |
| local[32] (4N) | {r32['sec']:.2f} | {r32['tiles_per_sec']:.1f} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** (target ≥ 0.8,
BASELINE.json `.north_rule`).

Correctness across parallelism levels is bit-exact
(tests/test_fuse_spark.py::test_parallelism_invariance).
"""
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"n8": r8, "n32": r32, "efficiency": eff}))


if __name__ == "__main__":
    main()
