"""Scaling-efficiency evidence for the north rule (N → 4N ≥ 0.8).

No real cluster in this sandbox, so parallelism levels stand in for
cluster sizes: the IDENTICAL encode job (same materialized input
snapshot, same target partition size) runs in fresh subprocesses at
``local[N]`` and ``local[4N]`` (taskset-pinned to exactly that many host
CPUs; ``--cores 1,4`` is the evidence recipe — see BASELINE.md for why
the measurement moved from 2→8 to 1→4); we report tokens/sec at both and
efficiency = (throughput_4N / throughput_N) / 4.  ``--mode executors``
runs N REAL executor JVMs via ``local-cluster[N,1,4096]`` instead.

Usage (the BASELINE.md recipe)::

    TMPDIR=/dev/shm python tools/scaling_bench.py --docs 700000 \
        --target-tokens 1500000 --cores 1,4 --repeats 6
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def materialize_input(docs: int, path: str) -> None:
    from etl_sql_duckdb_parquet__spark.encode.synth import synth_token_table
    from etl_sql_duckdb_parquet__spark.session import get_spark

    spark = get_spark(cores=32, app_name="scaling_input")
    synth_token_table(spark, docs).write.mode("overwrite").parquet(path)
    spark.stop()


def run_encode(
    input_path: str,
    out: str,
    cores: int,
    target_tokens: int,
    mode: str = "cores",
    warmup_docs: int = 50_000,
) -> dict:
    # mode="cores": taskset pins the WHOLE process tree (JVM + forked
    # python workers) to exactly `cores` host CPUs — without it a local[8]
    # JVM's GC/shuffle/netty threads and python workers spill onto extra
    # cores and the N-vs-4N comparison measures nothing.
    # mode="executors": `cores` REAL executor JVMs (local-cluster, 1 task
    # slot each, separate processes, cross-executor netty shuffle),
    # unpinned — each executor's helper threads overlap onto free host
    # cores exactly as a real cluster node's would.
    cli = [
        sys.executable,
        "-m",
        "etl_sql_duckdb_parquet__spark.encode.cli",
        "--input-parquet",
        input_path,
        "--out",
        out,
        "--cores",
        str(cores),
        "--target-tokens",
        str(target_tokens),
        "--no-resume",
        "--no-verify",
        "--skip-reference",
        "--warmup-runs",
        "1",
        "--warmup-docs",
        str(warmup_docs),
    ]
    env = dict(os.environ)
    if mode == "executors":
        cmd = cli
        env["SPARK_GRAFT_MASTER"] = f"local-cluster[{cores},1,4096]"
        env["SPARK_DRIVER_MEM"] = "8g"
    else:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cli
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=1800, env=env
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--target-tokens", type=int, default=600_000)
    # default pair 2→8: both below the single-node memory-bandwidth knee
    # (see BASELINE.md "Measured results") so N vs 4N compares compute, not
    # one shared DRAM system
    ap.add_argument("--cores", default="2,8")
    ap.add_argument(
        "--mode",
        choices=["cores", "executors"],
        default="cores",
        help="'cores': pinned local[N] threads; 'executors': N real "
        "executor JVMs via local-cluster[N,1,4096]",
    )
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--warmup-docs",
        type=int,
        default=50_000,
        help="docs in the untimed warmup encode; in executors mode use "
        "~200k so every executor JVM reaches JIT steady state (a real "
        "long-lived executor's condition) before the timed run",
    )
    args = ap.parse_args()
    cores_list = [int(c) for c in args.cores.split(",")]

    work = tempfile.mkdtemp(prefix="scaling_")
    input_path = os.path.join(work, "input")
    try:
        print(f"materializing {args.docs} docs → {input_path}", file=sys.stderr)
        materialize_input(args.docs, input_path)

        # interleave reps across core counts so host-level noise (this
        # sandbox shares CPU) hits both parallelism levels evenly; the
        # PER-PAIR efficiency is the honest statistic — adjacent runs see
        # comparable host state, so noise cancels within a pair where it
        # would dominate a cross-rep best-of comparison
        results = {}
        pair_eff = []
        lo, hi = min(cores_list), max(cores_list)
        ratio = hi / lo
        for rep in range(args.repeats):
            pair = {}
            for cores in cores_list:
                out = os.path.join(work, f"enc_{cores}_{rep}")
                stats = run_encode(
                    input_path,
                    out,
                    cores,
                    args.target_tokens,
                    args.mode,
                    args.warmup_docs,
                )
                shutil.rmtree(out, ignore_errors=True)
                tput = stats["n_tokens"] / stats["encode_wall_s"]
                pair[cores] = tput
                print(
                    f"local[{cores}] rep{rep}: {stats['n_tokens']} tokens "
                    f"in {stats['encode_wall_s']}s → {tput:,.0f} tok/s "
                    f"({stats['n_parts_encoded']} parts)",
                    file=sys.stderr,
                )
                best = results.get(cores)
                if best is None or tput > best["tokens_per_s"]:
                    results[cores] = {
                        "cores": cores,
                        "n_tokens": stats["n_tokens"],
                        "n_parts": stats["n_parts_encoded"],
                        "encode_wall_s": stats["encode_wall_s"],
                        "tokens_per_s": round(tput, 1),
                    }
            if lo in pair and hi in pair:
                e = (pair[hi] / pair[lo]) / ratio
                pair_eff.append(round(e, 3))
                print(
                    f"pair rep{rep}: efficiency {e:.3f}", file=sys.stderr
                )

        eff = (
            results[hi]["tokens_per_s"] / results[lo]["tokens_per_s"]
        ) / ratio
        med = sorted(pair_eff)[len(pair_eff) // 2] if pair_eff else None
        summary = {
            "runs": list(results.values()),
            "scaling_factor": ratio,
            "speedup": round(
                results[hi]["tokens_per_s"] / results[lo]["tokens_per_s"], 3
            ),
            "scaling_efficiency": round(eff, 3),
            "pair_efficiencies": pair_eff,
            "median_pair_efficiency": med,
            "pass_ge_0.8": (med if med is not None else eff) >= 0.8,
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
