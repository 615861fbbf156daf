"""Run the full benchmark suite and emit one combined JSON report.

Each section is a separate subprocess so a failure (or an environment
without TPU) degrades to a recorded error instead of killing the report.

Usage: python benchmarks/run_all.py [--quick] [--out report.json]
  --quick  shrinks problem sizes for smoke runs (CI / CPU).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_json_lines(cmd, timeout=1800):
    """Run a benchmark script; collect its JSON-object stdout lines."""
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return {"error": "timeout", "cmd": cmd}
    records = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    if proc.returncode != 0 and not records:
        return {"error": proc.stderr.strip()[-500:], "cmd": cmd}
    return {"records": records}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    py = sys.executable
    if args.quick:
        sections = {
            "headline_pairs_per_sec": [py, "bench.py", "8", "2"],
            "retrieval": [py, "benchmarks/bench_retrieval.py", "2000", "64", "10"],
            "corpus_eval": [py, "benchmarks/bench_eval_corpus.py", "50", "2", "3"],
        }
    else:
        sections = {
            "headline_pairs_per_sec": [py, "bench.py"],
            "retrieval": [py, "benchmarks/bench_retrieval.py", "100000", "1024", "10"],
            "towers": [py, "benchmarks/bench_towers.py"],
            "corpus_eval": [py, "benchmarks/bench_eval_corpus.py", "1000", "4", "5"],
            "topk_exact_vs_approx": [py, "benchmarks/exp_topk.py"],
            "train_h14_single_chip": [
                py, "benchmarks/bench_train_large.py", "ViT-H-14", "32",
                "16", "3", "1",
            ],
        }

    report = {}
    for name, cmd in sections.items():
        print(f"== {name}: {' '.join(cmd[1:])}", file=sys.stderr)
        report[name] = run_json_lines(cmd)

    out = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).write_text(out)
        print(f"wrote {args.out}", file=sys.stderr)
    print(out)


if __name__ == "__main__":
    main()
