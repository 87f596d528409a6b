#!/bin/bash
# External-framework baseline leg (plays the role of the reference's
# /root/reference/benchmarking/pygt-bench.sh): trains the independent
# torch implementations side by side with ours on identical data, splits,
# and budgets, and regenerates results/baselines.md.
set -u
cd "$(dirname "$0")"
python3 baselines/run_baselines.py "$@"
