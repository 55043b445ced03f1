#!/usr/bin/env bash
# One-shot regression drive: tests + oracle verify + bench.
set -e
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle verify (sf0.01) =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} python scripts/verify_local.py /root/testdata/sf0.01
echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} python bench.py
echo "== degenerate-input sweep =="
python scripts/sweep_degenerate.py all
