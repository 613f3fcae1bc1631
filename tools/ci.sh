#!/usr/bin/env bash
# One-command CI: lint + bytecode-compile + tests (reference parity:
# jenkins/Jenkinsfile:50-117 runs pytest; .pre-commit-config.yaml lints).
#
# This runs hermetically (no network): lint is the stdlib tools/lint.py;
# ruff/mypy run additionally when installed (see .github/workflows/ci.yml,
# ruff.toml, mypy.ini).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint (tools/lint.py) =="
python tools/lint.py

if command -v ruff >/dev/null 2>&1; then
  echo "== ruff =="
  ruff check .
fi
if command -v mypy >/dev/null 2>&1; then
  echo "== mypy =="
  mypy gwen_tpu
fi

echo "== api docs (tools/gen_docs.py --check) =="
python tools/gen_docs.py --check

echo "== compileall =="
python -m compileall -q gwen_tpu tests benchmarks bench.py __graft_entry__.py

echo "== pytest =="
python -m pytest tests/ -q

echo "== multi-process dryrun =="
python tools/multiproc_dryrun.py

echo "CI OK"
