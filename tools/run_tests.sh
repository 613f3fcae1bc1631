#!/bin/bash
# Test runner (reference: tools/run-mypy.sh + Jenkins pytest stages).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
