#!/usr/bin/env bash
# CI: full suite BOTH donation modes (config.donate defaults ON since r3;
# VEXTPU_DONATE=0 is the opt-out — both must stay green, the analog of the
# reference testing every backend in tests/CMakeLists.txt:48-67).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== pytest (donate ON, the default) ==="
python -m pytest tests/ -q

echo "=== pytest (VEXTPU_DONATE=0) ==="
VEXTPU_DONATE=0 python -m pytest tests/ -q
