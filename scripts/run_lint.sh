#!/usr/bin/env bash
# Static analysis pass (reference: scripts/run_tidy.sh — clang-tidy over the
# C++ tree). Here: byte-compile check over the Python package + scripts, and
# a g++ syntax pass over the native IO runtime.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m compileall -q denseslam_tpu scripts tests bench.py __graft_entry__.py
echo "python: compileall OK"

if [ -f native/dsio.cpp ]; then
  g++ -std=c++17 -fsyntax-only -Wall -Wextra native/dsio.cpp \
    && echo "native: g++ -fsyntax-only OK"
fi
