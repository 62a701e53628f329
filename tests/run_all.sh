#!/bin/sh
# Run the ENTIRE test suite (fast tier + slow tier + fuzz) in one command.
#
# The slow tier is split across a handful of pytest PROCESSES on purpose:
# the compile-heavy Pallas interpret-mode and grad suites stress the XLA
# CPU compiler, which in some environment JAX builds crashes when too many
# programs accumulate in one process (observed with jax 0.7.x: SIGSEGV in
# backend_compile_and_load at the jax.grad compile of
# tests/test_pallas_sweep.py when test_pallas_layer.py shares the
# process; each file passes alone).  The split below keeps a fresh
# compiler per group and is the supported way to reproduce the full green
# tier on any checkout.  Each group's selection is disjoint, and together
# they cover every test in tests/.
#
# Usage:  sh tests/run_all.sh            (from anywhere)
#         PYTHON=python3.12 sh tests/run_all.sh
set -e
cd "$(dirname "$0")/.."
PY="${PYTHON:-python}"

echo "=== tier 1/6: fast (everything not marked slow/fuzz) ==="
"$PY" -m pytest -q tests/ -m "not slow and not fuzz"

echo "=== tier 2/6: pallas layer-factory kernels (interpret mode) ==="
"$PY" -m pytest -q tests/test_pallas_layer.py -m slow

echo "=== tier 3/6: pallas sweep kernels + kernel-path VJP ==="
"$PY" -m pytest -q tests/test_pallas_sweep.py -m slow

echo "=== tier 4/6: pyref oracle parity + RAMI suites ==="
"$PY" -m pytest -q -m slow \
    tests/test_pyref_parity.py tests/test_rami_cases.py \
    tests/test_rami5.py tests/test_rami5_submission.py \
    tests/test_reference_cases.py

echo "=== tier 5/6: property fuzzing (hypothesis) ==="
"$PY" -m pytest -q tests/test_property_fuzz.py -m "slow or fuzz"

echo "=== tier 6/6: CLI / distributed / autodiff / sharding slow tests ==="
"$PY" -m pytest -q -m slow \
    tests/test_autodiff.py tests/test_cli_mesh.py \
    tests/test_distributed.py tests/test_multiprocess.py \
    tests/test_precision.py tests/test_retrieval_example.py \
    tests/test_sharding.py tests/test_streaming.py

echo "ALL TIERS GREEN"
