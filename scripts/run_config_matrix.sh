#!/bin/bash
# Config-matrix runtime tests — the analog of the reference CI's
# wordsize (16/32/64) x blinding x sanitizer matrix
# (/root/reference/.github/workflows/libecc_runtime_tests.yml:12-37).
#
# Axes here (the framework's runtime switches, config.py):
#   * LIBECC_TPU_LIMB_BITS : 15 (default) / 13 (raw-column accumulation)
#   * LIBECC_TPU_PALLAS    : 1 (fused kernels; CPU = interpret off) / 0
#   * blinding             : covered inside the suite (test_blinding
#                            runs blinded==plain byte-identity per scheme)
#
# Each cell runs the smoke arithmetic + one-scheme slice. Usage:
#   bash scripts/run_config_matrix.sh [extra pytest args]

set -u
cd "$(dirname "$0")/.."

SMOKE="tests/test_nn.py tests/test_nn_ops.py tests/test_sqr.py tests/test_ecdsa.py"
FAILED=0

EXTRA_ARGS=("$@")

run_cell() {
    local limb="$1" pallas="$2"
    echo "=== LIMB_BITS=$limb PALLAS=$pallas ==="
    LIBECC_TPU_LIMB_BITS="$limb" LIBECC_TPU_PALLAS="$pallas" \
        python -m pytest $SMOKE -q -x --no-header "${EXTRA_ARGS[@]}" \
        || { echo "CELL FAILED: limb=$limb pallas=$pallas"; FAILED=1; }
}

run_cell 15 1
run_cell 15 0
run_cell 13 0   # 13-bit raw-column mode (nn/core.py:36) — XLA path
run_cell 13 1   # 13-bit + kernels (rows backend handles raw mode)

if [ "$FAILED" -ne 0 ]; then
    echo "CONFIG MATRIX: FAILURES"
    exit 1
fi
echo "CONFIG MATRIX: ALL CELLS GREEN"
