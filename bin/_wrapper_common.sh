#!/bin/bash
# Shared experiment-layout setup for the case-study wrappers
# (mirrors the directory conventions of the reference bin/*_wrapper.sh).

BIN_DIR=$(dirname "$0")
ABSBASEDIR=$(cd "$BIN_DIR/.."; pwd)
DATA_DIR="${ABSBASEDIR}/data"
BASE_RESULTS_DIR="${ABSBASEDIR}/results"
PYTHON="python"

make_results_dir() {
   RESULTS_DIR="${BASE_RESULTS_DIR}/$1/nc"
   mkdir -p "$RESULTS_DIR"
}
