#!/bin/bash
# Run archetypal analysis on HadISST SST anomalies with the frozen
# experiment settings (mirrors reference bin/run_hadisst_aa_wrapper.sh:
# seed 0, 100 random inits, tol 1e-4, max 10000 iterations, scos
# weights, base period 1981-2010, trend order 1).
# Usage: run_hadisst_aa_wrapper.sh <n_components> <delta>
. "$(dirname "$0")/_wrapper_common.sh"
make_results_dir hadisst

BASE_PERIOD_START_YEAR=1981; BASE_PERIOD_END_YEAR=2010; ANOMALY_TREND_ORDER=1
LAT_WEIGHTS=scos; RANDOM_SEED=0; INIT=random; N_INIT=100
MAX_ITERATIONS=10000; TOLERANCE=1e-4

test $# -eq 2 || { echo "Usage: $(basename "$0") <n_components> <delta>"; exit 1; }
n_components="$1"; delta="$2"

base_filename="${RESULTS_DIR}/HadISST_sst.anom.${BASE_PERIOD_START_YEAR}_${BASE_PERIOD_END_YEAR}.trend_order${ANOMALY_TREND_ORDER}"
input_file="${base_filename}.nc"
output_file="${base_filename}.aa.${LAT_WEIGHTS}.k${n_components}.delta$(printf %5.3e "$delta").n_init${N_INIT}.nc"

$PYTHON "${BIN_DIR}/run_hadisst_aa.py" \
  --n-components "$n_components" --delta "$delta" \
  --lat-weights $LAT_WEIGHTS --init $INIT --n-init $N_INIT \
  --tolerance $TOLERANCE --max-iterations $MAX_ITERATIONS \
  --random-seed $RANDOM_SEED --verbose "$input_file" "$output_file"
