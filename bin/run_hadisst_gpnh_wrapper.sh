#!/bin/bash
# GPNH convex coding on HadISST anomalies, frozen settings
# (mirrors reference bin/run_hadisst_gpnh_wrapper.sh).
# Usage: run_hadisst_gpnh_wrapper.sh <n_components> <lambda_W>
. "$(dirname "$0")/_wrapper_common.sh"
make_results_dir hadisst

BASE_PERIOD_START_YEAR=1981; BASE_PERIOD_END_YEAR=2010; ANOMALY_TREND_ORDER=1
LAT_WEIGHTS=scos; RANDOM_SEED=0; INIT=random; N_INIT=100
MAX_ITERATIONS=10000; TOLERANCE=1e-4

test $# -eq 2 || { echo "Usage: $(basename "$0") <n_components> <lambda_W>"; exit 1; }
n_components="$1"; lambda_W="$2"

base_filename="${RESULTS_DIR}/HadISST_sst.anom.${BASE_PERIOD_START_YEAR}_${BASE_PERIOD_END_YEAR}.trend_order${ANOMALY_TREND_ORDER}"
input_file="${base_filename}.nc"
output_file="${base_filename}.gpnh.${LAT_WEIGHTS}.k${n_components}.lambda$(printf %5.3e "$lambda_W").n_init${N_INIT}.nc"

$PYTHON "${BIN_DIR}/run_hadisst_gpnh.py" \
  --n-components "$n_components" --lambda-W "$lambda_W" \
  --lat-weights $LAT_WEIGHTS --init $INIT --n-init $N_INIT \
  --tolerance $TOLERANCE --max-iterations $MAX_ITERATIONS \
  --random-seed $RANDOM_SEED --verbose "$input_file" "$output_file"
