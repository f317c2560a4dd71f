#!/bin/bash
# K-means on HadISST anomalies, frozen settings (mirrors reference
# bin/run_hadisst_kmeans_wrapper.sh: gap N_TRIALS=100, seed 0).
# Usage: run_hadisst_kmeans_wrapper.sh <n_clusters>
. "$(dirname "$0")/_wrapper_common.sh"
make_results_dir hadisst

BASE_PERIOD_START_YEAR=1981; BASE_PERIOD_END_YEAR=2010; ANOMALY_TREND_ORDER=1
LAT_WEIGHTS=scos; RANDOM_SEED=0; N_INIT=100; N_TRIALS=100; REFERENCE=uniform

test $# -eq 1 || { echo "Usage: $(basename "$0") <n_clusters>"; exit 1; }
n_components="$1"

base_filename="${RESULTS_DIR}/HadISST_sst.anom.${BASE_PERIOD_START_YEAR}_${BASE_PERIOD_END_YEAR}.trend_order${ANOMALY_TREND_ORDER}"
input_file="${base_filename}.nc"
output_file="${base_filename}.kmeans.${LAT_WEIGHTS}.k${n_components}.n_init${N_INIT}.nc"

$PYTHON "${BIN_DIR}/run_hadisst_kmeans.py" \
  --n-components "$n_components" --lat-weights $LAT_WEIGHTS \
  --n-init $N_INIT --n-trials $N_TRIALS --reference $REFERENCE \
  --random-seed $RANDOM_SEED --verbose "$input_file" "$output_file"
