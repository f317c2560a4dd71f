#!/bin/bash
# Run PCA/EOF analysis on HadISST SST anomalies with the frozen
# notebook settings (reference notebooks/hadisst_pca.ipynb: scos
# weights, SVD tol 1e-8, seed 0, base period 1981-2010, trend order 1).
# Usage: run_hadisst_pca_wrapper.sh <n_components>
. "$(dirname "$0")/_wrapper_common.sh"
make_results_dir hadisst

BASE_PERIOD_START_YEAR=1981; BASE_PERIOD_END_YEAR=2010; ANOMALY_TREND_ORDER=1
LAT_WEIGHTS=scos; RANDOM_SEED=0; TOLERANCE=1e-8

test $# -eq 1 || { echo "Usage: $(basename "$0") <n_components>"; exit 1; }
n_components="$1"

base_filename="${RESULTS_DIR}/HadISST_sst.anom.${BASE_PERIOD_START_YEAR}_${BASE_PERIOD_END_YEAR}.trend_order${ANOMALY_TREND_ORDER}"
input_file="${base_filename}.nc"
output_file="${base_filename}.pca.${LAT_WEIGHTS}.k${n_components}.nc"

$PYTHON "${BIN_DIR}/run_hadisst_pca.py" \
  --n-components "$n_components" --lat-weights $LAT_WEIGHTS \
  --tolerance $TOLERANCE --random-seed $RANDOM_SEED --verbose \
  "$input_file" "$output_file"
