#!/bin/bash
# Run PCA/EOF analysis on JRA-55 hgt500 anomalies, producing the PCs
# file the jra55_pca_{aa,gpnh,kmeans} wrappers consume.
# Usage: run_jra55_pca_wrapper.sh <n_components>
. "$(dirname "$0")/_wrapper_common.sh"
make_results_dir jra55

LAT_WEIGHTS=scos; RANDOM_SEED=0; TOLERANCE=1e-8

test $# -eq 1 || { echo "Usage: $(basename "$0") <n_components>"; exit 1; }
n_components="$1"

input_file="${RESULTS_DIR}/JRA55_hgt500.anom.nc"
output_file="${RESULTS_DIR}/JRA55_hgt500.anom.pca.${LAT_WEIGHTS}.k${n_components}.nc"

$PYTHON "${BIN_DIR}/run_jra55_pca.py" \
  --n-components "$n_components" --lat-weights $LAT_WEIGHTS \
  --tolerance $TOLERANCE --random-seed $RANDOM_SEED --verbose \
  "$input_file" "$output_file"
