#!/bin/bash
# K-means on JRA-55 hgt500 PCs (mirrors reference
# bin/run_jra55_pca_kmeans_wrapper.sh; PCA-reference gap statistic).
# Usage: run_jra55_pca_kmeans_wrapper.sh <n_clusters>
. "$(dirname "$0")/_wrapper_common.sh"
make_results_dir jra55

RANDOM_SEED=0; N_INIT=100; N_TRIALS=100; REFERENCE=pca; N_EOFS=167

test $# -eq 1 || { echo "Usage: $(basename "$0") <n_clusters>"; exit 1; }
n_components="$1"

input_file="${RESULTS_DIR}/jra55_hgt500_pcs.${N_EOFS}eofs.nc"
output_file="${RESULTS_DIR}/jra55_hgt500_pcs.${N_EOFS}eofs.kmeans.k${n_components}.n_init${N_INIT}.nc"

$PYTHON "${BIN_DIR}/run_jra55_pca_kmeans.py" \
  --n-components "$n_components" --n-init $N_INIT \
  --n-trials $N_TRIALS --reference $REFERENCE \
  --random-seed $RANDOM_SEED --verbose "$input_file" "$output_file"
