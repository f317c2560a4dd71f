#!/bin/bash
# AA on JRA-55 hgt500 PCs (mirrors reference
# bin/run_jra55_pca_aa_wrapper.sh: 167 EOFs, tol 1e-6, seed 0).
# Usage: run_jra55_pca_aa_wrapper.sh <n_components> <delta>
. "$(dirname "$0")/_wrapper_common.sh"
make_results_dir jra55

RANDOM_SEED=0; INIT=random; N_INIT=100; MAX_ITERATIONS=10000; TOLERANCE=1e-6
N_EOFS=167

test $# -eq 2 || { echo "Usage: $(basename "$0") <n_components> <delta>"; exit 1; }
n_components="$1"; delta="$2"

input_file="${RESULTS_DIR}/jra55_hgt500_pcs.${N_EOFS}eofs.nc"
output_file="${RESULTS_DIR}/jra55_hgt500_pcs.${N_EOFS}eofs.aa.k${n_components}.delta$(printf %5.3e "$delta").n_init${N_INIT}.nc"

$PYTHON "${BIN_DIR}/run_jra55_pca_aa.py" \
  --n-components "$n_components" --delta "$delta" \
  --init $INIT --n-init $N_INIT --tolerance $TOLERANCE \
  --max-iterations $MAX_ITERATIONS --random-seed $RANDOM_SEED \
  --verbose "$input_file" "$output_file"
