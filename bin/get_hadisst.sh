#!/bin/sh
# Fetch HadISST SST/ice from the Met Office HadOBS server (mirrors
# reference bin/get_hadisst.sh).  NOTE: in zero-egress environments this
# cannot run; use bin/make_synthetic_hadisst.py to generate a synthetic
# dataset with the same schema for pipeline testing.
BASE_DIR=$(dirname "$0")
DATA_DIR="${BASE_DIR}/../data"
LOGS_DIR="${BASE_DIR}/../logs"
mkdir -p "$DATA_DIR" "$LOGS_DIR"
LOG_FILE="${LOGS_DIR}/get_hadisst.log"

HADOBS_URL="https://www.metoffice.gov.uk/hadobs"
for f in HadISST_sst.nc.gz HadISST_ice.nc.gz; do
  wget -a "$LOG_FILE" -O "${DATA_DIR}/$f" "${HADOBS_URL}/hadisst/data/$f" \
    && gunzip -f "${DATA_DIR}/$f"
done
