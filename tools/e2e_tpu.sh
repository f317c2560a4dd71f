#!/usr/bin/env bash
# End-to-end case-study chain on the REAL TPU: synthetic HadISST ->
# anomalies -> AA driver + PCA product driver; synthetic JRA-55 grid ->
# jra55_pca -> jra55_pca_aa; asserts output netCDF structure.
# Takes ~15 min (first-compile dominated).  See .claude/skills/verify.
set -ex
cd /root/repo
T=$(mktemp -d)
python bin/make_synthetic_hadisst.py $T/raw.nc --n-years 30 --n-lat 24 --n-lon 36 --start-year 1989
python -m convex_dim_red_tpu.cli.anomalies $T/raw.nc $T/anom.nc --var-name sst --base-period-start-year 1994 --base-period-end-year 2013
python -m convex_dim_red_tpu.cli.drivers hadisst_aa $T/anom.nc $T/aa.nc --n-components 3 --n-init 4 --tolerance 1e-4 --max-iterations 100 --random-seed 0
python -m convex_dim_red_tpu.cli.drivers hadisst_pca $T/anom.nc $T/pca.nc --n-components 10 --random-seed 0
python bin/make_synthetic_jra55.py $T/hgt.nc --kind grid --n-years 15
python -m convex_dim_red_tpu.cli.drivers jra55_pca $T/hgt.nc $T/jpca.nc --n-components 6 --random-seed 0
python -m convex_dim_red_tpu.cli.drivers jra55_pca_aa $T/jpca.nc $T/pcaa.nc --n-components 2 --n-init 3 --tolerance 1e-6 --max-iterations 100 --random-seed 0
python - "$T" << 'PYEOF'
import sys, numpy as np
from convex_dim_red_tpu.pipelines.dataset import open_dataset
T = sys.argv[1]
aa = open_dataset(T + "/aa.nc")
assert np.allclose(aa["weights"].data.sum(axis=1), 1, atol=1e-5)
pca = open_dataset(T + "/pca.nc")
assert "PCs" in pca and "EOFs" in pca
pcaa = open_dataset(T + "/pcaa.nc")
assert np.allclose(pcaa["weights"].data.sum(axis=1), 1, atol=1e-5)
assert pcaa["archetypes"].data.shape == (2, 6)
print("TPU E2E OK: aa cost =", aa.attrs.get("training_set_cost"),
      "| pca evr[0] =", float(pca["explained_variance_ratio"].data[0]),
      "| jra55 pc-aa cost =", pcaa.attrs.get("training_set_cost"))
PYEOF
rm -rf $T
