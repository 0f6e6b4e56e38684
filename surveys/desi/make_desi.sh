#!/bin/bash
# Build the three-arm DESI template library from a PHOENIX grid.
# Adjust TEMPLPREF/WAVEFILE to your PHOENIX installation.
set -e
TEMPLPREF=${TEMPLPREF:-/data/PHOENIX-ACES-AGSS-COND-2011/}
WAVEFILE=${WAVEFILE:-/data/WAVE_PHOENIX-ACES-AGSS-COND-2011.fits}
PREFIX=${PREFIX:-templ_data/desi/}
DBFILE=$PREFIX/files.db
VSINIS=0,300
EVERY=200

mkdir -p $PREFIX
python -m rvspecfit_tpu.pipeline.read_grid --prefix $TEMPLPREF --templdb $DBFILE

declare -a CONF=(desi_b desi_r desi_z)
declare -a LAM0=(3500 5660 7420)
declare -a LAM1=(5900 7720 9924)
declare -a RESOL=('x/1.55' 'x/1.55' 'x/1.8')
for i in 0 1 2; do
    python -m rvspecfit_tpu.pipeline.make_interpol \
        --setup ${CONF[$i]} --lambda0 ${LAM0[$i]} --lambda1 ${LAM1[$i]} \
        --resol_func ${RESOL[$i]} --step 0.4 --templdb $DBFILE \
        --templprefix $TEMPLPREF --wavefile $WAVEFILE --oprefix $PREFIX
    python -m rvspecfit_tpu.pipeline.make_nd \
        --setup ${CONF[$i]} --prefix $PREFIX --regulargrid
    python -m rvspecfit_tpu.pipeline.make_ccf \
        --setup ${CONF[$i]} --lambda0 ${LAM0[$i]} --lambda1 ${LAM1[$i]} \
        --step 0.4 --prefix $PREFIX --oprefix $PREFIX \
        --vsinis $VSINIS --every $EVERY
done
