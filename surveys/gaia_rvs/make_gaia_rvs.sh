#!/bin/bash
set -e
TEMPLPREF=${TEMPLPREF:-/data/PHOENIX-ACES-AGSS-COND-2011/}
WAVEFILE=${WAVEFILE:-/data/WAVE_PHOENIX-ACES-AGSS-COND-2011.fits}
PREFIX=${PREFIX:-templ_data/gaia_rvs/}
DBFILE=$PREFIX/files.db
mkdir -p $PREFIX
python -m rvspecfit_tpu.pipeline.read_grid --prefix $TEMPLPREF --templdb $DBFILE
python -m rvspecfit_tpu.pipeline.make_interpol \
    --setup gaia_rvs --lambda0 8460 --lambda1 8700 --resol 11500 --step 0.1 \
    --templdb $DBFILE --templprefix $TEMPLPREF --wavefile $WAVEFILE \
    --oprefix $PREFIX
python -m rvspecfit_tpu.pipeline.make_nd --setup gaia_rvs --prefix $PREFIX --regulargrid
python -m rvspecfit_tpu.pipeline.make_ccf --setup gaia_rvs \
    --lambda0 8460 --lambda1 8700 --step 0.1 \
    --prefix $PREFIX --oprefix $PREFIX --every 30
