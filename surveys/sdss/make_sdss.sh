#!/bin/bash
# Build a single-arm SDSS template library (R ~ 2000, 3800-9200 A).
set -e
TEMPLPREF=${TEMPLPREF:-/data/PHOENIX-ACES-AGSS-COND-2011/}
WAVEFILE=${WAVEFILE:-/data/WAVE_PHOENIX-ACES-AGSS-COND-2011.fits}
PREFIX=${PREFIX:-templ_data/sdss/}
DBFILE=$PREFIX/files.db
mkdir -p $PREFIX
python -m rvspecfit_tpu.pipeline.read_grid --prefix $TEMPLPREF --templdb $DBFILE
python -m rvspecfit_tpu.pipeline.make_interpol \
    --setup sdss1 --lambda0 3800 --lambda1 9200 --resol 2000 --step 1.0 \
    --templdb $DBFILE --templprefix $TEMPLPREF --wavefile $WAVEFILE \
    --oprefix $PREFIX
python -m rvspecfit_tpu.pipeline.make_nd --setup sdss1 --prefix $PREFIX --regulargrid
python -m rvspecfit_tpu.pipeline.make_ccf --setup sdss1 \
    --lambda0 3800 --lambda1 9200 --step 1.0 \
    --prefix $PREFIX --oprefix $PREFIX --every 30
