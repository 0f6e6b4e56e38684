"""WEAVE batch-fitting pipeline (rvst_weave_fit).

Equivalent of the reference rvs_weave_fit
(reference: py/rvspecfit/weave/weave_fit.py): fits WEAVE red+blue arm
files — wavelength grids derived from the WCS header keywords,
telluric-band error inflation, target selection by TARGCAT program,
fiber striping across workers — rebuilt around the batched TPU
fitter: all selected fibers of a file are fitted simultaneously
instead of looping per fiber.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time

# anti-oversubscription (reference: desi_fit.py:1-3)
os.environ.setdefault('OMP_NUM_THREADS', '1')

import numpy as np

from rvspecfit_tpu import utils
from rvspecfit_tpu.io import fitsio
from rvspecfit_tpu.fit import ccf as ccf_mod
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.ops import continuum as continuum_mod
from rvspecfit_tpu.pipeline import library

TELLURIC_BANDS = [(6850, 7000), (8130, 8350), (8940, 9240),
                  (9250, 9545), (9550, 10000)]
DEFAULT_PROGRAMS = ('GA_LRhighlat', 'GA_LRdisc')


def wcs_wavelengths(header, npix):
    """Linear-WCS wavelength grid in angstrom
    (reference: weave_fit.py:170-172, without astropy.wcs)."""
    crval = float(header.get('CRVAL1', 0.0))
    cd = header.get('CD1_1', header.get('CDELT1', 1.0))
    crpix = float(header.get('CRPIX1', 1.0))
    unit = str(header.get('CUNIT1', 'm')).strip().lower()
    scale = {'m': 1e10, 'angstrom': 1.0, 'nm': 10.0}.get(unit, 1e10)
    pix = np.arange(npix)
    return (crval + (pix + 1 - crpix) * float(cd)) * scale


def valid_file(fp):
    names = {str(n).upper() for n in fp.names()}
    missing = {'RED_DATA', 'RED_IVAR', 'FIBTABLE'} - names
    if missing:
        logging.error('Missing extensions: %s', sorted(missing))
        return False
    return True


def proc_weave(fnames, config, threadid=0, nthreads=1,
               programs=DEFAULT_PROGRAMS, options=None, templates=None,
               fig_prefix=None, prehdus=None):
    """Fit one WEAVE red(+blue) file pair; returns a dict of columns
    (None when no fibers are selected).

    ``prehdus``: optional {fname: FITSFile} of pre-read inputs
    (proc_many's lookahead thread reads the next group while the
    current one fits on the device)."""
    options = options or {'npoly': 15}
    if isinstance(fnames, str):
        fnames = fnames.split(',')
    setups = []
    fps = {}
    for f in fnames:
        fp = (prehdus or {}).get(f) or fitsio.read(f)
        cam = str(fp[0].header.get('CAMERA', '')).replace('WEAVE', '')
        s = {'RED': 'r', 'BLUE': 'b'}.get(cam.strip().upper())
        if s is None:
            raise RuntimeError(f'{f}: unknown CAMERA {cam!r}')
        fps[s] = fp
        setups.append(s)
    setups = sorted(setups)  # b before r

    fp0 = fps[setups[0]]
    tab = None
    for s in setups:
        if 'FIBTABLE' in fps[s]:
            tab = fps[s]['FIBTABLE'].data
            hdr0 = fps[s][0].header
            break
    if tab is None:
        raise RuntimeError('No FIBTABLE extension found')
    targetid = np.char.replace(tab['TARGID'].astype(str), '"', '')
    brick = str(hdr0.get('OBID', 'unknown')).replace('.', '').replace(
        '/', '').replace('_', '')

    targcat = np.char.strip(tab['TARGCAT'].astype(str))
    sel = np.zeros(len(targcat), dtype=bool)
    for p in programs:
        sel |= targcat == p
    xids = np.nonzero(sel)[0]
    if len(xids) > 0 and nthreads > 1:
        stripe = np.linspace(0, nthreads, len(xids), False).astype(int)
        xids = xids[stripe == threadid]
    if len(xids) == 0:
        return None

    arms = []
    sns = {}
    for s in setups:
        cam = {'b': 'BLUE', 'r': 'RED'}[s]
        flux = np.atleast_2d(fps[s][f'{cam}_DATA'].data)[xids].astype(
            np.float64)
        ivar = np.atleast_2d(fps[s][f'{cam}_IVAR'].data)[xids].astype(
            np.float64)
        wave = wcs_wavelengths(fps[s][f'{cam}_DATA'].header,
                               flux.shape[1])
        telluric = np.zeros(len(wave), bool)
        for lo, hi in TELLURIC_BANDS:
            telluric |= (wave >= lo) & (wave < hi)
        # inflate telluric-band errors (reference: weave_fit.py:173-181)
        ivar[:, telluric] = 1.0 / 100.0 / np.maximum(
            flux[:, telluric], 1.0)**2
        badmask = ivar <= 0
        with np.errstate(divide='ignore'):
            esp = 1.0 / np.sqrt(np.where(badmask, 1, ivar))
        sns[s] = continuum_mod.masked_median(flux / esp, ~badmask)
        arms.append(BatchArm(f'weave_{s}', wave, flux, ivar,
                             badmask=badmask, setup=f'weave_{s}'))

    if templates is None:
        templates = library.load_template_models(
            config, {f'weave_{s}' for s in setups})
    parnames = templates[arms[0].setup].parnames

    nf = len(xids)
    start_params = np.zeros((nf, len(parnames)))
    start_vel = np.zeros(nf)
    start_vsini = np.zeros(nf)
    try:
        cres = ccf_mod.fit_batch(
            [(a.setup, a.lam, a.flux,
              1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), a.badmask)
             for a in arms], config)
        order = [cres['parnames'].index(p) for p in parnames]
        start_params[:] = cres['best_params'][:, order]
        start_vel[:] = cres['best_vel']
        vs = cres['best_vsini']
        start_vsini[:] = np.where(np.isfinite(vs), vs, 0.0)
        bad = ~np.isfinite(cres['best_chi'])
        if bad.any():
            logging.warning('CCF failed for %d fibers', bad.sum())
            start_params[bad] = [5000.0, 3.0, -1.0, 0.2][:len(parnames)]
            start_vel[bad] = 0.0
    except Exception as exc:
        logging.warning('batched CCF failed: %s', exc)
        start_params[:] = [5000.0, 3.0, -1.0, 0.2][:len(parnames)]

    bf = BatchedFitter(arms, templates, config, options=options,
                       use_vsini=True)
    # multi-chip hosts: fiber axis over all local devices (no-op on
    # one chip; RVST_NO_MESH=1 opts out) — same as the DESI driver
    if os.environ.get('RVST_NO_MESH') != '1':
        from rvspecfit_tpu.parallel import mesh as pmesh
        wmesh = pmesh.auto_shard(bf)
        if wmesh is not None:
            logging.info('fitter sharded over %d local devices',
                         wmesh.devices.size)
    paramDict0 = dict(zip(parnames, start_params.mean(axis=0)))
    paramDict0['vsini'] = 0.01
    mapper = vel_fit.ParamMapper(
        parnames, paramDict0, [],
        vel_fit.VSiniMapper(config['max_vsini'],
                            config.get('min_vsini') or 0.0), True)
    x0 = np.zeros((nf, mapper.nvec))
    x0[:, 0] = start_vel
    x0[:, 1] = np.clip(start_vsini, 0, config['max_vsini'])
    x0[:, 2:] = start_params
    nmres = bf.run_neldermead(mapper, start_vel, x0=x0)
    xbest, fun_best = nmres['x'], nmres['fun']
    if config.get('second_minimizer'):
        # batched gradient polish (reference default-on BFGS stage,
        # vel_fit.py:653-660) — same wiring as the DESI driver
        pol = bf.run_polish(mapper, xbest, fun0=fun_best)
        xbest, fun_best = pol['x'], pol['fun']
    vel_b, params_b, vsini_b = mapper.unpack_host(xbest)
    ref = bf.refine_velocities(vel_b, params_b, vsinis=vsini_b)
    errs, _, bad_hess = bf.hessian_errors(
        ref['best_vel'], params_b, vsinis=vsini_b, parnames=parnames)
    mods = bf.best_models(ref['best_vel'], params_b, vsinis=vsini_b)

    out = dict(brickname=np.full(nf, brick),
               target_id=targetid[xids],
               vrad=ref['best_vel'], vrad_err=ref['vel_err'],
               vsini=vsini_b)
    for i, p in enumerate(parnames):
        out[p] = params_b[:, i]
        out[p + '_err'] = errs[:, i]
    out['chisq_tot'] = np.sum([mods['chisq'][a.name] for a in arms],
                              axis=0)
    for s, a in zip(setups, arms):
        out['chisq_%s' % s] = mods['chisq'][a.name]
        out['chisq_c_%s' % s] = mods['cont_chisq'][a.name]
        out['sn_%s' % s] = sns[s]
    if fig_prefix is not None:
        from rvspecfit_tpu.survey.desi import make_plot
        for k in range(nf):
            title = ('teff=%.0f logg=%.1f V=%.1f+/-%.1f' % (
                out['teff'][k], out['logg'][k], out['vrad'][k],
                out['vrad_err'][k]))
            try:
                make_plot([a.lam for a in arms],
                          [a.flux[k] for a in arms],
                          [mods['models'][a.name][k] for a in arms],
                          title,
                          '%s_%s.png' % (fig_prefix,
                                         str(out['target_id'][k]).strip()))
            except Exception as exc:
                logging.warning('plotting failed: %s', exc)
    return out


def proc_many(file_groups, oprefix, config, threadid=0, nthreads=1,
              options=None, overwrite=True, status_fname=None,
              fig_prefix=None, output_tab_prefix='outtab'):
    """Process file groups; write one output table per group
    (reference: weave_fit.py:263-321).  ``overwrite=False`` skips
    groups whose output table already exists (reference
    weave_fit.py:295-297); ``status_fname`` appends desi-style
    per-file bookkeeping lines enabling restart."""
    from rvspecfit_tpu.survey.desi import update_process_status_file

    os.makedirs(oprefix, exist_ok=True)
    if status_fname:
        update_process_status_file(status_fname, None, None, 0, 0,
                                   start=True)

    # one-group lookahead (same pattern as survey/desi.proc_many):
    # a reader thread loads the next group's FITS files while the
    # current group fits on the device
    groups = list(file_groups)
    slot = {}

    def start_prefetch(grp):
        import threading
        done = threading.Event()
        holder = {}
        names = grp.split(',') if isinstance(grp, str) else list(grp)

        def go():
            try:
                holder['fps'] = {f: fitsio.read(f) for f in names}
            except Exception:
                holder['fps'] = None
            done.set()
        threading.Thread(target=go, daemon=True).start()
        slot.clear()
        slot.update(grp=grp, done=done, holder=holder)

    def take_prefetched(grp):
        if slot.get('grp') == grp:
            slot['done'].wait()
            fps = slot['holder'].get('fps')
            slot.clear()
            return fps
        return None

    for gi, grp in enumerate(groups):
        t0 = time.time()
        base = os.path.basename(str(grp).split(',')[0]).replace(
            '.fits', '')
        ofname = os.path.join(
            oprefix, f'{output_tab_prefix}_{base}_{threadid}.fits')
        if (not overwrite) and os.path.exists(ofname):
            logging.info('skipping, products already exist %s', grp)
            if status_fname:
                update_process_status_file(status_fname, ofname,
                                           'SKIPPED', 0,
                                           time.time() - t0)
            continue
        prehdus = take_prefetched(grp)
        if gi + 1 < len(groups):
            start_prefetch(groups[gi + 1])
        try:
            out = proc_weave(grp, config, threadid=threadid,
                             nthreads=nthreads, options=options,
                             prehdus=prehdus,
                             fig_prefix=(None if fig_prefix is None
                                         else f'{fig_prefix}_{base}'))
        except Exception:
            logging.exception('failed processing %s', grp)
            if status_fname:
                update_process_status_file(status_fname, ofname,
                                           'FAILED', 0,
                                           time.time() - t0)
            continue
        if out is None:
            logging.info('%s: no selected fibers', grp)
            if status_fname:
                update_process_status_file(status_fname, ofname,
                                           'EMPTY', 0, time.time() - t0)
            continue
        fitsio.write(ofname, [dict(kind='table', name='WEAVE_RV',
                                   data=list(out.items()))])
        nobj = len(out['vrad'])
        if status_fname:
            update_process_status_file(status_fname, ofname, 'SUCCESS',
                                       nobj, time.time() - t0)
        logging.info('%s -> %s (%.1f s)', grp, ofname, time.time() - t0)


def main(args=None):
    if args is None:
        args = sys.argv[1:]
    parser = argparse.ArgumentParser(description='Fit WEAVE spectra')
    parser.add_argument('input_files', nargs='*',
                        help='comma-separated red,blue file groups')
    parser.add_argument('--input_file_mask', type=str, default=None,
                        help='glob mask of input files '
                        '(reference weave_fit.py:340-343)')
    parser.add_argument('--input_file', type=str, default=None,
                        help='file with one input group per line '
                        '(reference weave_fit.py:344-348)')
    parser.add_argument('--oprefix', type=str, default=None,
                        help='(legacy) output directory; superseded by '
                        '--output_dir')
    parser.add_argument('--output_dir', type=str, default=None,
                        help='output directory for the tables '
                        '(reference weave_fit.py:349-353)')
    parser.add_argument('--output_tab_prefix', type=str,
                        default='outtab',
                        help='prefix of output table files (reference '
                        'weave_fit.py:354-359)')
    parser.add_argument('--doplot', action='store_true', default=False,
                        help='write per-fiber diagnostic figures')
    parser.add_argument('--figure_dir', type=str, default='./',
                        help='directory for the fit figures (reference '
                        'weave_fit.py:360-363)')
    parser.add_argument('--figure_prefix', type=str, default='fig',
                        help='filename prefix for the fit figures')
    parser.add_argument('--config', type=str, default=None)
    parser.add_argument('--templ_lib', type=str, default=None)
    parser.add_argument('--nthreads', type=int, default=1)
    parser.add_argument('--threadid', type=int, default=0)
    parser.add_argument('--npoly', type=int, default=15)
    parser.add_argument('--overwrite', action='store_true',
                        default=False,
                        help='overwrite existing products; otherwise '
                        'they are skipped (reference '
                        'weave_fit.py:370-373)')
    parser.add_argument('--process_status_file', type=str, default=None,
                        help='per-file processing log enabling '
                        'restart; %%d expands to the thread id')
    parser.add_argument('--log', type=str, default=None)
    parser.add_argument('--log_level', type=str, default='WARNING')
    parser.add_argument('--coordinator', type=str, default=None,
                        help='host:port of the jax.distributed '
                        'coordinator; enables the multi-host world '
                        '(threadid/nthreads default to the world '
                        'rank/size — same model as rvst_desi_fit)')
    args = parser.parse_args(args)

    from rvspecfit_tpu import utils as _utils
    _utils.honor_jax_platforms_env()
    _utils.enable_compilation_cache()

    # opt-in multi-host world: the world rank/size drive the same
    # static striping the reference's nthreads/threadid convention
    # uses (reference weave_fit.py:364-369)
    use_world = bool(args.coordinator
                     or os.environ.get('JAX_COORDINATOR_ADDRESS'))
    if use_world:
        from rvspecfit_tpu.parallel import distributed
        pid, nproc = distributed.init_distributed(args.coordinator)
        if args.nthreads == 1 and args.threadid == 0:
            args.threadid, args.nthreads = pid, nproc

    log_fname = args.log
    if log_fname is not None and '%d' in log_fname:
        log_fname = log_fname % args.threadid
    logging.basicConfig(
        filename=log_fname,
        level=getattr(logging, args.log_level.upper(), logging.WARNING))

    files = list(args.input_files)
    if args.input_file_mask is not None:
        import glob
        files.extend(sorted(glob.glob(args.input_file_mask)))
    if args.input_file is not None:
        with open(args.input_file) as fp:
            files.extend(ln.strip() for ln in fp if ln.strip())
    if not files:
        parser.error('no input files: pass groups, --input_file_mask '
                     'or --input_file')

    status_fname = args.process_status_file
    if status_fname is not None and '%d' in status_fname:
        status_fname = status_fname % args.threadid

    override = {}
    if args.templ_lib:
        override['template_lib'] = args.templ_lib
    config = utils.read_config(args.config, override)
    outdir = args.output_dir or args.oprefix or 'outputs/'
    fig_prefix = None
    if args.doplot:
        os.makedirs(args.figure_dir, exist_ok=True)
        fig_prefix = os.path.join(args.figure_dir, args.figure_prefix)
    try:
        proc_many(files, outdir, config,
                  threadid=args.threadid, nthreads=args.nthreads,
                  options={'npoly': args.npoly},
                  overwrite=args.overwrite,
                  status_fname=status_fname, fig_prefix=fig_prefix,
                  output_tab_prefix=args.output_tab_prefix)
    finally:
        if use_world:
            from rvspecfit_tpu.parallel import distributed
            distributed.barrier('rvst_weave_fit_done')
            distributed.shutdown()


if __name__ == '__main__':
    main()
