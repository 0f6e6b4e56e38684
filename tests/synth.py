"""Test alias of the package's synthetic-spectrum simulation module.

The generator itself lives in rvspecfit_tpu.simulation so that the
benchmark and multi-chip dry-run can build template libraries without
the test tree (role of the reference's tests/mktemps.py fixture).
"""
from rvspecfit_tpu.simulation import *          # noqa: F401,F403
from rvspecfit_tpu.simulation import (fake_spectrum, make_template_grid,
                                      observed_spectrum)  # noqa: F401
