"""Small-N statistical accuracy check (full harness:
python -m rvspecfit_tpu.validation --ntrials 1000)."""
import numpy as np

from rvspecfit_tpu import validation, simulation
import pytest

pytestmark = pytest.mark.slow


def test_pull_distribution_small():
    tm = simulation.build_template_model(5, 5, 5, 3, npix=2048)
    stats, raw = validation.run_accuracy(
        ntrials=24, snr=300.0, npix=300, seed=3, templates={'acc': tm})
    # velocities recovered
    assert np.abs(raw['vfit'] - raw['v0']).max() < 20
    assert abs(stats['median_bias']) < 1.0
    # errors calibrated to within a factor ~2 at this tiny N
    assert 0.3 < stats['pull_std'] < 2.5
    assert stats['frac_within_3sig'] > 0.8
