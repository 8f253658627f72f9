

"""Online serving monitor built on the AZ-whiteness test."""
import numpy as np


def test_residual_whiteness_monitor_flags_structure(rng):
    """Rolling serving monitor: white residuals stay unflagged, strong
    spatial correlation across edges gets flagged."""
    from sgp_tpu.obs import ResidualWhitenessMonitor

    n = 20
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n])
    mon = ResidualWhitenessMonitor(ring, window=48, alpha=0.01,
                                   min_steps=16)
    res = None
    for t in range(40):
        res = mon.update(rng.standard_normal((n, 1)))
    assert res is not None and not res.flagged

    mon.reset()
    assert mon.update(rng.standard_normal((n, 1))) is None
    for t in range(40):   # one shared value per step -> perfectly
        val = rng.standard_normal()            # edge-correlated
        res = mon.update(np.full((n, 1), val)
                         + 0.01 * rng.standard_normal((n, 1)))
    assert res.flagged and res.pvalue < 1e-4
