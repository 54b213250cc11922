"""Street metrics (tools_compare_street): onset + Strouhal extraction."""
import numpy as np

from nmcfluid.tools_compare_street import street_metrics


def test_metrics_on_synthetic_shedding_signal():
    dt, d, u = 0.05, 0.089, 0.5
    t = np.arange(200) * dt
    f0 = 0.9                       # Hz
    # quiet until t=5, then growing oscillation saturating at 1
    env = np.clip((t - 5.0) / 1.0, 0.0, 1.0)
    w = env * np.sin(2 * np.pi * f0 * t)
    m = street_metrics(w, dt, d, u)
    assert m["onset_frame"] is not None
    assert abs(m["onset_frame"] * dt - 5.0) < 1.5
    assert abs(m["freq_hz"] - f0) < 0.15
    assert abs(m["strouhal"] - f0 * d / u) < 0.03


def test_metrics_on_quiet_signal():
    rng = np.random.default_rng(0)
    w = 1e-6 * rng.normal(size=100)
    m = street_metrics(w, 0.05, 0.089, 0.5)
    # noise crosses any relative threshold erratically; the sustained-
    # window rule may or may not latch, but there must be no crash and
    # the frequency must not be reported without a real onset tail
    assert set(m) == {"onset_frame", "freq_hz", "strouhal"}
