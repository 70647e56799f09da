"""Coverage for profiling + adaptive adjuster utilities."""

import time

from flow_guided_krylov_tpu.utils import AdaptiveAdjuster, StageTimer


def test_stage_timer():
    t = StageTimer()
    with t.span("a"):
        time.sleep(0.01)
    with t.span("a"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2
    assert s["a"]["total_s"] >= 0.01
    assert "a" in t.dump()


def test_adaptive_adjuster():
    adj = AdaptiveAdjuster(patience=5)
    hist = {"unique_ratios": [0.95] * 10,
            "energies": [-1.0] * 5 + [-1.2] * 5}
    tips = adj.suggest(hist)
    assert "samples_per_batch" in tips
    hist2 = {"unique_ratios": [0.5] * 10, "energies": [-1.0] * 20}
    assert "max_epochs" not in adj.suggest(hist2)
