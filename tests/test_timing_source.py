"""Honest amortized controller timing (VERDICT r2 item 4).

EngineConfig.timing_source="amortized" replaces the wall-to-block
measurement (fiction on hosts whose block/ack path returns before device
execution) with a periodic data-dependent scalar readback minus the
measured sync RTT.  On the CPU backend both sources are honest, so the
amortized samples must land in the same ballpark as the block samples --
and the controller must actually receive them.
"""

import numpy as np

from mpv_frame_interpolator_tpu.io import synthetic
from mpv_frame_interpolator_tpu.pipeline.engine import (
    EngineConfig, InterpolationEngine)


def _drive(engine, frames):
    n = 0
    for f in frames:
        n += len(engine.push(f))
    return n


def _build(source, period=4):
    return InterpolationEngine(EngineConfig(
        display_fps=60.0, auto_quality=False, initial_search_radius=5,
        measure_timing=True, background_precompile=False,
        timing_source=source, timing_sync_period=period))


def test_amortized_samples_reach_controller():
    cfg = synthetic.SyntheticConfig(width=96, height=64, fps=24.0)
    frames = list(synthetic.moving_box(cfg, 14))
    e = _build("amortized", period=4)
    durs = []
    orig_update = e.quality.update

    def spy(d, cadence):
        durs.append(d)
        return orig_update(d, cadence)

    e.quality.update = spy
    _drive(e, frames)
    samples = [d for d in durs if d > 0.0]
    zeros = [d for d in durs if d == 0.0]
    # one sample per period; the other pushes report "no measurement"
    assert samples, durs
    assert len(zeros) > len(samples)
    # registered in stats too (source_frame_time only gets real samples)
    assert e.stats.summary()["source_frame_time"]["count"] == len(samples)


def test_amortized_agrees_with_block_on_honest_host():
    cfg = synthetic.SyntheticConfig(width=96, height=64, fps=24.0)
    frames = list(synthetic.moving_box(cfg, 18))
    e_b = _build("block")
    e_a = _build("amortized", period=3)
    _drive(e_b, frames)
    _drive(e_a, frames)
    mb = e_b.stats.summary()["source_frame_time"]["mean"]
    ma = e_a.stats.summary()["source_frame_time"]["mean"]
    # CPU block_until_ready is honest, so the two must agree within noise
    # (wide margin: 1-core CI hosts jitter)
    assert ma < mb * 5 + 0.05 and mb < ma * 5 + 0.05, (mb, ma)


def test_validation():
    import pytest
    with pytest.raises(ValueError):
        EngineConfig(timing_source="nope")
    with pytest.raises(ValueError):
        EngineConfig(timing_sync_period=0)


def test_auto_resolves_block_on_honest_host(monkeypatch):
    """The CPU backend blocks honestly, so "auto" (the default) must
    keep the reference-authentic block measurement there."""
    from mpv_frame_interpolator_tpu.pipeline import engine as eng_mod
    monkeypatch.setattr(eng_mod, "_block_honesty_cache", None)
    e = _build("auto")
    assert e.timing_source() == "block"
    # probe result is cached per process
    assert eng_mod._block_honesty_cache is True


def test_auto_resolves_amortized_on_lying_relay(monkeypatch):
    """When the probe finds an early-acking block path (forced here via
    MFI_BLOCK_HONEST=0), the controller feed flips to the amortized
    honest sampler -- and actually measures (VERDICT r3 weak #2)."""
    from mpv_frame_interpolator_tpu.pipeline import engine as eng_mod
    monkeypatch.setattr(eng_mod, "_block_honesty_cache", None)
    monkeypatch.setenv("MFI_BLOCK_HONEST", "0")
    cfg = synthetic.SyntheticConfig(width=96, height=64, fps=24.0)
    frames = list(synthetic.moving_box(cfg, 14))
    e = _build("auto", period=2)
    assert e.timing_source() == "amortized"
    _drive(e, frames)
    assert e.stats.summary()["source_frame_time"]["count"] >= 1


def test_explicit_source_skips_probe(monkeypatch):
    from mpv_frame_interpolator_tpu.pipeline import engine as eng_mod
    monkeypatch.setattr(eng_mod, "_block_honesty_cache", None)
    for src in ("block", "amortized"):
        assert _build(src).timing_source() == src
    assert eng_mod._block_honesty_cache is None   # never probed


def test_block_honesty_detail_records_how(monkeypatch):
    """VERDICT r4 next #8: the probe's classification is published with
    its provenance so bench.py can label the JSON round-over-round."""
    from mpv_frame_interpolator_tpu.pipeline import engine as eng_mod
    monkeypatch.setattr(eng_mod, "_block_honesty_cache", None)
    monkeypatch.setattr(eng_mod, "_block_honesty_detail", {})
    monkeypatch.setenv("MFI_BLOCK_HONEST", "0")
    assert eng_mod._block_is_honest() is False
    det = eng_mod.block_honesty_detail()
    assert det == {"verdict": "early-ack", "how": "forced"}

    monkeypatch.setattr(eng_mod, "_block_honesty_cache", None)
    monkeypatch.setattr(eng_mod, "_block_honesty_detail", {})
    monkeypatch.delenv("MFI_BLOCK_HONEST")
    assert eng_mod._block_is_honest() is True       # CPU backend skip
    assert eng_mod.block_honesty_detail() == {"verdict": "honest",
                                              "how": "cpu-skip"}


def test_block_consistency_pins_classification(monkeypatch):
    """An honest-block verdict must be bounded below by the chained chip
    time (~20% tolerance); an early-ack verdict must sit far under it.
    A relay-behavior flip makes `consistent` False either way."""
    from mpv_frame_interpolator_tpu.pipeline import engine as eng_mod
    monkeypatch.setattr(eng_mod, "_block_honesty_detail",
                        {"verdict": "honest", "how": "probe"})
    ok = eng_mod.block_consistency(21.0, 60.0)      # block >= chip: honest
    assert ok["measured_honest"] and ok["consistent"]
    bad = eng_mod.block_consistency(21.0, 2.0)      # block << chip: lie
    assert not bad["measured_honest"] and not bad["consistent"]

    monkeypatch.setattr(eng_mod, "_block_honesty_detail",
                        {"verdict": "early-ack", "how": "probe"})
    ok2 = eng_mod.block_consistency(21.0, 2.0)
    assert ok2["consistent"] and not ok2["measured_honest"]
    bad2 = eng_mod.block_consistency(21.0, 60.0)
    assert not bad2["consistent"]
