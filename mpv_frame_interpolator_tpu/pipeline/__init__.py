"""Host pipeline: cadence engine, interpolation engine, present clock,
scene-change detection, auto-quality controller."""
