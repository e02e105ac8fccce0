"""Superseded kernel generations, kept ONLY as benchmark A/B baselines.

v2 (split-formulation fused dequant) and v3 (scale-zero packed) lost the
chip A/B to the v4 transposed formulation (docs/BENCH.md round-2 kernel
iterations) and have ZERO product call sites: the Engine dispatches only
ops/pallas/palu_decode.py (v1, seq-major fp) and palu_decode4.py (v4,
everything else). They remain importable here for tools/tpu_ab_v2.py and
their differential tests, as measurement history -- not framework surface
(COVERAGE.md N1)."""
