"""Physical-plan introspection: the engine's scale posture is asserted,
not assumed (tests/test_plans.py)."""
