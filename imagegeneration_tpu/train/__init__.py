"""Fused jitted train steps and per-model training engines."""
