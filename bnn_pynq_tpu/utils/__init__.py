"""Metrics, roofline accounting, and profiling helpers."""
