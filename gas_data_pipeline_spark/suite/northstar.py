"""Placeholder — filled in by later build phases."""
