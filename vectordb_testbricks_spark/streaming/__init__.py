"""Structured-Streaming surface.

The reference has no true streaming dataflows (its *_permanently bricks are
closed-loop load generators — SURVEY.md §1.4); the `events` fixture table is
the natural streaming extension. ``events.py`` provides the windowed-
aggregation pipeline in both batch and readStream form with watermarking.
"""
