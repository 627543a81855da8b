"""Checkpointing, logging, visualization utilities."""
