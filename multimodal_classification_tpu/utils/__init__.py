"""Utilities: experiment tracking, checkpointing, logging."""
