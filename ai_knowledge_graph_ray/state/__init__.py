"""Checkpoint / resume state management."""
