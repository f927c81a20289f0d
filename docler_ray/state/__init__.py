"""Checkpoint manifests + resumable-run state."""
