"""Composable Ray Data pipelines: the flagship extraction job and friends."""
