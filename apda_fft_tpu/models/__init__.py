"""Epoch analysis pipelines and result containers."""
