"""Numerical core ops: FFT backends, statistics, peak detectors."""
