"""Multi-chip scale-out: meshes, sharded epochs, distributed FFT."""
