"""Command-line drivers mirroring the reference's tests/*.py scripts."""
